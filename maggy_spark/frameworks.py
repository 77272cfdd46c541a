"""Optional deep-learning framework integrations (E8-E12), import-gated.

This container ships neither torch nor tensorflow, so these factories
raise a clear ImportError at call time (not import time) when the
framework is missing; with the framework installed they reproduce the
reference's wrapper semantics:

- E8  TF model wrapper: build the user model under
  `strategy.scope()`, falling back to non-distributed on RuntimeError
  (`maggy/core/tf_patching/tf_modules.py:18-46`,
  `tf_dist_executor.py:342-365`).
- E9  Torch DDP / FSDP / DeepSpeed module wrappers
  (`maggy/core/patching/modules.py:37-133`).
- E10 Torch DataLoader with DistributedSampler forced
  (`maggy/core/patching/dataloader.py:33-99`).
- E11 ZeRO optimizer rebasing (`maggy/core/patching/optim.py:28-115`)
  — exposed as a thin helper, documented as training-side option.
- E12 DeepSpeed config sanitizer (`torch_dist_executor.py:389-405`).
"""

from __future__ import annotations

from typing import Any


def _need(module: str, feature: str):
    raise ImportError(
        f"{feature} requires `{module}`, which is not installed in this "
        f"environment. Install it on the cluster image to enable this wrapper."
    )


# -- E8: TF distributed model wrapper ----------------------------------


def wrap_tf_model(model_cls, strategy, *args, **kwargs):
    """Instantiate `model_cls` under `strategy.scope()`; fall back to
    plain instantiation if the strategy refuses (RuntimeError), like
    the reference's non-distributed fallback."""
    try:
        import tensorflow as tf  # noqa: F401
    except ImportError:
        _need("tensorflow", "wrap_tf_model")
    try:
        with strategy.scope():
            return model_cls(*args, **kwargs)
    except RuntimeError:
        return model_cls(*args, **kwargs)


# -- E9: torch module wrappers -----------------------------------------


def wrap_torch_ddp(module, device_id: int | None = None):
    """module -> (cuda) -> DistributedDataParallel."""
    try:
        import torch
        from torch.nn.parallel import DistributedDataParallel
    except ImportError:
        _need("torch", "wrap_torch_ddp")
    if device_id is not None and torch.cuda.is_available():
        module = module.cuda(device_id)
        return DistributedDataParallel(module, device_ids=[device_id])
    return DistributedDataParallel(module)


def wrap_torch_fsdp(module, zero_lvl: int = 3, mixed_precision: bool = True):
    """FSDP wrap with the ZeRO level mapped to a sharding strategy
    (2 -> SHARD_GRAD_OP, 3 -> FULL_SHARD, like DeepSpeed's stages) and
    an fp16 MixedPrecision policy when requested — previously both
    parameters were accepted and silently ignored."""
    try:
        import torch
        from torch.distributed.fsdp import FullyShardedDataParallel, ShardingStrategy
    except ImportError:
        _need("torch (>=1.12 with FSDP)", "wrap_torch_fsdp")
    strategy = ShardingStrategy.SHARD_GRAD_OP if zero_lvl == 2 else ShardingStrategy.FULL_SHARD
    mp = None
    if mixed_precision:
        try:
            from torch.distributed.fsdp import MixedPrecision

            mp = MixedPrecision(
                param_dtype=torch.float16,
                reduce_dtype=torch.float16,
                buffer_dtype=torch.float16,
            )
        except ImportError:
            pass  # older FSDP without the policy class: full precision
    return FullyShardedDataParallel(module, sharding_strategy=strategy, mixed_precision=mp)


def wrap_deepspeed(module, ds_config: dict, **kwargs):
    try:
        import deepspeed
    except ImportError:
        _need("deepspeed", "wrap_deepspeed")
    sanitize_ds_config(ds_config)
    engine, *_ = deepspeed.initialize(model=module, config=ds_config, **kwargs)
    return engine


# -- E10: distributed DataLoader ---------------------------------------


def distributed_dataloader(dataset, batch_size: int, rank: int, world_size: int, **kwargs):
    """DataLoader with DistributedSampler forced and num_workers=0,
    per the reference's patch (`dataloader.py:33-99`)."""
    try:
        from torch.utils.data import DataLoader
        from torch.utils.data.distributed import DistributedSampler
    except ImportError:
        _need("torch", "distributed_dataloader")
    sampler = DistributedSampler(dataset, num_replicas=world_size, rank=rank)
    # the reference patch forcibly overrides these (dataloader.py:57-72
    # warns and replaces) — pop them so a caller porting reference code
    # gets the documented override, not a duplicate-keyword TypeError
    for forced in ("shuffle", "sampler", "num_workers"):
        kwargs.pop(forced, None)
    return DataLoader(dataset, batch_size=batch_size, sampler=sampler, num_workers=0, **kwargs)


# -- E11: ZeRO optimizer rebase ----------------------------------------


def zero_optimizer(params, optimizer_name: str = "Adam", **optim_kwargs):
    try:
        import torch
        from torch.distributed.optim import ZeroRedundancyOptimizer
    except ImportError:
        _need("torch", "zero_optimizer")
    opt_cls = getattr(torch.optim, optimizer_name)
    return ZeroRedundancyOptimizer(params, optimizer_class=opt_cls, **optim_kwargs)


# -- E12: DeepSpeed config sanitizer (pure python, always available) ----


def sanitize_ds_config(ds_config: dict, zero_lvl: int | None = None) -> dict:
    """Reconcile zero level and force torch_adam, mirroring
    `_sanitize_ds_config` (`torch_dist_executor.py:389-405`)."""
    if not isinstance(ds_config, dict):
        raise ValueError("ds_config must be a dict")
    if zero_lvl is not None:
        ds_config.setdefault("zero_optimization", {})["stage"] = int(zero_lvl)
    opt = ds_config.get("optimizer")
    if opt is not None:
        if str(opt.get("type", "")).lower() not in ("adam",):
            raise ValueError("only Adam is supported with DeepSpeed here (reference guard)")
        opt.setdefault("params", {})["torch_adam"] = True
    return ds_config


# -- Keras layer ablation (LOCO model surgery) --------------------------


def ablate_keras_layer(model, layer_identifier):
    """Rebuild a Keras model with the identified layer(s) removed
    (reference `ablation/ablator/loco.py:99-137`): a string removes
    one layer by name; a multi-element set removes the group; a
    singleton set is a name prefix. Input and output layers are never
    removed. Requires tensorflow at call time."""
    try:
        import tensorflow as tf
    except ImportError:
        _need("tensorflow", "ablate_keras_layer")
    import json as _json

    spec = _json.loads(model.to_json())
    layers = list(spec["config"]["layers"])
    interior = layers[1:-1]

    def matches(layer) -> bool:
        name = layer["config"]["name"]
        if isinstance(layer_identifier, str):
            return name == layer_identifier
        if len(layer_identifier) > 1:
            return name in layer_identifier
        return name.lower().startswith(next(iter(layer_identifier)).lower())

    if isinstance(layer_identifier, str):
        # single layer: remove only the first match, scanning interior
        for layer in interior:
            if matches(layer):
                layers.remove(layer)
                break
    else:
        for layer in interior:
            if matches(layer):
                layers.remove(layer)
    spec["config"]["layers"] = layers
    return tf.keras.models.model_from_json(_json.dumps(spec))
