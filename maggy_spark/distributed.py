"""Distributed (gang-scheduled) training via Spark barrier mode.

Reference: the reservation server + chief election + TF_CONFIG /
torch process-group bootstrap (`maggy/core/rpc.py:45-202`,
`maggy/core/executors/{tf,torch}_dist_executor.py`) — all replaced
by `BarrierTaskContext`: `allGather()` IS the reservation barrier,
partition 0 IS the chief (C7-C9 in SURVEY.md §2.3), and Spark's gang
scheduling replaces the 600 s reservation timeout.

The user train_fn receives the cluster spec (rank / world_size /
master addr+port, TF_CONFIG-style worker list) and runs its
framework of choice; torch/tf are optional imports on the workers.
Per-worker results are averaged ignoring nulls — operator A9.
"""

from __future__ import annotations

import json
import socket
from typing import Any, Callable

from pyspark.sql import SparkSession

from maggy_spark.config import TfDistributedConfig, TorchDistributedConfig
from maggy_spark.executor import _dumps_by_value, build_kwargs, normalize_return
from maggy_spark.reporter import Reporter


def run_distributed_training(
    train_fn: Callable,
    config: TorchDistributedConfig | TfDistributedConfig,
    spark: SparkSession,
) -> dict:
    num_workers = int(config.num_workers)
    fn_bytes = _dumps_by_value(train_fn)
    metric_key = config.metric_key or "metric"
    is_tf = isinstance(config, TfDistributedConfig)
    # config-carried training objects, injected by name like the
    # reference (train_fn(module=..., train_set=..., ...)); these ride
    # the task closure, so large datasets should be paths/handles
    config_extras = {
        k: getattr(config, k)
        for k in ("module", "model", "dataset", "train_set", "test_set", "process_data")
        if getattr(config, k, None) is not None
    }
    # ship config-carried classes/callables by VALUE like train_fn: a
    # user-script class (TorchDistributedConfig(module=MyNet)) riding
    # the barrier closure as a plain reference dies unpickling on every
    # worker with ModuleNotFoundError for the driver's script module
    config_extras_bytes = _dumps_by_value(config_extras)
    # config.hparams is the reference's model-init interface
    # (tf_distributed.py:36,48-49): delivered as THE hparams dict, so
    # `def train_fn(model, hparams, ...)` receives it and individual
    # names inject too (build_kwargs' hparams branch outranks extras,
    # so it must not be passed as an extra)
    hparams_cfg = dict(getattr(config, "hparams", None) or {})

    from pathlib import Path

    # plain-string capture: the barrier closure must unpickle with
    # stdlib alone on workers that can't import maggy_spark yet
    pkg_path = str(Path(__file__).resolve().parent.parent)

    def worker(iterator):
        import json
        import socket
        import sys as _sys

        from pyspark import BarrierTaskContext
        from pyspark import cloudpickle as _cp

        if pkg_path not in _sys.path:
            _sys.path.insert(0, pkg_path)
        from maggy_spark.executor import build_kwargs, normalize_return
        from maggy_spark.reporter import Reporter

        ctx = BarrierTaskContext.get()
        rank = ctx.partitionId()
        # free-port discovery, then allGather = the reservation barrier
        # (replaces rpc.py:282-305); worker 0's address becomes MASTER
        sock = socket.socket()
        sock.bind(("", 0))
        port = sock.getsockname()[1]
        sock.close()
        # routable-address discovery via the UDP-connect trick (no
        # packet is sent): gethostbyname(gethostname()) resolves to
        # 127.0.0.1 on hosts whose /etc/hosts maps the hostname to
        # loopback, and advertising loopback as MASTER_ADDR hangs
        # every cross-host rendezvous
        probe = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        try:
            probe.connect(("10.255.255.255", 1))
            host = probe.getsockname()[0]
        except OSError:
            host = socket.gethostbyname(socket.gethostname())
        finally:
            probe.close()
        gathered = ctx.allGather(json.dumps({"rank": rank, "host": host, "port": port}))
        infos = sorted((json.loads(g) for g in gathered), key=lambda d: d["rank"])
        master = infos[0]
        cluster = {
            "rank": rank,
            "world_size": len(infos),
            "master_addr": master["host"],
            "master_port": master["port"],
            "workers": [f"{i['host']}:{i['port']}" for i in infos],
            "is_chief": rank == 0,
        }
        if is_tf:
            # TF_CONFIG identical in shape to tf_dist_executor.py:334-339
            cluster["tf_config"] = json.dumps(
                {
                    "cluster": {"worker": cluster["workers"]},
                    "task": {"type": "chief" if rank == 0 else "worker", "index": rank},
                }
            )
        fn = _cp.loads(fn_bytes)
        reporter = Reporter()
        extras = dict(cluster)
        extras["cluster"] = cluster
        extras.update(_cp.loads(config_extras_bytes))
        try:
            kwargs = build_kwargs(fn, hparams_cfg, reporter, extras)
            ret = fn(**kwargs)
            metric = None if ret is None else normalize_return(ret, metric_key)
            err = None
        except Exception as e:  # noqa: BLE001
            metric, err = None, f"{type(e).__name__}: {e}"
        ctx.barrier()  # exit barrier (torch_dist_executor.py:168)
        yield json.dumps({"rank": rank, "metric": metric, "error": err, "logs": reporter.logs})

    sc = spark.sparkContext
    rdd = sc.parallelize(range(num_workers), num_workers).barrier().mapPartitions(worker)
    results = [json.loads(r) for r in rdd.collect()]

    # A9: avg of non-null per-worker metrics (base_driver.py:244-253)
    metrics = [r["metric"] for r in results if r["metric"] is not None]
    errors = {r["rank"]: r["error"] for r in results if r["error"]}
    return {
        "test result": (sum(metrics) / len(metrics)) if metrics else None,
        "num_workers": num_workers,
        "per_worker": {r["rank"]: r["metric"] for r in results},
        "errors": errors or None,
    }
