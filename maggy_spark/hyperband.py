"""Hyperband pruner: synchronous successive-halving iterations over a
geometric budget ladder.

Reference: `maggy/pruner/hyperband.py:29-594` —
- budget ladder: smax = floor(log_eta(max/min)), budgets
  min*eta^r for r in 0..smax (`hyperband.py:114-124`);
- each SH iteration i starts at rung i with n0 = eta^(smax-i)
  configs (golden scenario FIXTURES.md F6 / `hyperband.py:197-218`);
- promotion: sort a finished rung by metric (min-problem ascending),
  take the top n_configs[rung+1] into the next rung
  (`SHIteration.promote`, `hyperband.py:487-527`); promoted trials
  keep their params but re-run at the bigger budget with fresh trial
  ids per rung (`hyperband.py:458-465`).

The rung state is exactly the `rungs` relation (FIXTURES.md F6);
promotion is the window-SQL of operator G5 executed by the driver
loop between waves.
"""

from __future__ import annotations

import math
import random

from maggy_spark.optimizers import AbstractOptimizer, exact_smax
from maggy_spark.trial import Trial


class Hyperband(AbstractOptimizer):
    def __init__(self, min_budget: int = 1, max_budget: int = 9, eta: int = 3, n_iterations: int = 2):
        super().__init__()
        if eta < 2:
            raise ValueError("eta must be >= 2")
        if not 0 < min_budget <= max_budget:
            raise ValueError("need 0 < min_budget <= max_budget")
        self.min_budget = min_budget
        self.max_budget = max_budget
        self.eta = eta
        self.n_iterations = n_iterations
        self.smax = exact_smax(min_budget, max_budget, eta)
        self.budgets = [min_budget * eta**r for r in range(self.smax + 1)]

    def _initialize(self) -> None:
        self._rng = random.Random(self.seed)
        # generated-but-not-yet-handed-out trials: next_batch drains
        # this first, so a small max_trials can never drop trials that
        # are already registered in a rung's pending ledger
        self._queue: list[Trial] = []
        # iteration state: for each SH iteration, the rung cursor and
        # per-rung trial ledgers
        self._iters = []
        for i in range(self.n_iterations):
            start_rung = min(i, self.smax)
            n_configs = [self.eta ** (self.smax - r) for r in range(start_rung, self.smax + 1)]
            self._iters.append(
                {
                    "start_rung": start_rung,
                    "rung": start_rung,
                    "n_configs": n_configs,
                    "pending": {},   # trial_id -> rung-relative index
                    "finished": [],  # trials of current rung
                    "seeded": False,
                }
            )
        self.num_trials = sum(sum(it["n_configs"]) for it in self._iters)
        self._emitted_seed = 0

    def schedule(self) -> list[dict]:
        """The (iteration, rung, budget, n_configs) table — matches
        operator G10's relational output."""
        out = []
        for i, it in enumerate(self._iters):
            for j, n in enumerate(it["n_configs"]):
                r = it["start_rung"] + j
                out.append({"iteration": i, "rung": r, "budget": self.budgets[r], "n_configs": n})
        return out

    def _new_trial(self, params: dict, iteration: int, rung: int, sample_type: str) -> Trial:
        budget = self.budgets[rung]
        t = Trial(
            {**params, "budget": budget},
            info_dict={
                "sample_type": sample_type,
                "iteration": iteration,
                "rung": rung,
                "budget": budget,
            },
        )
        # disambiguate across SH iterations: iteration 1 can seed the
        # same (params, budget) that iteration 0 promoted; ids must
        # differ or the wave's result routing conflates them (the
        # reference keeps per-rung trial copies, hyperband.py:458-465)
        from maggy_spark.trial import trial_id_for_params

        t.trial_id = trial_id_for_params({**params, "budget": budget, "sh_iteration": iteration})
        return t

    def _next_batch(self, max_trials: int) -> list[Trial]:
        # generate any newly-runnable rungs into the queue, then hand
        # out at most max_trials from it — never drop generated trials
        # (they are already in a rung's pending ledger)
        for i, it in enumerate(self._iters):
            if not it["seeded"]:
                # rung seeding: n0 random configs (hyperband.py:197-218);
                # dedup WITHIN the iteration — duplicate params+budget
                # would collide in the pending ledger/result routing
                seeded = 0
                attempts = 0
                seen_here: set[str] = set()
                while seeded < it["n_configs"][0] and attempts < 20 * it["n_configs"][0]:
                    params = self.searchspace.get_random_parameter_values(
                        1, seed=None if self.seed is None else self.seed + 7919 * self._emitted_seed
                    )[0]
                    self._emitted_seed += 1
                    attempts += 1
                    t = self._new_trial(params, i, it["rung"], "random")
                    if t.trial_id in seen_here:
                        continue  # redraw (small discrete spaces collide)
                    seen_here.add(t.trial_id)
                    it["pending"][t.trial_id] = t
                    self._queue.append(t)
                    seeded += 1
                if seeded < it["n_configs"][0]:
                    # searchspace smaller than the rung: shrink the rung
                    it["n_configs"][0] = seeded
                it["seeded"] = True
                continue
            if it["pending"]:
                continue  # waiting on current rung
            # current rung finished: promote if rungs remain
            rel = it["rung"] - it["start_rung"]
            if rel + 1 < len(it["n_configs"]):
                k = it["n_configs"][rel + 1]
                # exclude metric-less finalized trials (a train_fn that
                # raised EarlyStopException yields final=None): they
                # can't rank, and promoting them would crash the sort
                # (same guard as Asha._promotable)
                fin = sorted(
                    (t for t in it["finished"] if t.final_metric is not None),
                    key=lambda t: self.metric_for_min(t.final_metric),
                )
                it["rung"] += 1
                it["finished"] = []
                for src in fin[:k]:
                    params = {p: v for p, v in src.params.items() if p != "budget"}
                    t = self._new_trial(params, i, it["rung"], "promoted")
                    t.info_dict["original_trial_id"] = src.trial_id
                    it["pending"][t.trial_id] = t
                    self._queue.append(t)
        out, self._queue = self._queue[:max_trials], self._queue[max_trials:]
        return out

    def finalize_trial(self, trial: Trial) -> None:
        super().finalize_trial(trial)
        for it in self._iters:
            if trial.trial_id in it["pending"]:
                del it["pending"][trial.trial_id]
                it["finished"].append(trial)
                break

    def report_error(self, trial: Trial) -> None:
        """An errored trial must leave its rung's pending ledger or the
        iteration stalls forever waiting on it; the rung simply
        finishes with one fewer candidate."""
        super().report_error(trial)
        for it in self._iters:
            if trial.trial_id in it["pending"]:
                del it["pending"][trial.trial_id]
                break

    def done(self) -> bool:
        for it in self._iters:
            if not it["seeded"] or it["pending"]:
                return False
            rel = it["rung"] - it["start_rung"]
            if rel + 1 < len(it["n_configs"]):
                return False
        return True

    def rungs_df(self, spark):
        """Materialize the rung ledger as the `rungs` relation
        (FIXTURES.md F6)."""
        rows = []
        for t in self.final_store:
            rows.append(
                (
                    int(t.info_dict.get("iteration", 0)),
                    int(t.info_dict.get("rung", 0)),
                    t.trial_id,
                    t.info_dict.get("original_trial_id", t.trial_id),
                    t.info_dict.get("sample_type") == "promoted",
                )
            )
        return spark.createDataFrame(
            rows, "iteration int, rung int, trial_id string, original_trial_id string, promoted boolean"
        )
