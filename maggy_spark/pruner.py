"""Hyperband pruner — multi-fidelity budget allocation attachable to
ANY suggestion-capable optimizer (RandomSearch, GP, TPE).

Reference: `maggy/pruner/hyperband.py:29-594` and the driver wiring
`core/experiment_driver/optimization_driver.py:87-89` (a pruner
overrides the experiment's num_trials). The reference runs the pruner
as a subroutine of `BaseAsyncBO.get_suggestion`
(`optimizer/bayes/base.py:186-211`): `pruning_routine()` is consulted
before every suggestion and answers one of

1. ``{"trial_id": None, "budget": b}`` — sample a NEW config from the
   optimizer's model, run it at budget ``b`` (first rung of an SH
   iteration still has open slots);
2. ``{"trial_id": tid, "budget": b}`` — re-run the params of finished
   trial ``tid`` at the bigger budget ``b`` (a promotion);
3. ``"IDLE"`` — every started iteration is waiting on running trials
   and no new iteration may start yet;
4. ``None`` — all SH iterations are complete.

After the optimizer creates the trial it calls
``report_trial(original_trial_id, new_trial_id)`` so the pruner can
record the slot (`hyperband.py:266-279`).

Ladder math (`hyperband.py:114-124,197-218`): R = number of distinct
budgets = trunc(log_eta(max/min)) + 1; budgets ascend geometrically
min..max; SH iteration i (cycling i mod R) spans s = R-1-(i mod R)
promotions, seeds n0 = floor(R/(s+1)) * eta^s configs at the ladder's
(R-1-s)-th budget, and keeps 1/eta per rung.

Divergence from the reference (by design): errored trials are
reported via `report_error` and treated as finished-with-worst-metric
so a rung can still promote — the reference's `trial_metric_getter`
never learns about failures and its iteration would stall forever.
"""

from __future__ import annotations

import math


class HyperbandPruner:
    """Successive-halving rung ledger with the reference's geometry.

    `trial_metric_getter(ids)` must return `{trial_id: metric}` for the
    FINISHED trials among `ids` (metrics already normalized so lower is
    better); unfinished ids are simply absent from the dict. The
    attached optimizer provides it (optimizers.py attach_pruner).
    """

    IDLE = "IDLE"

    def __init__(
        self,
        min_budget: int = 1,
        max_budget: int = 9,
        eta: int = 3,
        n_iterations: int = 2,
        trial_metric_getter=None,
    ):
        if min_budget <= 0:
            raise ValueError(f"min_budget must be > 0, got {min_budget}")
        if max_budget <= min_budget:
            raise ValueError(f"need max_budget > min_budget, got {max_budget} <= {min_budget}")
        if eta < 2:
            raise ValueError(f"eta must be >= 2, got {eta}")
        self.min_budget = min_budget
        self.max_budget = max_budget
        self.eta = eta
        self.n_iterations = n_iterations
        self.trial_metric_getter = trial_metric_getter
        # same ladder semantics as the reference (hyperband.py:115-124):
        # R = largest k with min*eta^k <= max, plus 1 — via the shared
        # exact-integer search (float-log dropped rungs for exact
        # powers; see optimizers.exact_smax)
        from maggy_spark.optimizers import exact_smax

        self.n_budgets = exact_smax(min_budget, max_budget, eta) + 1
        self.budgets = [max_budget // eta ** (self.n_budgets - 1 - j) for j in range(self.n_budgets)]
        self._iters = [self._plan_iteration(i) for i in range(n_iterations)]
        self._started = 0  # iterations set live so far
        self._activate_next()
        self._updating: int | None = None  # iteration awaiting report_trial
        self._errored: set[str] = set()

    # -- geometry ------------------------------------------------------

    def _plan_iteration(self, i: int) -> dict:
        R = self.n_budgets
        s = R - 1 - (i % R)  # promotions in this iteration
        n0 = int(math.floor(R / (s + 1))) * self.eta**s
        ns = [max(int(n0 * self.eta ** (-j)), 1) for j in range(s + 1)]
        return {
            "live": False,
            "done": False,
            "ns": ns,                              # configs per rung
            "budgets": self.budgets[R - 1 - s:],   # ladder tail
            "base_rung": R - 1 - s,                # ladder index of rung 0
            "rung": 0,                             # cursor within the iteration
            "started": [0] * (s + 1),              # slots handed to the optimizer
            "slots": [[] for _ in range(s + 1)],   # [{orig, actual}] per rung
        }

    def _activate_next(self) -> bool:
        for it in self._iters:
            if not it["live"] and not it["done"]:
                it["live"] = True
                self._started += 1
                return True
        return False

    # -- optimizer interface -------------------------------------------

    def num_trials(self) -> int:
        """Total trials across every SH iteration — overrides the
        experiment's num_trials (optimization_driver.py:87-89)."""
        return sum(sum(it["ns"]) for it in self._iters)

    def pruning_routine(self):
        for idx, it in enumerate(self._iters):
            if not it["live"] or it["done"]:
                continue
            nxt = self._next_run(it)
            if nxt is not None:
                self._updating = idx
                return nxt
        if self._started < self.n_iterations and self._activate_next():
            return self.pruning_routine()
        if self.finished():
            return None
        return self.IDLE

    def report_trial(self, original_trial_id, new_trial_id) -> None:
        """Record the trial the optimizer actually started for the slot
        most recently handed out (`hyperband.py:266-279,445-476`)."""
        it = self._iters[self._updating]
        rung = it["rung"]
        if original_trial_id is None:
            it["slots"][rung].append({"orig": new_trial_id, "actual": new_trial_id})
        else:
            for slot in it["slots"][rung]:
                if slot["orig"] == original_trial_id and slot["actual"] is None:
                    slot["actual"] = new_trial_id
                    break
        self._updating = None

    def report_error(self, trial_id: str) -> None:
        """An ERROR trial never reaches the final store; score it as
        +inf so its rung completes and it can never be promoted."""
        self._errored.add(trial_id)

    def finished(self) -> bool:
        return all(it["done"] for it in self._iters) if self._iters else True

    # -- SH iteration stepping -----------------------------------------

    def _metrics(self, ids: list[str]) -> dict[str, float]:
        got = dict(self.trial_metric_getter(ids) or {}) if self.trial_metric_getter else {}
        for tid in ids:
            if tid in self._errored:
                got[tid] = math.inf
        return got

    def _next_run(self, it: dict):
        rung = it["rung"]
        if it["started"][rung] < it["ns"][rung]:
            if rung == 0:
                it["started"][0] += 1
                return {"trial_id": None, "budget": it["budgets"][0]}
            for slot in it["slots"][rung]:
                if slot["actual"] is None:
                    it["started"][rung] += 1
                    return {"trial_id": slot["orig"], "budget": it["budgets"][rung]}
            return None  # promotions not materialized yet (awaiting report_trial)
        # rung fully handed out: finished trials decide what happens next
        actual = [s["actual"] for s in it["slots"][rung]]
        if len(actual) < it["ns"][rung] or any(a is None for a in actual):
            return None  # optimizer hasn't reported every slot yet
        metrics = self._metrics(actual)
        if len(metrics) < len(actual):
            return None  # trials still running
        if rung + 1 < len(it["ns"]):
            self._promote(it, metrics)
            return self._next_run(it)
        it["done"] = True
        return None

    def _promote(self, it: dict, metrics: dict[str, float]) -> None:
        """Keep the best 1/eta of the finished rung (`hyperband.py:487-527`):
        ascending metric sort, ties broken by insertion order (python
        sort is stable, matching the reference's sorted-dict trick)."""
        rung = it["rung"]
        keep = it["ns"][rung + 1]
        ranked = sorted((s["actual"] for s in it["slots"][rung]), key=lambda tid: metrics[tid])
        it["rung"] = rung + 1
        for tid in ranked[:keep]:
            it["slots"][rung + 1].append({"orig": tid, "actual": None})

    # -- introspection --------------------------------------------------

    def schedule_rows(self) -> list[tuple[int, int, int, int]]:
        """(iteration, ladder_rung, budget, n_configs) — the static
        plan; relational twin is operator g14_pruner_schedule."""
        out = []
        for i, it in enumerate(self._iters):
            for j, n in enumerate(it["ns"]):
                out.append((i, it["base_rung"] + j, it["budgets"][j], n))
        return out

    def rungs_df(self, spark):
        """The live rung ledger as a DataFrame (`hyperband.py:173`
        rungs relation): one row per slot with promotion lineage."""
        rows = []
        for i, it in enumerate(self._iters):
            for j, slots in enumerate(it["slots"]):
                for s in slots:
                    rows.append(
                        (i, it["base_rung"] + j, int(it["budgets"][j]),
                         s["orig"], s["actual"], j > 0)
                    )
        return spark.createDataFrame(
            rows,
            "iteration int, rung int, budget int, original_trial_id string, "
            "trial_id string, promoted boolean",
        )


class SHIteration:
    """One synchronous SuccessiveHalving iteration, exposed with the
    reference's public class surface (`pruner/hyperband.py:304-527`):
    `get_next_run` hands out (trial_id, budget) slots, `report_trial`
    binds the optimizer's emitted trial ids, `promotable`/`promote`
    advance the best 1/eta of a settled rung, `finished` closes the
    iteration. The engine's HyperbandPruner runs the same algorithm on
    its internal ledger; this class exists for reference user code
    (custom pruners, tests) that drives iterations directly.

    `trial_metric_getter(ids) -> {trial_id: metric}` must return
    entries only for FINISHED trials (lower is better)."""

    INIT = "INIT"
    RUNNING = "RUNNING"
    FINISHED = "FINISHED"

    def __init__(self, n_configs, budgets, iteration_id=0, trial_metric_getter=None, logger=None):
        if len(n_configs) != len(budgets):
            raise ValueError("n_configs and budgets must align rung-for-rung")
        self.iteration_id = iteration_id
        self.state = SHIteration.INIT
        self.n_configs = list(n_configs)
        self.budgets = list(budgets)
        self.n_rungs = len(self.n_configs)
        self.current_rung = 0
        self.actual_n_configs = [0] * self.n_rungs
        self.configs = {rung: [] for rung in range(self.n_rungs)}
        self.trial_metric_getter = trial_metric_getter
        self._logger = logger
        # promoted slots handed to the caller but not yet bound via
        # report_trial — without this, two get_next_run() calls before
        # a report would hand the SAME promotion out twice and leave
        # another slot permanently unstarted
        self._handed_out: set = set()

    def _metrics(self, ids):
        if self.trial_metric_getter is None:
            return {}
        return dict(self.trial_metric_getter(ids) or {})

    def get_next_run(self):
        """{"trial_id": None|promoted_id, "budget": b} for the next
        slot, or None when waiting on running trials / finished."""
        self.state = SHIteration.RUNNING
        rung = self.current_rung
        if self.actual_n_configs[rung] < self.n_configs[rung]:
            if rung == 0:
                self.actual_n_configs[0] += 1
                return {"trial_id": None, "budget": self.budgets[0]}
            for cfg in self.configs[rung]:
                if cfg["actual_trial_id"] is None and cfg["original_trial_id"] not in self._handed_out:
                    self.actual_n_configs[rung] += 1
                    self._handed_out.add(cfg["original_trial_id"])
                    return {"trial_id": cfg["original_trial_id"], "budget": self.budgets[rung]}
            return None  # promotions awaiting report_trial
        if self.promotable():
            if self.current_rung + 1 < self.n_rungs:
                self.promote()
                return self.get_next_run()
            self.state = SHIteration.FINISHED
            return None
        return None

    def report_trial(self, original_trial_id, new_trial_id):
        """Bind the trial the optimizer actually started to its slot."""
        rung = self.current_rung
        if original_trial_id is None:
            self.configs[rung].append(
                {"original_trial_id": new_trial_id, "actual_trial_id": new_trial_id}
            )
        else:
            for cfg in self.configs[rung]:
                if cfg["original_trial_id"] == original_trial_id and cfg["actual_trial_id"] is None:
                    cfg["actual_trial_id"] = new_trial_id
                    self._handed_out.discard(original_trial_id)
                    break

    def promotable(self):
        """True when every slot of the current rung is bound AND
        finished (its metric is available)."""
        rung = self.current_rung
        if self.actual_n_configs[rung] < self.n_configs[rung]:
            return False
        actual = [c["actual_trial_id"] for c in self.configs[rung]]
        if len(actual) < self.n_configs[rung] or any(a is None for a in actual):
            return False
        return len(self._metrics(actual)) == len(actual)

    def promote(self):
        """Advance the best 1/eta of the settled rung; returns the
        promoted trial ids (ascending metric, stable ties)."""
        rung = self.current_rung
        actual = [c["actual_trial_id"] for c in self.configs[rung]]
        metrics = self._metrics(actual)
        keep = self.n_configs[rung + 1]
        ranked = sorted(actual, key=lambda tid: metrics[tid])[:keep]
        self.current_rung = rung + 1
        for tid in ranked:
            self.configs[self.current_rung].append(
                {"original_trial_id": tid, "actual_trial_id": None}
            )
        return ranked

    def finished(self):
        """True once the last rung has fully settled."""
        last = self.n_rungs - 1
        if self.current_rung != last:
            return False
        if self.actual_n_configs[last] < self.n_configs[last]:
            return False
        actual = [c["actual_trial_id"] for c in self.configs[last]]
        if len(actual) < self.n_configs[last] or any(a is None for a in actual):
            return False
        if len(self._metrics(actual)) == len(actual):
            self.state = SHIteration.FINISHED
            return True
        return False
