"""Portfolio racing — run several solver configurations, first winner takes it.

Reference: ClpRacingSolver (ClpRacingSolver.hpp:12-26) races {dual,
primal+idiot, primal+sprint} clones on std::threads with an atomic abort.
TPU-native version: each configuration is pinned to its own device when
several are available (racing across chips), else configurations time-slice
one device via threads; the first OPTIMAL result wins and is installed on
the model.
"""

from __future__ import annotations

import threading
from typing import Optional, Sequence

import jax

from ..constants import ProblemStatus, SolveMethod
from ..model import Model, Solution
from ..options import SolveOptions


def default_race_configs() -> list[SolveOptions]:
    """The reference's portfolio: dual / primal+idiot / barrier."""
    a = SolveOptions(method=SolveMethod.DUAL_SIMPLEX)
    b = SolveOptions(method=SolveMethod.PRIMAL_SIMPLEX, crash="idiot")
    c = SolveOptions(method=SolveMethod.BARRIER_NO_CROSS)
    return [a, b, c]


def racing_solve(
    model: Model,
    configs: Optional[Sequence[SolveOptions]] = None,
    devices: Optional[Sequence] = None,
) -> Solution:
    configs = list(configs or default_race_configs())
    devices = list(devices or jax.devices())
    winner: dict = {}
    lock = threading.Lock()
    done = threading.Event()

    def run(i: int, opts: SolveOptions):
        mod = model.copy()
        dev = devices[i % len(devices)]
        try:
            with jax.default_device(dev):
                sol = mod.initial_solve(opts)
        except Exception as e:  # noqa: BLE001 — a losing config must not kill the race
            sol = Solution(status=ProblemStatus.ERRORS)
            sol.error = str(e)  # type: ignore[attr-defined]
        with lock:
            if sol.status == ProblemStatus.OPTIMAL and "sol" not in winner:
                winner["sol"] = sol
                winner["config"] = i
                done.set()
            winner.setdefault("results", []).append((i, sol))
            if len(winner["results"]) == len(configs):
                done.set()

    threads = [
        threading.Thread(target=run, args=(i, o), daemon=True)
        for i, o in enumerate(configs)
    ]
    for t in threads:
        t.start()
    done.wait()
    for t in threads:
        t.join(timeout=60.0)

    if "sol" in winner:
        model.solution = winner["sol"]
        model.solution.winning_config = winner["config"]  # type: ignore[attr-defined]
        return model.solution
    # no optimal finisher: return the most definitive result
    order = {
        ProblemStatus.PRIMAL_INFEASIBLE: 0,
        ProblemStatus.DUAL_INFEASIBLE: 1,
        ProblemStatus.STOPPED: 2,
        ProblemStatus.ERRORS: 3,
        ProblemStatus.UNKNOWN: 4,
    }
    results = sorted(winner.get("results", []), key=lambda r: order.get(r[1].status, 9))
    sol = results[0][1] if results else Solution(status=ProblemStatus.ERRORS)
    model.solution = sol
    return sol
