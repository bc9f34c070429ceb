"""Irreducible infeasible subsystem via Farkas support + deletion filter
(examples/iis.cpp role: explain WHY a model is infeasible).

The Farkas ray's nonzero components name rows whose combination proves
infeasibility; a deletion filter then shrinks that set to an irreducible
one (every row necessary). Each trial drops one candidate row (bounds to
±inf) and re-solves — batched-friendly, but kept sequential here for
clarity.
"""

import sys as _sys, pathlib as _pathlib

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import scipy.sparse as sp

from clp_tpu import INF, Model, SolveOptions, SolveMethod, ProblemStatus


def build_infeasible():
    """x1+x2 >= 4, x1 <= 1, x2 <= 1 conflict; x3 rows are innocent."""
    A = sp.csc_matrix(np.array([
        [1.0, 1.0, 0.0],   # x1 + x2 >= 4   (conflicting)
        [1.0, 0.0, 0.0],   # x1 <= 1        (conflicting)
        [0.0, 1.0, 0.0],   # x2 <= 1        (conflicting)
        [0.0, 0.0, 1.0],   # x3 <= 10       (innocent)
        [1.0, 0.0, 1.0],   # x1 + x3 <= 20  (innocent)
    ]))
    m = Model()
    m.load_problem(
        A,
        col_lower=[0, 0, 0], col_upper=[INF, INF, INF],
        objective=[1.0, 1.0, 1.0],
        row_lower=[4.0, -INF, -INF, -INF, -INF],
        row_upper=[INF, 1.0, 1.0, 10.0, 20.0],
    )
    return m


def solve_status(model):
    opts = SolveOptions(method=SolveMethod.DUAL_SIMPLEX)
    opts.presolve.enabled = False  # keep rays available
    return model.initial_solve(opts)


def iis_rows(model):
    sol = solve_status(model)
    assert sol.status == ProblemStatus.PRIMAL_INFEASIBLE, sol.status
    ray = model.infeasibility_ray()
    cand = (
        list(np.flatnonzero(np.abs(ray) > 1e-9))
        if ray is not None else list(range(model.num_rows))
    )
    print(f"Farkas support: rows {cand}")
    # deletion filter: a row is necessary iff freeing it restores feasibility
    iis = list(cand)
    for r in list(iis):
        trial = model.copy()
        trial.row_lower = trial.row_lower.copy()
        trial.row_upper = trial.row_upper.copy()
        others = [q for q in range(model.num_rows) if q not in iis or q == r]
        # free every row outside the current candidate set AND the trial row
        for q in set(others) - set(iis) | {r}:
            trial.row_lower[q] = -INF
            trial.row_upper[q] = INF
        if solve_status(trial).status == ProblemStatus.OPTIMAL:
            pass  # r is necessary: removing it made the rest feasible
        else:
            iis.remove(r)  # still infeasible without r -> r redundant
    return iis


model = build_infeasible()
iis = iis_rows(model)
print(f"IIS: rows {iis} (each necessary, together infeasible)")
assert set(iis) == {0, 1, 2}, iis
print("matches the known conflict {0, 1, 2}")

# the library API runs the same filter with every round's trials in ONE
# batched dual-simplex sweep on-device (clp_tpu.analysis.find_iis)
from clp_tpu.analysis import find_iis

assert find_iis(build_infeasible()) == [0, 1, 2]
print("library find_iis (batched sweeps) agrees")
