"""Auto-decomposition of a FLAT two-stage model (reference:
ClpSimplex::solve(CoinStructuredModel*) decomposeType dispatch,
ClpSolve.cpp:4910-4924 — but there the caller must supply the blocks;
here the scenario structure is DETECTED from the flat matrix and the
AUTOMATIC method routes to Benders with the batched-IPM scenario
sweep, finishing with a verified simplex polish on the flat model)."""

import sys as _sys, pathlib as _pathlib

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import scipy.sparse as sp

from clp_tpu import INF, ProblemStatus, SolveMethod, SolveOptions
from clp_tpu.decompose import TwoStageLP, extensive_form
from clp_tpu.solve import _auto_method
from clp_tpu.structure import detect_two_stage

rng = np.random.default_rng(0)
S, n1, m2, n2 = 16, 4, 14, 32
eye = np.broadcast_to(np.eye(m2), (S, m2, m2))
W = np.concatenate(
    [rng.uniform(-1, 1, (S, m2, n2 - 2 * m2)), eye, -eye], axis=2)
ts = TwoStageLP(
    c=rng.uniform(1, 2, n1),
    A=sp.csc_matrix(np.ones((1, n1))),
    row_lower=np.array([-INF]), row_upper=np.array([10.0]),
    col_lower=np.zeros(n1), col_upper=np.full(n1, 3.0),
    T=rng.uniform(-0.5, 0.5, (S, m2, n1)),
    W=W,
    h=rng.uniform(0, 1, (S, m2)),
    q=np.concatenate(
        [rng.uniform(0.5, 1.5, (S, W.shape[2] - 2 * m2)),
         np.full((S, 2 * m2), 5.0)], axis=1),
    prob=np.full(S, 1.0 / S),
)
flat = extensive_form(ts)  # a plain flat Model — no block annotations
det = detect_two_stage(flat)
print(f"detected: {len(det.scenario_rows)} scenarios, "
      f"{det.x_cols.size} first-stage columns, "
      f"{det.stage1_rows.size} first-stage rows")
assert _auto_method(flat, SolveOptions()) == SolveMethod.DECOMPOSE

sol = flat.initial_solve()  # AUTOMATIC -> Benders -> verified finish
print(f"{sol.status.name}: obj={sol.objective_value:.8g} "
      f"({sol.iterations} finish pivots)")
assert sol.status == ProblemStatus.OPTIMAL
