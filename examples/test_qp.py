"""Convex QP via the barrier (examples/testQP.cpp workload)."""

import sys as _sys, pathlib as _pathlib

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import scipy.sparse as sp

from clp_tpu import Model, INF

# min 0.5(x1^2 + 2 x2^2 + x1 x2) - x1 - 2 x2   s.t. x1 + x2 <= 1, x >= 0
model = Model()
model.load_problem(
    sp.csc_matrix(np.array([[1.0, 1.0]])),
    col_lower=[0, 0], col_upper=[INF, INF],
    objective=[-1.0, -2.0], row_lower=[-INF], row_upper=[1.0],
)
model.load_quadratic_objective(sp.csc_matrix(np.array([[1.0, 0.5], [0.5, 2.0]])))
sol = model.barrier(crossover=False)
print(f"{sol.status.name}: objective {sol.objective_value:.8g} x = {sol.primal}")
