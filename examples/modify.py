"""Model modification round (examples/modify.cpp + addBits.cpp +
cleanModel.cpp roles): add rows/columns, change coefficients and bounds,
delete pieces, re-solve warm after each change."""

import sys as _sys, pathlib as _pathlib

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import scipy.sparse as sp

from clp_tpu import INF, Model, ProblemStatus, SolveMethod, SolveOptions

model = Model()
model.load_problem(
    sp.csc_matrix(np.array([[1.0, 1.0], [1.0, 3.0]])),
    col_lower=[0, 0], col_upper=[INF, INF], objective=[2.0, 3.0],
    row_lower=[-INF, -INF], row_upper=[4.0, 6.0],
)
model.set_maximize()
opts = SolveOptions(method=SolveMethod.DUAL_SIMPLEX)
sol = model.initial_solve(opts)
print(f"base:            {sol.status.name} obj {sol.objective_value:.6g}")
assert abs(sol.objective_value - 9.0) < 1e-7

# add a column (new activity with profit 5, consuming both resources)
model.add_columns(sp.csc_matrix(np.array([[2.0], [2.0]])),
                  lower=[0.0], upper=[INF], objective=[5.0])
sol = model.initial_solve(opts)
print(f"+column:         {sol.status.name} obj {sol.objective_value:.6g}")

# add a row (a new joint capacity constraint)
model.add_rows(sp.csc_matrix(np.array([[1.0, 1.0, 1.0]])),
               lower=[-INF], upper=[3.0])
sol = model.initial_solve(opts)
print(f"+row:            {sol.status.name} obj {sol.objective_value:.6g}")

# change one coefficient and a bound (modify.cpp role)
model.modify_coefficient(0, 0, 0.5)
model.col_upper = model.col_upper.copy()
model.col_upper[2] = 1.0
sol = model.initial_solve(opts)
print(f"coef+bound edit: {sol.status.name} obj {sol.objective_value:.6g}")

# delete the added pieces (cleanModel.cpp role) and confirm the original
# optimum returns after restoring the coefficient
model.delete_rows([2])
model.delete_columns([2])
model.modify_coefficient(0, 0, 1.0)
sol = model.initial_solve(opts)
print(f"cleaned:         {sol.status.name} obj {sol.objective_value:.6g}")
assert sol.status == ProblemStatus.OPTIMAL
assert abs(sol.objective_value - 9.0) < 1e-7
print("round-trip modification OK")
