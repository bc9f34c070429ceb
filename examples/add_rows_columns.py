"""Incremental model building (examples/addRows.cpp + addColumns.cpp):
build an LP row-by-row and column-by-column, then solve."""

import sys as _sys, pathlib as _pathlib

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import scipy.sparse as sp

from clp_tpu import Model, INF

# start empty, add 3 columns (x, y, z) with costs 1, 2, 3
m = Model()
m.add_columns(sp.csc_matrix((0, 3)), lower=[0.0] * 3, upper=[10.0] * 3,
              objective=[1.0, 2.0, 3.0])
# add rows one batch at a time: x + y >= 4;  y + z >= 3;  x + z <= 8
m.add_rows(sp.csc_matrix(np.array([[1.0, 1.0, 0.0]])), lower=[4.0], upper=[INF])
m.add_rows(sp.csc_matrix(np.array([[0.0, 1.0, 1.0], [1.0, 0.0, 1.0]])),
           lower=[3.0, -INF], upper=[INF, 8.0])
sol = m.initial_solve()
print(f"{sol.status.name}: obj={sol.objective_value:.6g} x={np.round(sol.primal, 6)}")
assert sol.status.name == "OPTIMAL"
