"""Piecewise-linear convex costs (examples/piece.cpp / piecewise.cpp):
replace a column's linear cost with a convex piecewise curve on the same
modified-afiro model the reference example uses."""

import sys as _sys, pathlib as _pathlib

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

from clp_tpu import Model
from clp_tpu.piecewise import set_piecewise_linear_cost, recover_piecewise_value

m = Model()
assert m.read_mps("/root/reference/examples/modified_afiro.mps") == 0
lin = m.copy().initial_solve()
# convex piecewise cost on column 0 over its [10, 12] domain
info = set_piecewise_linear_cost(m, 0, [10.0, 11.0, 12.0], [-2.0, 0.5])
sol = m.initial_solve()
x0 = recover_piecewise_value(m, info)
print(f"linear obj {lin.objective_value:.8g} | piecewise obj "
      f"{sol.objective_value:.8g}, x[0]={x0:.6g}")
assert sol.status.name == "OPTIMAL"
