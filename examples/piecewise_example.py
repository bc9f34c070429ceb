"""Piecewise-linear convex costs (examples/piece.cpp / piecewise.cpp):
replace a column's linear cost with a convex piecewise curve on the same
modified-afiro model the reference example uses."""

import sys as _sys, pathlib as _pathlib

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

from clp_tpu import Model
from clp_tpu.piecewise import (
    set_piecewise_linear_cost,
    recover_piecewise_value,
    solve_piecewise,
)

m = Model()
assert m.read_mps("/root/reference/examples/modified_afiro.mps") == 0
lin = m.copy().initial_solve()
# convex piecewise cost on column 0 over its [10, 12] domain
bps, slopes = [10.0, 11.0, 12.0], [-2.0, 0.5]

# path 1: in-engine (ClpNonLinearCost parity — zero extra columns)
m_engine = m.copy()
sol_engine = solve_piecewise(m_engine, {0: (bps, slopes)})
assert m_engine.num_cols == m.num_cols  # no column expansion

# path 2: exact segment reformulation (device-kernel friendly)
info = set_piecewise_linear_cost(m, 0, bps, slopes)
sol = m.initial_solve()
x0 = recover_piecewise_value(m, info)
print(f"linear obj {lin.objective_value:.8g} | piecewise obj "
      f"{sol.objective_value:.8g}, x[0]={x0:.6g} | in-engine obj "
      f"{sol_engine.objective_value:.8g}, x[0]={sol_engine.primal[0]:.6g}")
assert sol.status.name == sol_engine.status.name == "OPTIMAL"
assert abs(sol.objective_value - sol_engine.objective_value) < 1e-6 * (
    1 + abs(sol.objective_value))
