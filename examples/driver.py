"""Dual solve then primal polish (examples/driver.cpp flow)."""

import sys as _sys, pathlib as _pathlib

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import sys

from clp_tpu import Model, SolveOptions, SolveMethod

path = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/examples/modified_afiro.mps"
model = Model()
assert model.read_mps(path) == 0

opts = SolveOptions(method=SolveMethod.DUAL_SIMPLEX)
sol = model.initial_solve(opts)
print(f"dual:   {sol.status.name} obj {sol.objective_value:.10g} its {sol.iterations}")

# warm primal polish from the dual's basis
from clp_tpu.simplex.driver import simplex_solve

opts2 = SolveOptions()
opts2.presolve.enabled = False
sol2 = simplex_solve(model, opts2, dual=False, warm=sol)
print(f"primal: {sol2.status.name} obj {sol2.objective_value:.10g} its {sol2.iterations}")
