"""Explicit dualization (examples/makeDual.cpp): build the LP dual, solve
it, and map the solution back to the primal (ClpSimplexOther::dualize)."""

import sys as _sys, pathlib as _pathlib

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

from clp_tpu import Model
from clp_tpu.analysis import dualize, restore_from_dual

m = Model()
assert m.read_mps("/root/reference/examples/modified_afiro.mps") == 0
direct = m.copy().initial_solve()

dual_model, mapping = dualize(m)
dual_model.initial_solve()
restore_from_dual(m, dual_model, mapping)
psol = m.solution
print(f"direct obj {direct.objective_value:.8g} | "
      f"via dual {psol.objective_value:.8g}")
assert abs(direct.objective_value - psol.objective_value) < 1e-5 * (
    1 + abs(direct.objective_value)
)
