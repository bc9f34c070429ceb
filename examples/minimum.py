"""Smallest possible driver (examples/minimum.cpp equivalent):
read an MPS file and solve with defaults."""

import sys as _sys, pathlib as _pathlib

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import sys

from clp_tpu import Model

path = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/examples/modified_afiro.mps"
model = Model()
assert model.read_mps(path) == 0, f"cannot read {path}"
sol = model.initial_solve()
print(f"{sol.status.name}: objective {sol.objective_value:.10g} "
      f"({sol.iterations} iterations, {sol.solve_time:.2f}s)")
