"""Print every solver default (examples/defaults.cpp equivalent)."""

import sys as _sys, pathlib as _pathlib

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import dataclasses

from clp_tpu import Model, SolveOptions
from clp_tpu.interior.mehrotra import IPMOptions
from clp_tpu.simplex.engine import SimplexOptions

model = Model()
print("== Model parameters ==")
for k in ("primal_tolerance", "dual_tolerance", "maximum_iterations",
          "maximum_seconds", "dual_objective_limit", "infeasibility_cost",
          "scaling_mode", "perturbation", "random_seed", "log_level"):
    print(f"  {k:24s} = {getattr(model, k)}")

for title, obj in (("SolveOptions", SolveOptions()),
                   ("SimplexOptions", SimplexOptions()),
                   ("IPMOptions", IPMOptions())):
    print(f"== {title} ==")
    for f in dataclasses.fields(obj):
        print(f"  {f.name:24s} = {getattr(obj, f.name)}")
