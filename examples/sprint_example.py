"""Sprint / sifting on a wide LP (examples/sprint.cpp equivalent)."""

import sys as _sys, pathlib as _pathlib

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

from clp_tpu import SolveOptions, SolveMethod
from clp_tpu.utils.generators import random_lp

model = random_lp(10, 2000, seed=0, density=0.2)
sol = model.initial_solve(SolveOptions(method=SolveMethod.SPRINT))
print(f"{sol.status.name}: objective {sol.objective_value:.10g} its {sol.iterations}")
