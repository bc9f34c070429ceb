"""Matrix-free barrier (examples/pdco.cpp / myPdco.cpp): solve with the
LSQR Newton solver and a user preconditioner hook instead of dense
Cholesky (ClpPdco + ClpLsqr + ClpPdcoBase::matPrecon roles)."""

import sys as _sys, pathlib as _pathlib

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from clp_tpu.forms import to_ipm_form
from clp_tpu.interior.mehrotra import IPMOptions, ipm_solve
from clp_tpu.utils.generators import random_lp

m = random_lp(60, 120, seed=0)
lp, _ = to_ipm_form(m)
ref = ipm_solve(lp, IPMOptions())  # dense Cholesky
lsqr = ipm_solve(lp, IPMOptions(linear_solver="lsqr", cg_maxiter=400))
print(f"cholesky obj {float(ref.pobj):.8g} ({int(ref.iterations)} its) | "
      f"lsqr obj {float(lsqr.pobj):.8g} ({int(lsqr.iterations)} its)")
assert bool(lsqr.converged)
assert abs(float(ref.pobj) - float(lsqr.pobj)) < 1e-6 * (1 + abs(float(ref.pobj)))
