"""Benders decomposition with batched scenario subproblems
(examples/decompose.cpp spirit, scenario flavor)."""

import sys as _sys, pathlib as _pathlib

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tests"))
from test_decompose import _two_stage  # reuse the generator

from clp_tpu.decompose import benders_solve, extensive_form
from clp_tpu import SolveOptions, SolveMethod

ts = _two_stage(S=8, seed=1)
sol, x = benders_solve(ts)
print(f"benders: {sol.status.name} obj {sol.objective_value:.8g} in {sol.iterations} cuts")

ext = extensive_form(ts)
o = SolveOptions(method=SolveMethod.DUAL_SIMPLEX)
s2 = ext.initial_solve(o)
print(f"extensive form: {s2.status.name} obj {s2.objective_value:.8g}")
