"""Objective parametrics (examples/piece.cpp spirit)."""

import sys as _sys, pathlib as _pathlib

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from clp_tpu import SolveOptions, SolveMethod
from clp_tpu.analysis import parametrics
from clp_tpu.utils.generators import random_lp

model = random_lp(8, 12, seed=4)
o = SolveOptions(method=SolveMethod.DUAL_SIMPLEX)
o.presolve.enabled = False
model.initial_solve(o)

dc = np.zeros(model.num_cols)
dc[0] = 1.0
points = parametrics(model, theta_end=3.0, dc=dc)
for theta, obj in points:
    print(f"theta = {theta:8.4f}  objective = {obj:.8g}")
