"""The headline capability: thousands of perturbed-RHS LPs in one batched
device program, sharded over all available chips."""

import sys as _sys, pathlib as _pathlib

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import clp_tpu
from clp_tpu import solve_batch
from clp_tpu.parallel.mesh import make_mesh
from clp_tpu.utils.generators import random_lp

base = random_lp(32, 48, seed=0)
rng = np.random.default_rng(1)
models = []
for _ in range(32):
    m = base.copy()
    shift = np.abs(rng.uniform(0, 0.05, m.num_rows))
    m.row_lower = np.where(m.row_lower > -clp_tpu.INF, m.row_lower - shift, m.row_lower)
    m.row_upper = np.where(m.row_upper < clp_tpu.INF, m.row_upper + shift, m.row_upper)
    models.append(m)

sols = solve_batch(models, mesh=make_mesh())
ok = sum(s.status == clp_tpu.ProblemStatus.OPTIMAL for s in sols)
objs = [s.objective_value for s in sols]
print(f"{ok}/{len(models)} optimal; objective range [{min(objs):.4f}, {max(objs):.4f}]")
