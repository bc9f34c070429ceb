"""GUB-structured LP (examples/testGub2.cpp): generalized-upper-bound row
sets are detected and solved by the IN-ENGINE key-variable GUB simplex —
the working basis covers only the general rows, each set's key variable is
implicit in its convexity row (ClpGubMatrix role). Answers verified
against the plain dual simplex."""

import sys as _sys, pathlib as _pathlib

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import time

import numpy as np
import scipy.sparse as sp

from clp_tpu import Model, SolveOptions, SolveMethod, INF
from clp_tpu.gub import detect_gub, solve_gub
from clp_tpu.solve import _auto_method

rng = np.random.default_rng(0)
n_sets, per = 40, 5  # 40 GUB sets of 5 variables each
n = n_sets * per
# a few linking rows + GUB convexity rows sum(x_set) <= 1
link = rng.uniform(0, 2, (3, n))
gub = np.zeros((n_sets, n))
for s in range(n_sets):
    gub[s, s * per:(s + 1) * per] = 1.0
A = np.vstack([link, gub])
m = Model()
m.load_problem(
    sp.csc_matrix(A),
    col_lower=np.zeros(n), col_upper=np.full(n, INF),
    objective=rng.uniform(-2, -0.5, n),
    row_lower=np.concatenate([np.full(3, -INF), np.full(n_sets, -INF)]),
    row_upper=np.concatenate([rng.uniform(3, 6, 3), np.ones(n_sets)]),
)
sets = detect_gub(m)
print(f"detected {len(sets)} GUB sets "
      f"(auto method: {_auto_method(m, SolveOptions()).name})")

t0 = time.time()
sol_gub = solve_gub(m.copy())  # 3x3 working basis instead of 43x43
t_gub = time.time() - t0
t0 = time.time()
sol_ref = m.copy().initial_solve(SolveOptions(method=SolveMethod.DUAL_SIMPLEX))
t_ref = time.time() - t0
print(f"GUB engine : {sol_gub.status.name} obj={sol_gub.objective_value:.8g} "
      f"({sol_gub.iterations} pivots, {t_gub:.3f}s)")
print(f"dense dual : {sol_ref.status.name} obj={sol_ref.objective_value:.8g} "
      f"({sol_ref.iterations} pivots, {t_ref:.3f}s)")
assert sol_gub.status.name == sol_ref.status.name == "OPTIMAL"
assert abs(sol_gub.objective_value - sol_ref.objective_value) <= 1e-6 * (
    1 + abs(sol_ref.objective_value))
