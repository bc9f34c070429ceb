"""GUB-structured LP (examples/testGub2.cpp): generalized-upper-bound row
sets are detected and exploited by the GUB crash; answers verified against
the plain dual simplex."""

import sys as _sys, pathlib as _pathlib

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import scipy.sparse as sp

from clp_tpu import Model, SolveOptions, SolveMethod, INF
from clp_tpu.gub import detect_gub

rng = np.random.default_rng(0)
n_sets, per = 6, 4  # 6 GUB sets of 4 variables each
n = n_sets * per
# linking rows + GUB convexity rows sum(x_set) <= 1
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
print(f"detected {len(sets)} GUB sets")
sol = m.initial_solve(SolveOptions(method=SolveMethod.DUAL_SIMPLEX))
print(f"{sol.status.name}: obj={sol.objective_value:.8g}")
assert sol.status.name == "OPTIMAL" and len(sets) >= n_sets
