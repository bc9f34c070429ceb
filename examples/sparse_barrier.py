"""General sparse Cholesky in the barrier (ClpCholeskyBase role).

An LP whose normal equations G D G' are sparse but NOT banded (local
windows + sporadic long-range coupling, so RCM finds no useful band) is
factored by the supernodal multifrontal plan: minimum-degree ordering +
etree postorder symbolic once, dense-tile POTRF/TRSM/SYRK numeric per IPM
iteration (ops/sparse_chol.py) — O(fill) instead of O(m^3)."""

import sys as _sys, pathlib as _pathlib

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import scipy.sparse as sp

from clp_tpu import Model, SolveOptions, SolveMethod
from clp_tpu.ops.sparse_chol import SparseCholesky, make_normal_solver
from clp_tpu.validate import check_kkt

rng = np.random.default_rng(7)
m_, ncols, win = 768, 1536, 30
rows, cols, vals = [], [], []
for i in range(m_):
    base = int(i * (ncols - win) / m_)
    for j in base + rng.choice(win, 10, replace=False):
        rows.append(i), cols.append(int(j)), vals.append(rng.normal())
    if rng.random() < 0.15:  # long-range coupling: breaks bandedness
        rows.append(i), cols.append(int(rng.integers(0, ncols)))
        vals.append(rng.normal())
A = sp.csr_matrix((vals, (rows, cols)), shape=(m_, ncols)).tocsc()
x0 = rng.random(ncols)
b = A @ x0
model = Model()
model.load_problem(A, np.zeros(ncols), np.full(ncols, 3.0),
                   rng.normal(size=ncols), b - rng.random(m_),
                   b + rng.random(m_))

G = sp.hstack([A, sp.eye(m_)]).tocsr()
solver = make_normal_solver(G, reg=1e-10)
if solver is not None and solver.plan is not None:
    plan: SparseCholesky = solver.plan
    fill = plan.nnz_L / (m_ * (m_ + 1) / 2)
    print(f"sparse plan: {len(plan.sn_rows)} supernodes, "
          f"|L| = {plan.nnz_L} ({100 * fill:.1f}% of dense)")

opts = SolveOptions(method=SolveMethod.BARRIER_NO_CROSS)
opts.presolve.enabled = False
sol = model.initial_solve(opts)
rep = check_kkt(model, tol=1e-5)
print(f"{sol.status.name}: obj={sol.objective_value:.8g} in "
      f"{sol.iterations} IPM iterations, KKT ok={rep.ok}")
assert sol.status.name == "OPTIMAL" and rep.ok
