"""Efficient frontier by scenario-batched QP: one device program solves
every risk-aversion point at once.

The framework's headline capability (SURVEY.md §2 "scenario batching —
absent in reference") on a classic workload: Markowitz portfolios

    min  -mu'w + (gamma/2) w' Sigma w
    s.t. sum w = 1,  0 <= w <= cap

for a sweep of gamma values. The reference would solve these one at a
time; here the batch shares one IPM program (same shapes, vmapped), so the
whole frontier costs about one solve.
"""

import sys as _sys, pathlib as _pathlib

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import scipy.sparse as sp

from clp_tpu import INF, Model, ProblemStatus, SolveOptions, solve_batch

N_ASSETS = 24
N_GAMMAS = 16

rng = np.random.default_rng(7)
mu = rng.uniform(0.02, 0.12, N_ASSETS)
F = rng.standard_normal((N_ASSETS, 4)) * 0.15          # factor loadings
Sigma = F @ F.T + np.diag(rng.uniform(0.01, 0.04, N_ASSETS))

gammas = np.geomspace(0.5, 50.0, N_GAMMAS)
models = []
for g in gammas:
    m = Model()
    m.load_problem(
        sp.csc_matrix(np.ones((1, N_ASSETS))),          # budget row
        col_lower=np.zeros(N_ASSETS),
        col_upper=np.full(N_ASSETS, 0.2),               # 20% position cap
        objective=-mu,                                   # maximize return
        row_lower=[1.0], row_upper=[1.0],
    )
    m.load_quadratic_objective(sp.csc_matrix(g * Sigma))
    models.append(m)

opts = SolveOptions()
opts.presolve.enabled = False
sols = solve_batch(models, opts)

print(f"{'gamma':>8} {'return':>9} {'risk':>9} {'top holding':>12}")
prev_risk = np.inf
for g, s in zip(gammas, sols):
    assert s.status == ProblemStatus.OPTIMAL, s.status
    w = s.primal
    ret = float(mu @ w)
    risk = float(np.sqrt(w @ Sigma @ w))
    print(f"{g:8.2f} {ret:9.4f} {risk:9.4f} {np.argmax(w):12d}")
    # frontier property: more risk aversion -> no more risk
    assert risk <= prev_risk + 1e-6
    prev_risk = risk
print(f"frontier of {N_GAMMAS} portfolios solved in ONE batched program")
