"""Netlib-scale structure at tight tolerance (staircase LP)."""

import numpy as np
import pytest
import scipy.sparse as sp

import clp_tpu
from clp_tpu import Model, SolveOptions, SolveMethod, ProblemStatus, check_kkt
from tests.test_mps import _linprog


def staircase_lp(nblocks=8, bm=25, bn=40, seed=0):
    """Netlib-like staircase: diagonal blocks + coupling columns."""
    rng = np.random.default_rng(seed)
    m, n = nblocks * bm, nblocks * bn
    rows, cols, vals = [], [], []
    for k in range(nblocks):
        r0, c0 = k * bm, k * bn
        B = sp.random(bm, bn, density=0.1, random_state=rng,
                      data_rvs=rng.standard_normal).tocoo()
        rows += list(r0 + B.row)
        cols += list(c0 + B.col)
        vals += list(B.data)
        if k + 1 < nblocks:
            C = sp.random(bm, 8, density=0.4, random_state=rng,
                          data_rvs=rng.standard_normal).tocoo()
            rows += list(r0 + C.row)
            cols += list((k + 1) * bn + C.col)
            vals += list(C.data)
    A = sp.coo_matrix((vals, (rows, cols)), shape=(m, n)).tocsc()
    d = np.asarray(abs(A).sum(axis=1)).ravel()
    A = A.tolil()
    for i in np.flatnonzero(d == 0):
        A[i, rng.integers(n)] = 1.0
    A = A.tocsc()
    x_feas = rng.uniform(0.5, 1.5, n)
    ax = A @ x_feas
    eq = rng.uniform(size=m) < 0.3
    slack = rng.uniform(0.5, 2.0, m)
    model = Model()
    model.load_problem(
        A, np.zeros(n), np.full(n, 10.0), rng.standard_normal(n),
        np.where(eq, ax, ax - slack), np.where(eq, ax, ax + slack),
    )
    return model


@pytest.mark.parametrize("method", [SolveMethod.DUAL_SIMPLEX, SolveMethod.BARRIER])
def test_staircase_tight_tolerance(method):
    model = staircase_lp()
    ref = _linprog(model)
    assert ref.status == 0
    sol = model.initial_solve(SolveOptions(method=method))
    assert sol.status == ProblemStatus.OPTIMAL
    rel = abs(sol.objective_value - ref.fun) / (1 + abs(ref.fun))
    assert rel < 1e-8, rel
    assert check_kkt(model).ok
