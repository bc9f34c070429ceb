"""Osi-shaped adapter conformance (OsiClpSolverInterfaceTest pattern)."""

import numpy as np
import scipy.sparse as sp

import clp_tpu
from clp_tpu import INF
from clp_tpu.osi import OsiClpTpuSolverInterface
from clp_tpu.utils.generators import random_lp
from tests.test_mps import _linprog


def test_osi_solve_resolve_cycle():
    si = OsiClpTpuSolverInterface(random_lp(8, 12, seed=30))
    si.initialSolve()
    assert si.isProvenOptimal()
    obj1 = si.getObjValue()
    assert si.getColSolution().shape == (12,)
    assert si.getRowPrice().shape == (8,)
    # tighten one bound, resolve warm
    x = si.getColSolution()
    j = int(np.argmax(x))
    si.setColBounds(j, si.getColLower()[j], x[j] * 0.5)
    si.resolve()
    assert si.isProvenOptimal()
    ref = _linprog(si.model)
    assert abs(si.getObjValue() - ref.fun) < 1e-6 * (1 + abs(ref.fun))


def test_osi_hot_start():
    si = OsiClpTpuSolverInterface(random_lp(6, 9, seed=31))
    si.initialSolve()
    si.markHotStart()
    x = si.getColSolution().copy()
    lo = si.getColLower().copy()
    up = si.getColUpper().copy()
    j = int(np.argmax(x))
    si.setColBounds(j, lo[j], max(lo[j], x[j] * 0.25))
    si.solveFromHotStart()
    assert si.isProvenOptimal()
    ref = _linprog(si.model)
    assert abs(si.getObjValue() - ref.fun) < 1e-6 * (1 + abs(ref.fun))
    si.unmarkHotStart()


def test_osi_branch_and_bound():
    si = OsiClpTpuSolverInterface()
    rng = np.random.default_rng(5)
    n = 6
    v = rng.uniform(1, 5, n)
    w = rng.uniform(1, 4, n)
    si.loadProblem(
        sp.csc_matrix(w.reshape(1, -1)),
        np.zeros(n), np.ones(n), v, [-INF], [0.5 * w.sum()],
    )
    si.setObjSense(-1.0)
    for j in range(n):
        si.setInteger(j)
    res = si.branchAndBound()
    assert si.isProvenOptimal()
    x = si.getColSolution()
    assert np.abs(x - np.round(x)).max() < 1e-6


def test_osi_tableau_access():
    """OsiSimplexInterface group: B^-1 rows/cols over [A | -I]
    (reference: OsiClpSolverInterface getBInvARow family)."""
    si = OsiClpTpuSolverInterface(random_lp(8, 12, seed=31))
    si.options.presolve.enabled = False
    si.initialSolve()
    assert si.isProvenOptimal()
    si.enableFactorization()

    m, n = si.getNumRows(), si.getNumCols()
    basics = si.getBasics()
    assert basics.size == m

    A = np.asarray(si.model.matrix.todense())
    G = np.concatenate([A, -np.eye(m)], axis=1)
    B = G[:, basics]

    # B^-1 applied to B's columns is the identity
    for k in range(m):
        col = si.getBInvACol(int(basics[k]))
        e = np.zeros(m); e[k] = 1.0
        np.testing.assert_allclose(col, e, atol=1e-9)

    # rows of B^-1 G: stacked they equal inv(B) @ G
    T = np.stack([np.concatenate(si.getBInvARow(i)) for i in range(m)])
    np.testing.assert_allclose(T, np.linalg.solve(B, G), atol=1e-8)

    # BInvRow / BInvCol are consistent transposes of the same inverse
    R = np.stack([si.getBInvRow(i) for i in range(m)])
    C = np.stack([si.getBInvCol(i) for i in range(m)], axis=1)
    np.testing.assert_allclose(R, C, atol=1e-9)
    np.testing.assert_allclose(R @ B, np.eye(m), atol=1e-9)

    # basic solution consistency: x_B = B^-1 (b - N x_N) with b = 0
    x_full = np.concatenate([si.getColSolution(), si.getRowActivity()])
    nonbasic = np.setdiff1d(np.arange(n + m), basics)
    xb = np.linalg.solve(B, -G[:, nonbasic] @ x_full[nonbasic])
    np.testing.assert_allclose(x_full[basics], xb, atol=1e-7)

    si.disableFactorization()
    import pytest
    with pytest.raises(RuntimeError):
        si.getBInvRow(0)


def test_osi_single_pivot():
    """OsiSimplexInterface::pivot: one basis change, solution recomputed."""
    si = OsiClpTpuSolverInterface(random_lp(6, 10, seed=32))
    si.options.presolve.enabled = False
    si.initialSolve()
    assert si.isProvenOptimal()
    obj0 = si.getObjValue()
    si.enableFactorization()
    m, n = si.getNumRows(), si.getNumCols()
    basics = set(int(b) for b in si.getBasics())
    colOut = min(basics)
    colIn = next(j for j in range(n + m) if j not in basics)
    rc = si.pivot(colIn, colOut, -1)
    if rc == 0:
        assert colIn in set(int(b) for b in si.getBasics())
        # consistency: basic values satisfy the equality system
        x_full = np.concatenate([si.getColSolution(), si.getRowActivity()])
        A = np.asarray(si.model.matrix.todense())
        G = np.concatenate([A, -np.eye(m)], axis=1)
        np.testing.assert_allclose(G @ x_full, np.zeros(m), atol=1e-8)
        # a pivot away from the optimum cannot improve a minimization
        assert si.getObjValue() >= obj0 - 1e-7 * (1 + abs(obj0))
    import pytest
    nonbasic_now = [j for j in range(n + m)
                    if j not in set(int(b) for b in si.getBasics())]
    with pytest.raises(ValueError):  # colOut must be basic
        si.pivot(nonbasic_now[0], nonbasic_now[1], -1)
