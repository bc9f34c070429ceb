"""Benders (batched scenarios) and Dantzig-Wolfe vs extensive-form solves."""

import numpy as np
import pytest
import scipy.sparse as sp

import clp_tpu
from clp_tpu import Model, SolveOptions, SolveMethod, ProblemStatus, INF
from clp_tpu.decompose import TwoStageLP, benders_solve, extensive_form, dantzig_wolfe
from tests.test_mps import _linprog


def _two_stage(S=6, n1=4, m2=5, n2=8, seed=0):
    """Random two-stage LP with complete recourse (W contains +-I)."""
    rng = np.random.default_rng(seed)
    c = rng.uniform(1.0, 2.0, n1)
    A = sp.csc_matrix(np.ones((1, n1)))
    T = rng.uniform(-0.5, 0.5, (S, m2, n1))
    W_core = rng.uniform(-1, 1, (S, m2, n2 - 2 * m2)) if n2 > 2 * m2 else np.zeros((S, m2, 0))
    eye = np.broadcast_to(np.eye(m2), (S, m2, m2))
    W = np.concatenate([W_core, eye, -eye], axis=2)
    n2_eff = W.shape[2]
    h = rng.uniform(0.0, 1.0, (S, m2))
    q_slack = np.full((S, 2 * m2), 5.0)  # penalty on +-slack => complete recourse
    q_core = rng.uniform(0.5, 1.5, (S, n2_eff - 2 * m2))
    q = np.concatenate([q_core, q_slack], axis=1)
    prob = np.full(S, 1.0 / S)
    return TwoStageLP(
        c=c,
        A=A,
        row_lower=np.array([-INF]),
        row_upper=np.array([10.0]),
        col_lower=np.zeros(n1),
        col_upper=np.full(n1, 3.0),
        T=T,
        W=W,
        h=h,
        q=q,
        prob=prob,
    )


def test_benders_matches_extensive_form():
    ts = _two_stage()
    ext = extensive_form(ts)
    ref = _linprog(ext)
    assert ref.status == 0
    sol, x = benders_solve(ts)
    assert sol.status == ProblemStatus.OPTIMAL
    assert abs(sol.objective_value - ref.fun) < 1e-5 * (1 + abs(ref.fun)), (
        sol.objective_value,
        ref.fun,
    )


def test_dantzig_wolfe_matches_direct():
    """Two bounded blocks + linking capacity row."""
    rng = np.random.default_rng(3)

    def block(seed):
        m = Model()
        n = 6
        A = sp.csc_matrix(rng.uniform(0, 1, (3, n)))
        m.load_problem(
            A,
            col_lower=np.zeros(n),
            col_upper=np.ones(n),
            objective=rng.uniform(-2, -0.5, n),
            row_lower=np.full(3, -INF),
            row_upper=rng.uniform(2.0, 3.0, 3),
        )
        return m

    b1, b2 = block(1), block(2)
    L1 = sp.csc_matrix(np.ones((1, 6)))
    L2 = sp.csc_matrix(np.ones((1, 6)))
    link_lo = np.array([-INF])
    link_up = np.array([4.0])

    sol = dantzig_wolfe([b1, b2], [L1, L2], link_lo, link_up)
    assert sol.status == ProblemStatus.OPTIMAL

    # direct extensive model
    direct = Model()
    A_full = sp.vstack(
        [
            sp.hstack([L1, L2]),
            sp.hstack([b1.matrix, sp.csc_matrix((3, 6))]),
            sp.hstack([sp.csc_matrix((3, 6)), b2.matrix]),
        ],
        format="csc",
    )
    direct.load_problem(
        A_full,
        col_lower=np.zeros(12),
        col_upper=np.ones(12),
        objective=np.concatenate([b1.objective, b2.objective]),
        row_lower=np.concatenate([link_lo, b1.row_lower, b2.row_lower]),
        row_upper=np.concatenate([link_up, b1.row_upper, b2.row_upper]),
    )
    ref = _linprog(direct)
    assert ref.status == 0
    assert abs(sol.objective_value - ref.fun) < 1e-5 * (1 + abs(ref.fun))
