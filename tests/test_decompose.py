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


# ---------------------------------------------------------------------------
# Auto-decomposition from a FLAT model (ClpSolve.cpp:4910-4924 dispatch +
# master detection :5323-5352 — detection from the flat model is ours)
# ---------------------------------------------------------------------------


def _flat_two_stage(S=16, n1=4, m2=16, n2=40, seed=2):
    ts = _two_stage(S=S, n1=n1, m2=m2, n2=n2, seed=seed)
    return ts, extensive_form(ts)


def test_detect_two_stage_on_flat_model():
    from clp_tpu.structure import detect_two_stage, build_two_stage

    ts, flat = _flat_two_stage()
    det = detect_two_stage(flat)
    assert det is not None
    S, m2, _ = ts.W.shape
    n1 = ts.c.size
    assert det.x_cols.size == n1
    assert np.array_equal(det.x_cols, np.arange(n1))  # x first in ext form
    assert len(det.scenario_rows) == S
    assert all(r.size == m2 for r in det.scenario_rows)
    ts2 = build_two_stage(flat, det)
    # round-trip: the rebuilt scenario data must match (scenario ORDER may
    # permute; match on sorted h row-sums as a cheap signature)
    assert np.allclose(
        np.sort(ts2.h.sum(axis=1)), np.sort(ts.h.sum(axis=1)), atol=1e-12
    )


def test_detect_rejects_unstructured():
    from clp_tpu.structure import detect_two_stage
    from clp_tpu.utils.generators import random_lp

    assert detect_two_stage(random_lp(96, 160, seed=0)) is None


def test_auto_method_routes_flat_two_stage_to_decompose():
    from clp_tpu.solve import _auto_method

    _, flat = _flat_two_stage()
    assert _auto_method(flat, SolveOptions()) == SolveMethod.DECOMPOSE


def test_flat_two_stage_auto_solves_via_benders(monkeypatch):
    import clp_tpu.structure as structure

    ts, flat = _flat_two_stage()
    ref = _linprog(extensive_form(ts))
    assert ref.status == 0

    calls = {"n": 0}
    real = structure.auto_decompose_solve

    def spy(model, options):
        calls["n"] += 1
        return real(model, options)

    monkeypatch.setattr(structure, "auto_decompose_solve", spy)
    sol = flat.initial_solve(SolveOptions())
    assert calls["n"] >= 1, "AUTOMATIC did not take the DECOMPOSE route"
    assert sol.status == ProblemStatus.OPTIMAL
    assert abs(sol.objective_value - ref.fun) < 1e-6 * (1 + abs(ref.fun))
    # the finish is the verified simplex path: KKT must hold on the flat model
    from clp_tpu.validate import check_kkt

    rep = check_kkt(flat, x=sol.primal, y=sol.duals, tol=1e-6)
    assert rep.ok


def test_detect_block_angular():
    from clp_tpu.structure import detect_block_angular

    rng = np.random.default_rng(5)
    K, mb, nb_ = 6, 10, 14
    blocks = [sp.random(mb, nb_, density=0.5, random_state=int(rng.integers(1e6)),
                        data_rvs=lambda s: rng.uniform(0.5, 1.5, s))
              for _ in range(K)]
    A = sp.block_diag(blocks).tocsc()
    link = sp.csc_matrix(np.ones((2, K * nb_)))
    Afull = sp.vstack([link, A]).tocsc()
    m = Model()
    m.load_problem(
        Afull,
        col_lower=np.zeros(K * nb_),
        col_upper=np.ones(K * nb_),
        objective=rng.uniform(-2, -0.5, K * nb_),
        row_lower=np.full(2 + K * mb, -INF),
        row_upper=np.concatenate([[4.0, 5.0], rng.uniform(2, 3, K * mb)]),
    )
    det = detect_block_angular(m)
    assert det is not None
    assert det.linking_rows.size <= 4  # the 2 true linking rows (+ refinement slack)
    assert 0 in det.linking_rows and 1 in det.linking_rows
    assert len(det.block_cols) == K
    assert sorted(c.size for c in det.block_cols) == [nb_] * K

    # unstructured models are rejected
    from clp_tpu.utils.generators import random_lp

    assert detect_block_angular(random_lp(40, 60, seed=1)) is None
