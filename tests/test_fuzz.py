"""Bounded fuzz battery — the patterns that caught real round-1 bugs.

(The full batteries — 360+75+90 solves — run out-of-band; this keeps a
representative slice in CI time.)
"""

import numpy as np
import pytest
import scipy.sparse as sp

import clp_tpu
from clp_tpu import Model, SolveOptions, SolveMethod, check_kkt, INF
from clp_tpu.utils.generators import random_lp
from tests.test_mps import _linprog

METHODS = [SolveMethod.DUAL_SIMPLEX, SolveMethod.PRIMAL_SIMPLEX, SolveMethod.BARRIER_NO_CROSS]


def _mutate_free(model, seed):
    r = np.random.default_rng(seed)
    n = model.num_cols
    model.col_lower = np.where(r.uniform(size=n) < 0.2, -INF, model.col_lower)
    model.col_upper = np.where(r.uniform(size=n) < 0.15, INF, model.col_upper)
    return model


CASES = []
for seed in (2, 10, 11):  # seeds that historically caught bugs
    CASES.append(("free-vars", seed))
for seed in (0, 3):
    CASES.append(("tall", seed))
    CASES.append(("tight", seed))
    CASES.append(("unbounded", seed))


def _build(kind, seed):
    if kind == "free-vars":
        m = _mutate_free(random_lp(14, 22, seed=100 + seed, density=0.25), seed)
        if seed % 2:
            m.set_maximize()
        return m
    if kind == "tall":
        return random_lp(20, 9, seed=seed, density=0.4)
    if kind == "unbounded":
        # append column -A[:,0]: moving (x_0, x_new) together is a ray with
        # cost -1 per unit -> certified unbounded (exercises the exact
        # primal-ray certificate path)
        import scipy.sparse as sp

        m = random_lp(15, 12, seed=200 + seed, density=0.4)
        a0 = np.asarray(m.matrix.todense())[:, 0:1]
        m.col_upper = m.col_upper.copy()
        m.col_upper[0] = INF
        m.add_columns(sp.csc_matrix(-a0), lower=[0.0], upper=[INF],
                      objective=[-float(m.objective[0]) - 1.0])
        return m
    # "tight": likely infeasible
    m = random_lp(12, 10, seed=seed, density=0.5)
    r = np.random.default_rng(7000 + seed)
    m.row_lower = m.row_lower + r.uniform(0.5, 3.0, 12)
    m.row_upper = m.row_lower + r.uniform(0.0, 0.01, 12)
    return m


@pytest.mark.parametrize("kind,seed", CASES)
@pytest.mark.parametrize("method", METHODS)
def test_fuzz_case(kind, seed, method):
    model = _build(kind, seed)
    ref = _linprog(model)
    sol = model.initial_solve(SolveOptions(method=method))
    if ref.status == 0:
        sense = model.optimization_direction
        ref_obj = -ref.fun if sense < 0 else ref.fun
        assert sol.status == clp_tpu.ProblemStatus.OPTIMAL, (kind, seed, sol.status)
        assert abs(sol.objective_value - ref_obj) < 1e-6 * (1 + abs(ref_obj))
    elif ref.status == 2:
        assert sol.status == clp_tpu.ProblemStatus.PRIMAL_INFEASIBLE
    elif ref.status == 3:
        assert sol.status == clp_tpu.ProblemStatus.DUAL_INFEASIBLE


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_fuzz_qp_kkt(seed):
    """Random convex QPs: no external oracle, so the KKT conditions are it."""
    rng = np.random.default_rng(seed)
    n, m = 7, 4
    B = rng.standard_normal((n, n))
    Q = B @ B.T + 0.5 * np.eye(n)
    model = Model()
    model.load_problem(
        sp.csc_matrix(rng.standard_normal((m, n))),
        col_lower=np.where(rng.uniform(size=n) < 0.3, -INF, -2.0),
        col_upper=np.full(n, 2.0),
        objective=rng.standard_normal(n),
        row_lower=np.full(m, -INF),
        row_upper=rng.uniform(1.0, 3.0, m),
    )
    model.load_quadratic_objective(sp.csc_matrix(Q))
    sol = model.barrier(crossover=False)
    assert sol.status == clp_tpu.ProblemStatus.OPTIMAL, seed
    rep = check_kkt(model)
    assert rep.ok, (seed, str(rep))


@pytest.mark.parametrize("seed", [0, 6, 11])
def test_fuzz_extreme_scaling(seed):
    """10-decade coefficient ranges; acceptance by strict-KKT or objective
    match (HiGHS tolerates small relative row violations we don't)."""
    r = np.random.default_rng(3000 + seed)
    m0 = random_lp(10, 15, seed=seed, density=0.3)
    D = sp.diags(10.0 ** r.uniform(-5, 5, 10))
    C = sp.diags(10.0 ** r.uniform(-4, 4, 15))
    m0._A = (D @ m0.matrix @ C).tocsc()
    m0.row_lower = np.where(m0.row_lower > -INF, m0.row_lower * D.diagonal(), m0.row_lower)
    m0.row_upper = np.where(m0.row_upper < INF, m0.row_upper * D.diagonal(), m0.row_upper)
    m0.col_lower = np.where(m0.col_lower > -INF, m0.col_lower / C.diagonal(), m0.col_lower)
    m0.col_upper = np.where(m0.col_upper < INF, m0.col_upper / C.diagonal(), m0.col_upper)
    m0.objective = m0.objective * C.diagonal()
    ref = _linprog(m0)
    for method in (SolveMethod.DUAL_SIMPLEX, SolveMethod.BARRIER_NO_CROSS):
        mm = m0.copy()
        sol = mm.initial_solve(SolveOptions(method=method))
        if ref.status == 0:
            assert sol.status == clp_tpu.ProblemStatus.OPTIMAL, (seed, method)
            obj_match = abs(sol.objective_value - ref.fun) < 1e-5 * (1 + abs(ref.fun))
            assert obj_match or check_kkt(mm).ok, (seed, method, sol.objective_value, ref.fun)


@pytest.mark.parametrize("trial", range(12))
def test_fuzz_gub_engine_spicy_bounds(trial):
    """GUB engine vs HiGHS under degenerate sets, fixed/free/duplicate
    members, one-sided and equality GUB rows (trimmed from a 120-trial
    battery run at zero failures)."""
    from clp_tpu.gub import solve_gub

    rng = np.random.default_rng(trial * 7 + 1)
    K, per = int(rng.integers(3, 12)), int(rng.integers(2, 7))
    mg = int(rng.integers(0, 6))
    n = K * per
    Agen = sp.random(mg, n, density=float(rng.uniform(0.1, 0.6)),
                     random_state=trial,
                     data_rvs=lambda s: rng.normal(size=s)).tocsr()
    gub = np.zeros((K, n))
    for k in range(K):
        gub[k, k * per:(k + 1) * per] = 1.0
    A = sp.vstack([Agen, sp.csr_matrix(gub)]).tocsc()
    cl = rng.choice([0.0, 0.0, 0.5, -1.0], n)
    cu = cl + rng.choice([0.0, 1.0, 2.0, INF], n, p=[0.1, 0.4, 0.4, 0.1])
    kind = rng.random(K)
    grl = np.where(kind < 0.3, rng.uniform(0.1, 1.0, K),
                   np.where(kind < 0.5, -INF, 0.1))
    gru = np.maximum(np.where(kind < 0.3, grl,
                              np.where(kind < 0.7, 1.5, INF)), grl)
    m = Model()
    m.load_problem(A, cl, cu, rng.normal(size=n),
                   np.concatenate([rng.normal(size=mg) - 2.0, grl]),
                   np.concatenate([rng.normal(size=mg) + 3.0, gru]))
    try:
        sol = solve_gub(m)
    except ValueError:
        return  # unverifiable-claim fallback contract
    ref = _linprog(m)
    if ref.status == 0:
        assert sol.status == clp_tpu.ProblemStatus.OPTIMAL, trial
        assert abs(sol.objective_value - ref.fun) < 1e-6 * (1 + abs(ref.fun))
    elif ref.status == 2:
        assert sol.status == clp_tpu.ProblemStatus.PRIMAL_INFEASIBLE
    elif ref.status == 3:
        assert sol.status == clp_tpu.ProblemStatus.DUAL_INFEASIBLE


@pytest.mark.parametrize("trial", range(10))
def test_fuzz_piecewise_engine_vs_reformulation(trial):
    """In-engine piecewise vs the exact reformulation under random kink
    counts incl. near-coincident kinks (trimmed from a 100-trial battery
    run at zero failures)."""
    from clp_tpu.piecewise import set_piecewise_linear_cost, solve_piecewise

    rng = np.random.default_rng(trial + 500)
    m_, n_ = int(rng.integers(2, 9)), int(rng.integers(4, 14))
    A = sp.random(m_, n_, density=float(rng.uniform(0.3, 0.8)),
                  random_state=trial,
                  data_rvs=lambda s: rng.normal(size=s)).tocsc()
    b = A @ (rng.random(n_) * 2)
    lo_val = float(rng.choice([0.0, -1.0, 0.3]))
    mdl = Model()
    mdl.load_problem(A, np.full(n_, lo_val), np.full(n_, 3.0),
                     rng.normal(size=n_), b - rng.random(m_),
                     b + rng.random(m_))
    pw = {}
    for j in rng.choice(n_, int(rng.integers(1, min(5, n_) + 1)),
                        replace=False):
        k = int(rng.integers(1, 7))
        if k == 1:
            bps, slopes = np.array([lo_val, 3.0]), rng.normal(size=1)
        else:
            inner = np.sort(rng.uniform(lo_val + 1e-3, 3.0 - 1e-3, k - 1))
            if rng.random() < 0.2 and k > 2:
                inner[1] = inner[0] + 1e-7  # near-coincident kinks
            bps = np.concatenate([[lo_val], inner, [3.0]])
            slopes = np.sort(rng.normal(size=k))
        pw[int(j)] = (bps, slopes)
    mref = mdl.copy()
    o = SolveOptions(method=SolveMethod.DUAL_SIMPLEX)
    o.presolve.enabled = False
    try:
        for j in pw:
            set_piecewise_linear_cost(mref, j, *pw[j])
        sref = mref.initial_solve(o)
    except ValueError:
        return
    sol = solve_piecewise(mdl, pw)
    assert sol.status == sref.status, trial
    if sref.status == clp_tpu.ProblemStatus.OPTIMAL:
        assert abs(sol.objective_value - sref.objective_value) < 1e-5 * (
            1 + abs(sref.objective_value)), trial
