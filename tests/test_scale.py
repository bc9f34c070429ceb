"""Netlib-scale structure at tight tolerance (staircase LP)."""

import numpy as np
import pytest
import scipy.sparse as sp

import clp_tpu
from clp_tpu import Model, SolveOptions, SolveMethod, ProblemStatus, check_kkt
from tests.test_mps import _linprog


from clp_tpu.utils.generators import staircase_lp  # noqa: E402


def test_mixed_precision_1024_production_config():
    """The production TPU configuration (f32 inverse + Pallas PRICE, here in
    interpret mode) at the scale where the driver defaults to it (m >= 512,
    driver.py inverse_dtype auto) — exercised IN the suite, not only on the
    tunnel. ~65 s on 2 CPUs; the KKT check is the oracle."""
    from clp_tpu.simplex.driver import simplex_solve

    model = staircase_lp(nblocks=32, bm=32, bn=56, seed=1)
    assert model.num_rows == 1024
    opts = SolveOptions(method=SolveMethod.DUAL_SIMPLEX)
    opts.inverse_dtype = "float32"
    opts.use_pallas_price = True
    sol = simplex_solve(model, opts, dual=True)
    assert sol.status == ProblemStatus.OPTIMAL
    rep = check_kkt(model, x=sol.primal, y=sol.duals, tol=1e-6)
    assert rep.ok, str(rep)


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


def test_banded_normal_equations_barrier():
    """RCM band plan engages on staircase structure and the block-tridiag
    Cholesky path matches the dense barrier and the simplex to 1e-9."""
    from clp_tpu.forms import to_ipm_form
    from clp_tpu.solve import _rcm_band_plan

    m = staircase_lp(nblocks=12, bm=24, bn=36, seed=3)  # 288 x 432
    lp, _ = to_ipm_form(m.copy())
    perm, nb = _rcm_band_plan(np.asarray(lp.G))
    assert perm is not None and nb >= 64  # plan engages

    o = SolveOptions(method=SolveMethod.BARRIER)
    o.presolve.enabled = False
    mb = m.copy()
    s_band = mb.initial_solve(o)
    o2 = SolveOptions(method=SolveMethod.DUAL_SIMPLEX)
    o2.presolve.enabled = False
    s_dual = m.copy().initial_solve(o2)
    assert s_band.status == ProblemStatus.OPTIMAL
    assert abs(s_band.objective_value - s_dual.objective_value) < 1e-8 * (
        1 + abs(s_dual.objective_value)
    )
    assert check_kkt(mb).ok


def test_band_plan_skips_unstructured():
    """Dense random LPs must NOT take the banded path (band too wide)."""
    from clp_tpu.forms import to_ipm_form
    from clp_tpu.solve import _rcm_band_plan
    from clp_tpu.utils.generators import random_lp

    m = random_lp(256, 400, seed=0, density=0.3)
    lp, _ = to_ipm_form(m)
    perm, nb = _rcm_band_plan(np.asarray(lp.G))
    assert perm is None and nb == 0


def test_block_tridiag_kernels_match_dense():
    """block_tridiag_cholesky/solve agree with a dense solve to 1e-12."""
    import jax.numpy as jnp
    from clp_tpu.ops.linalg import block_tridiag_cholesky, block_tridiag_solve

    rng = np.random.default_rng(0)
    k, nb = 5, 12
    m = k * nb
    R = rng.standard_normal((m, m))
    M = R @ R.T + 5 * m * np.eye(m)
    for i in range(k):
        for j in range(k):
            if abs(i - j) > 1:
                M[i*nb:(i+1)*nb, j*nb:(j+1)*nb] = 0.0
    M = 0.5 * (M + M.T) + 5 * m * np.eye(m)
    A = np.stack([M[i*nb:(i+1)*nb, i*nb:(i+1)*nb] for i in range(k)])
    E = np.stack([M[(i+1)*nb:(i+2)*nb, i*nb:(i+1)*nb] for i in range(k-1)])
    L, C, _ = block_tridiag_cholesky(jnp.asarray(A), jnp.asarray(E))
    b = rng.standard_normal(m)
    x = np.asarray(block_tridiag_solve(L, C, jnp.asarray(b.reshape(k, nb)))).ravel()
    ref = np.linalg.solve(M, b)
    assert np.abs(x - ref).max() < 1e-12 * (1 + np.abs(ref).max())


def test_separable_qp_banded_barrier():
    """Diagonal-Q QP takes the LP Newton branches (q_diag) incl. the
    banded plan on staircase structure; result matches the dense QP
    barrier path run without the plan."""
    import scipy.sparse as sp

    m = staircase_lp(nblocks=12, bm=24, bn=36, seed=4)
    nv = m.num_cols
    rng = np.random.default_rng(0)
    m.load_quadratic_objective(sp.diags(rng.uniform(0.1, 2.0, nv)).tocsc())

    o = SolveOptions(method=SolveMethod.BARRIER, crossover=False)
    o.presolve.enabled = False
    m_band = m.copy()
    s_band = m_band.initial_solve(o)
    assert s_band.status == ProblemStatus.OPTIMAL

    # dense reference: force the generic QP path by disabling the plan
    from clp_tpu import solve as _solve

    orig = _solve._rcm_band_plan
    _solve._rcm_band_plan = lambda G: (None, 0)
    try:
        s_dense = m.copy().initial_solve(o)
    finally:
        _solve._rcm_band_plan = orig
    assert s_dense.status == ProblemStatus.OPTIMAL
    assert abs(s_band.objective_value - s_dense.objective_value) < 1e-6 * (
        1 + abs(s_dense.objective_value)
    )


def test_batched_ipm_shared_band_plan():
    """Scenario batch over ONE staircase structure: a single RCM plan is
    computed on the union pattern and the vmapped numeric phase runs
    block-tridiagonal; objectives match per-instance dense solves."""
    from clp_tpu.parallel.batch import solve_batch_ipm

    base = staircase_lp(nblocks=10, bm=22, bn=33, seed=5)
    rng = np.random.default_rng(1)
    models = []
    for _ in range(4):
        mod = base.copy()
        shift = np.abs(rng.uniform(0, 0.02, mod.num_rows))
        mod.row_lower = np.where(
            mod.row_lower > -1e29, mod.row_lower - shift, mod.row_lower
        )
        mod.row_upper = np.where(
            mod.row_upper < 1e29, mod.row_upper + shift, mod.row_upper
        )
        models.append(mod)
    o = SolveOptions(crossover=False)
    o.presolve.enabled = False
    sols = solve_batch_ipm(models, o)
    for mod, sol in zip(models, sols):
        assert sol.status == ProblemStatus.OPTIMAL
        ref = mod.copy().initial_solve(
            SolveOptions(method=SolveMethod.DUAL_SIMPLEX)
        )
        assert abs(sol.objective_value - ref.objective_value) < 1e-6 * (
            1 + abs(ref.objective_value)
        )
        assert check_kkt(mod).ok


def gub_block_lp(nsets=96, set_size=8, m_extra=160, seed=0):
    """GUB-structured LP: convexity row per set + dense coupling rows
    (the reference's testGub problem shape at ~1k rows)."""
    rng = np.random.default_rng(seed)
    n = nsets * set_size
    rows, cols, vals = [], [], []
    for k in range(nsets):  # GUB rows: sum of each set == 1
        for t in range(set_size):
            rows.append(k); cols.append(k * set_size + t); vals.append(1.0)
    C = sp.random(m_extra, n, density=0.03, random_state=rng,
                  data_rvs=rng.standard_normal).tocoo()
    rows += list(nsets + C.row); cols += list(C.col); vals += list(C.data)
    A = sp.coo_matrix((vals, (rows, cols)), shape=(nsets + m_extra, n)).tocsc()
    x = np.zeros(n)
    for k in range(nsets):  # interior point of each simplex
        x[k * set_size: (k + 1) * set_size] = 1.0 / set_size
    cx = (A @ x)[nsets:]
    slack = rng.uniform(0.5, 2.0, m_extra)
    model = Model()
    model.load_problem(
        A, np.zeros(n), np.ones(n), rng.standard_normal(n),
        np.concatenate([np.ones(nsets), cx - slack]),
        np.concatenate([np.ones(nsets), cx + slack]),
    )
    return model


def degenerate_transport_lp(ns=256, nd=256, arcs_per=8, seed=0):
    """Sparse transportation with INTEGRAL supplies/demands — massive
    primal degeneracy (many basic variables at zero)."""
    rng = np.random.default_rng(seed)
    supply = rng.integers(2, 10, ns).astype(float)
    total = supply.sum()
    demand = np.zeros(nd)
    # integral demands summing to the supply total
    for _ in range(int(total)):
        demand[rng.integers(nd)] += 1.0
    ai, aj, av, cost = [], [], [], []
    v = 0
    for i in range(ns):
        sinks = rng.choice(nd, size=arcs_per, replace=False)
        for j in sinks:
            ai += [i, ns + j]; aj += [v, v]; av += [1.0, 1.0]
            cost.append(float(rng.integers(1, 10)))  # integer costs: ties
            v += 1
    # guarantee feasibility: one high-cost backstop arc per sink from a
    # virtual depot column attached to every source row is overkill; use
    # a dense final source instead
    for j in range(nd):
        ai += [ns - 1, ns + j]; aj += [v, v]; av += [1.0, 1.0]
        cost.append(50.0)
        v += 1
    supply[ns - 1] += demand.sum()  # the backstop can cover everything
    A = sp.coo_matrix((av, (ai, aj)), shape=(ns + nd, v)).tocsc()
    model = Model()
    model.load_problem(
        A, np.zeros(v), np.full(v, 1e30), np.asarray(cost),
        np.concatenate([-np.full(ns, 1e30), demand]),
        np.concatenate([supply, demand]),
    )
    return model


@pytest.mark.parametrize("method", [SolveMethod.DUAL_SIMPLEX, SolveMethod.PRIMAL_SIMPLEX])
def test_gub_block_tight_tolerance(method):
    model = gub_block_lp()
    ref = _linprog(model)
    assert ref.status == 0
    sol = model.initial_solve(SolveOptions(method=method))
    assert sol.status == ProblemStatus.OPTIMAL
    rel = abs(sol.objective_value - ref.fun) / (1 + abs(ref.fun))
    assert rel < 1e-8, rel
    assert check_kkt(model).ok


def test_degenerate_transport_tight_tolerance():
    model = degenerate_transport_lp()
    ref = _linprog(model)
    assert ref.status == 0
    sol = model.initial_solve(SolveOptions(method=SolveMethod.DUAL_SIMPLEX))
    assert sol.status == ProblemStatus.OPTIMAL
    rel = abs(sol.objective_value - ref.fun) / (1 + abs(ref.fun))
    assert rel < 1e-8, rel
    assert check_kkt(model).ok


def test_gub_dominated_tight_tolerance():
    """Netlib-scale proxy through the AUTOMATIC -> GUB route: a 660-row
    600-set GUB LP solved by the key-variable engine to 1e-8 KKT, HiGHS
    objective agreement at 7e-13 (measured)."""
    import scipy.sparse as sp
    from scipy.optimize import linprog

    from clp_tpu import INF
    from clp_tpu.solve import _auto_method

    rng = np.random.default_rng(11)
    K, per, mg = 600, 6, 60
    n = K * per
    Agen = sp.random(mg, n, density=0.05, random_state=11,
                     data_rvs=lambda s: rng.normal(size=s)).tocsr()
    gub = sp.csr_matrix((np.ones(n), (np.repeat(np.arange(K), per),
                                      np.arange(n))), shape=(K, n))
    A = sp.vstack([Agen, gub]).tocsc()
    model = Model()
    model.load_problem(
        A, np.zeros(n), np.full(n, 1.5), rng.normal(size=n),
        np.concatenate([rng.normal(size=mg) - 2, np.full(K, 0.25)]),
        np.concatenate([rng.normal(size=mg) + 4, np.ones(K)]))
    assert _auto_method(model, SolveOptions()) == SolveMethod.GUB
    sol = model.initial_solve()
    assert sol.status == ProblemStatus.OPTIMAL
    assert check_kkt(model, tol=1e-8).ok
    Ar = model.matrix.tocsr()
    rl = np.where(model.row_lower <= -INF, -np.inf, model.row_lower)
    ru = np.where(model.row_upper >= INF, np.inf, model.row_upper)
    ub, lb = np.isfinite(ru), np.isfinite(rl)
    r = linprog(model.objective, A_ub=sp.vstack([Ar[ub], -Ar[lb]]),
                b_ub=np.concatenate([ru[ub], -rl[lb]]),
                bounds=list(zip(model.col_lower, model.col_upper)),
                method="highs")
    assert r.status == 0
    assert abs(sol.objective_value - r.fun) < 1e-8 * (1 + abs(r.fun))
