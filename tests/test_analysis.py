"""Ranging / parametrics / dualize tests, verified by brute-force re-solves."""

import numpy as np
import pytest

import clp_tpu
from clp_tpu import Model, SolveOptions, SolveMethod, ProblemStatus, INF
from clp_tpu.analysis import ranging, parametrics, dualize, restore_from_dual
from clp_tpu.utils.generators import random_lp, transport_lp
from tests.test_mps import _linprog


def _solve_dual(model):
    o = SolveOptions(method=SolveMethod.DUAL_SIMPLEX)
    o.presolve.enabled = False
    return model.initial_solve(o)


def test_cost_ranging_brute_force():
    """Inside the reported cost range the optimal BASIS (objective slope)
    stays; outside it the objective deviates from the linear prediction."""
    model = random_lp(8, 12, seed=5)
    sol = _solve_dual(model)
    assert sol.status == ProblemStatus.OPTIMAL
    r = ranging(model)
    x = sol.primal
    for j in [0, 3, 7]:
        down, up = r.cost_down[j], r.cost_up[j]
        assert down <= model.objective[j] + 1e-9 <= up + 2e-9
        # perturb within the range: objective must change by exactly x_j*dc
        for target in [down, up]:
            if not np.isfinite(target):
                continue
            inner = 0.5 * (model.objective[j] + target)  # strictly inside
            m2 = model.copy()
            m2.objective = m2.objective.copy()
            dc = inner - model.objective[j]
            m2.objective[j] = inner
            s2 = _solve_dual(m2)
            assert s2.status == ProblemStatus.OPTIMAL
            predicted = sol.objective_value + dc * x[j]
            assert abs(s2.objective_value - predicted) < 1e-6 * (
                1 + abs(predicted)
            ), (j, target, dc)


def test_rhs_ranging_brute_force():
    model = random_lp(8, 12, seed=6)
    sol = _solve_dual(model)
    assert sol.status == ProblemStatus.OPTIMAL
    r = ranging(model)
    y = sol.duals
    for i in [0, 2, 5]:
        for target in [r.rhs_down[i], r.rhs_up[i]]:
            if not np.isfinite(target) or abs(target) < 1e-12:
                continue
            delta = 0.5 * target  # strictly inside the delta range
            m2 = model.copy()
            m2.row_lower = m2.row_lower.copy()
            m2.row_upper = m2.row_upper.copy()
            if m2.row_lower[i] > -INF:
                m2.row_lower[i] += delta
            if m2.row_upper[i] < INF:
                m2.row_upper[i] += delta
            s2 = _solve_dual(m2)
            assert s2.status == ProblemStatus.OPTIMAL
            predicted = sol.objective_value + delta * y[i]
            assert abs(s2.objective_value - predicted) < 1e-6 * (
                1 + abs(predicted)
            ), (i, target, delta)


def test_parametrics_objective_ray():
    model = random_lp(6, 10, seed=7)
    sol = _solve_dual(model)
    dc = np.zeros(model.num_cols)
    dc[0] = 1.0
    pts = parametrics(model, theta_end=2.0, dc=dc)
    assert pts[0][0] == 0.0 and pts[-1][0] == 2.0
    # objective is concave piecewise-linear in theta for a min problem
    thetas = [p[0] for p in pts]
    assert thetas == sorted(thetas)
    # endpoint value matches a direct solve
    m2 = model.copy()
    m2.objective = m2.objective + 2.0 * dc
    s2 = _solve_dual(m2)
    assert abs(pts[-1][1] - s2.objective_value) < 1e-7 * (1 + abs(s2.objective_value))


def test_dualize_matches_primal():
    model = transport_lp(3, 4, seed=3)
    ref = _linprog(model)
    dual, mapping = dualize(model)
    _solve_dual(dual)
    assert dual.solution.status == ProblemStatus.OPTIMAL
    # strong duality: dual's optimal value (negated max) == primal optimum
    assert abs(-dual.solution.objective_value - ref.fun) < 1e-6 * (1 + abs(ref.fun))
    restore_from_dual(model, dual, mapping)
    assert model.solution.status == ProblemStatus.OPTIMAL
    assert abs(model.solution.objective_value - ref.fun) < 1e-6 * (1 + abs(ref.fun))
    from clp_tpu import check_kkt

    rep = check_kkt(model)
    assert rep.ok, str(rep)


def test_find_iis_known_conflict():
    """find_iis: deletion filter over batched dual-simplex trials."""
    import scipy.sparse as sp
    from clp_tpu.analysis import find_iis

    A = sp.csc_matrix(np.array([
        [1.0, 1.0, 0.0],   # x1 + x2 >= 4 (conflicts with the two caps)
        [1.0, 0.0, 0.0],   # x1 <= 1
        [0.0, 1.0, 0.0],   # x2 <= 1
        [0.0, 0.0, 1.0],   # innocent
        [1.0, 0.0, 1.0],   # innocent
    ]))
    m = Model()
    m.load_problem(A, col_lower=[0, 0, 0], col_upper=[INF] * 3,
                   objective=[1.0] * 3,
                   row_lower=[4.0, -INF, -INF, -INF, -INF],
                   row_upper=[INF, 1.0, 1.0, 10.0, 20.0])
    assert find_iis(m) == [0, 1, 2]
    assert find_iis(m, batch=False) == [0, 1, 2]


def test_find_iis_irreducible_property():
    """Every returned row is necessary: freeing any one restores feasibility."""
    from clp_tpu.analysis import find_iis
    from clp_tpu.utils.generators import infeasible_lp
    from clp_tpu.options import SolveOptions
    from clp_tpu.constants import SolveMethod

    m = infeasible_lp()
    iis = find_iis(m)
    assert iis, "empty IIS for an infeasible model"
    opts = SolveOptions(method=SolveMethod.DUAL_SIMPLEX)
    opts.presolve.enabled = False
    all_rows = set(range(m.num_rows))
    for r in iis:
        t = m.copy()
        t.row_lower = t.row_lower.copy(); t.row_upper = t.row_upper.copy()
        for q in (all_rows - set(iis)) | {r}:
            t.row_lower[q] = -INF; t.row_upper[q] = INF
        assert t.initial_solve(opts).status == ProblemStatus.OPTIMAL, r

    # feasible model raises
    from clp_tpu.utils.generators import random_lp
    with pytest.raises(ValueError):
        find_iis(random_lp(6, 10, seed=1))


# --- pivot-level parametrics (nextTheta, ClpSimplexOther.cpp:5148) ---


def _brute_theta(model, theta, dc=None, drl=None, dru=None, dcl=None, dcu=None):
    m2 = model.copy()
    if dc is not None:
        m2.objective = m2.objective + theta * np.asarray(dc)
    if drl is not None:
        m2.row_lower = np.where(m2.row_lower > -INF,
                                m2.row_lower + theta * np.asarray(drl),
                                m2.row_lower)
    if dru is not None:
        m2.row_upper = np.where(m2.row_upper < INF,
                                m2.row_upper + theta * np.asarray(dru),
                                m2.row_upper)
    if dcl is not None:
        m2.col_lower = np.where(m2.col_lower > -INF,
                                m2.col_lower + theta * np.asarray(dcl),
                                m2.col_lower)
    if dcu is not None:
        m2.col_upper = np.where(m2.col_upper < INF,
                                m2.col_upper + theta * np.asarray(dcu),
                                m2.col_upper)
    return _solve_dual(m2)


@pytest.mark.parametrize("seed", [0, 3, 8])
@pytest.mark.parametrize("mode", ["cost", "rhs", "colbounds"])
def test_parametrics_exact_breakpoints(seed, mode):
    """Every reported breakpoint objective matches a fresh solve, midpoints
    interpolate linearly (proving the list is exact and complete), and the
    work is O(#basis changes) pivots — no re-solves."""
    from clp_tpu.analysis import parametrics_exact

    model = random_lp(8, 14, seed=seed)
    sol = _solve_dual(model)
    assert sol.status == ProblemStatus.OPTIMAL
    rng = np.random.default_rng(seed + 99)
    dc = drl = dru = dcl = dcu = None
    if mode == "cost":
        dc = rng.normal(size=model.num_cols)
    elif mode == "rhs":
        drl = dru = rng.normal(size=model.num_rows) * 0.3
    else:
        dcu = np.full(model.num_cols, -0.05)  # tighten uppers
    res = parametrics_exact(model, 2.0, dc=dc, d_row_lower=drl,
                            d_row_upper=dru, d_col_lower=dcl, d_col_upper=dcu)
    assert res.thetas[0] == 0.0
    assert res.thetas == sorted(res.thetas)
    assert len(res.thetas) <= res.pivots + 2  # breakpoints come from pivots
    check = list(res.thetas)
    for i in range(len(res.thetas) - 1):  # midpoints: linearity between bps
        check.append(0.5 * (res.thetas[i] + res.thetas[i + 1]))
    for t in check:
        if t > res.theta_reached + 1e-12:
            continue
        s2 = _brute_theta(model, t, dc, drl, dru, dcl, dcu)
        if s2.status != ProblemStatus.OPTIMAL:
            continue
        ours = np.interp(t, res.thetas, res.objectives)
        assert abs(ours - s2.objective_value) < 1e-6 * (
            1 + abs(s2.objective_value)), (mode, t)


def test_parametrics_exact_infeasible_wall():
    import scipy.sparse as sp
    from clp_tpu.analysis import parametrics_exact

    m = Model()
    m.load_problem(sp.csc_matrix(np.array([[1.0, 1.0]])), np.zeros(2),
                   np.full(2, 10.0), np.array([1.0, 2.0]),
                   np.array([-INF]), np.array([1.0]))
    _solve_dual(m)
    res = parametrics_exact(m, 2.0, d_col_lower=np.array([1.0, 1.0]))
    # x1 + x2 <= 1 with both lower bounds at theta: infeasible past 0.5
    assert res.status == ProblemStatus.PRIMAL_INFEASIBLE
    assert abs(res.theta_reached - 0.5) < 1e-9


def test_parametrics_exact_unbounded_wall():
    import scipy.sparse as sp
    from clp_tpu.analysis import parametrics_exact

    m = Model()
    m.load_problem(sp.csc_matrix(np.array([[1.0]])), np.zeros(1),
                   np.array([INF]), np.array([1.0]),
                   np.array([-INF]), np.array([INF]))
    _solve_dual(m)
    res = parametrics_exact(m, 2.0, dc=np.array([-2.0]))
    # cost 1 - 2*theta goes negative at theta=0.5: unbounded beyond
    assert res.status == ProblemStatus.DUAL_INFEASIBLE
    assert abs(res.theta_reached - 0.5) < 1e-9


def test_parametrics_public_api_uses_exact_walker():
    """The public parametrics() now returns the exact breakpoint list."""
    model = random_lp(6, 10, seed=7)
    _solve_dual(model)
    dc = np.zeros(model.num_cols)
    dc[0] = 1.0
    pts = parametrics(model, theta_end=2.0, dc=dc)
    # each interior point is a true breakpoint: slope changes across it
    for i in range(1, len(pts) - 1):
        t0, o0 = pts[i - 1]
        t1, o1 = pts[i]
        t2, o2 = pts[i + 1]
        if t1 - t0 < 1e-9 or t2 - t1 < 1e-9:
            continue
        s_left = (o1 - o0) / (t1 - t0)
        s_right = (o2 - o1) / (t2 - t1)
        assert abs(s_left - s_right) > 1e-10, "interior point is not a kink"
