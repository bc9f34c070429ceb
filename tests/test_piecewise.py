"""Piecewise-linear convex cost reformulation tests."""

import numpy as np
import scipy.sparse as sp

import clp_tpu
from clp_tpu import Model, INF, ProblemStatus, SolveOptions, SolveMethod
from clp_tpu.piecewise import set_piecewise_linear_cost, recover_piecewise_value


def test_pwl_cost_increasing_marginal():
    """min pwl(x) - y  s.t. x >= y, 0 <= y <= 5, pwl with rising slopes.

    pwl pieces on x in [0,5]: slope 1 on [0,2], 3 on [2,4], 10 on [4,5].
    Optimum: marginal gain of y is 1, so push y while marginal cost < 1...
    objective: pwl(x) - 2y with x >= y: y should stop where slope exceeds 2
    => x = y = 2; obj = 2*1 - 2*2 = -2.
    """
    model = Model()
    # rows: x - y >= 0
    model.load_problem(
        sp.csc_matrix(np.array([[1.0, -1.0]])),
        col_lower=[0.0, 0.0],
        col_upper=[5.0, 5.0],
        objective=[0.0, -2.0],
        row_lower=[0.0],
        row_upper=[INF],
    )
    info = set_piecewise_linear_cost(model, 0, [0.0, 2.0, 4.0, 5.0], [1.0, 3.0, 10.0])
    o = SolveOptions(method=SolveMethod.DUAL_SIMPLEX)
    o.presolve.enabled = False
    sol = model.initial_solve(o)
    assert sol.status == ProblemStatus.OPTIMAL
    x_val = recover_piecewise_value(model, info)
    assert abs(x_val - 2.0) < 1e-7
    assert abs(sol.objective_value - (-2.0)) < 1e-7


def test_pwl_matches_manual_formulation():
    rng = np.random.default_rng(7)
    m, n = 5, 6
    A = rng.uniform(0, 1, (m, n))
    model = Model()
    model.load_problem(
        sp.csc_matrix(A),
        col_lower=np.zeros(n),
        col_upper=np.full(n, 4.0),
        objective=rng.uniform(-2, -1, n),
        row_lower=np.full(m, -INF),
        row_upper=rng.uniform(3, 6, m),
    )
    manual = model.copy()
    info = set_piecewise_linear_cost(model, 2, [0.0, 1.0, 4.0], [-3.0, 0.5])
    # manual: two explicit columns with the same matrix column
    col = manual.matrix[:, 2]
    manual.col_upper = manual.col_upper.copy()
    manual.col_upper[2] = 1.0
    manual.objective = manual.objective.copy()
    manual.objective[2] = -3.0
    manual.add_columns(col, lower=[0.0], upper=[3.0], objective=[0.5])

    o = SolveOptions(method=SolveMethod.DUAL_SIMPLEX)
    o.presolve.enabled = False
    s1 = model.initial_solve(o)
    s2 = manual.initial_solve(o)
    assert s1.status == s2.status == ProblemStatus.OPTIMAL
    assert abs(s1.objective_value - s2.objective_value) < 1e-8 * (
        1 + abs(s2.objective_value)
    )


# --- in-engine piecewise costs (ClpNonLinearCost, no column expansion) ---


def _rand_lp(m, n, seed, lo=0.0):
    rng = np.random.default_rng(seed)
    A = sp.random(m, n, density=0.5, random_state=rng.integers(1 << 30),
                  data_rvs=lambda s: rng.normal(size=s)).tocsc()
    mm = Model()
    x0 = rng.random(n) * 2
    b = A @ x0
    mm.load_problem(A, np.full(n, lo), np.full(n, 3.0), rng.normal(size=n),
                    b - rng.random(m), b + rng.random(m))
    return mm, rng


import pytest


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("sense,lo", [(1.0, 0.0), (-1.0, 0.0), (1.0, 0.4)])
def test_inengine_matches_reformulation(seed, sense, lo):
    """solve_piecewise (zero extra columns) == segment reformulation,
    across min/max senses and phase-1-requiring bounds."""
    from clp_tpu.piecewise import solve_piecewise

    m, rng = _rand_lp(7, 12, seed, lo=lo)
    m.optimization_direction = sense
    pw = {}
    for j in rng.choice(12, 4, replace=False):
        k = int(rng.integers(2, 9))
        bps = np.concatenate([[lo], np.sort(rng.uniform(lo + 0.1, 2.9, k - 1)),
                              [3.0]])
        pw[int(j)] = (bps, np.sort(rng.normal(size=k)) * sense)
    m_ref = m.copy()
    for j in pw:
        set_piecewise_linear_cost(m_ref, j, *pw[j])
    assert m.num_cols == 12  # the whole point: no columns added
    o = SolveOptions(method=SolveMethod.DUAL_SIMPLEX)
    o.presolve.enabled = False
    sref = m_ref.initial_solve(o)
    sol = solve_piecewise(m, pw)
    assert sol.status == sref.status
    if sref.status == ProblemStatus.OPTIMAL:
        assert abs(sol.objective_value - sref.objective_value) < 1e-6 * (
            1 + abs(sref.objective_value))


def test_inengine_rests_at_kink():
    """Optimum exactly at a cost kink: subgradient optimality
    slope_left <= y'a <= slope_right (ClpNonLinearCost state model)."""
    from clp_tpu.piecewise import solve_piecewise

    m = Model()
    m.load_problem(sp.csc_matrix(np.array([[1.0]])), np.array([0.0]),
                   np.array([10.0]), np.array([0.0]),
                   np.array([-INF]), np.array([INF]))
    sol = solve_piecewise(m, {0: ([0.0, 4.0, 10.0], [-2.0, 3.0])})
    assert sol.status == ProblemStatus.OPTIMAL
    assert abs(sol.primal[0] - 4.0) < 1e-8
    assert abs(sol.objective_value - (-8.0)) < 1e-8


def test_inengine_unbounded_last_piece():
    from clp_tpu.piecewise import solve_piecewise

    m = Model()
    m.load_problem(sp.csc_matrix(np.eye(2)), np.zeros(2),
                   np.array([INF, 2.0]), np.array([0.0, 1.0]),
                   np.full(2, -INF), np.array([INF, 2.0]))
    sol = solve_piecewise(m, {0: ([0.0, 1.0, np.inf], [-1.0, -0.5])})
    assert sol.status == ProblemStatus.DUAL_INFEASIBLE
    assert sol.unbounded_ray is not None


def test_inengine_infinite_domain_finite_optimum():
    from clp_tpu.piecewise import solve_piecewise

    m = Model()
    m.load_problem(sp.csc_matrix(np.array([[1.0]])), np.array([0.0]),
                   np.array([INF]), np.array([0.0]),
                   np.array([-INF]), np.array([INF]))
    sol = solve_piecewise(m, {0: ([0.0, 2.0, np.inf], [-1.5, 0.25])})
    assert sol.status == ProblemStatus.OPTIMAL
    assert abs(sol.primal[0] - 2.0) < 1e-8


def test_inengine_rejects_breakpoint_bound_mismatch():
    """The first breakpoint must equal the column lower bound — silently
    relaxing a tighter model bound would violate the stated domain
    (review regression; same contract as the reformulation)."""
    from clp_tpu.piecewise import solve_piecewise

    m = Model()
    m.load_problem(sp.csc_matrix(np.array([[1.0]])), np.array([2.0]),
                   np.array([10.0]), np.array([0.0]),
                   np.array([-INF]), np.array([INF]))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="lower"):
        solve_piecewise(m, {0: ([0.0, 4.0, 10.0], [-2.0, 3.0])})


def test_model_level_piecewise_attachment():
    """Model.set_piecewise_cost + initial_solve routing (ClpNonLinearCost
    attached to the model, consumed by the in-engine path)."""
    m = Model()
    m.load_problem(sp.csc_matrix(np.array([[1.0, 1.0]])), np.zeros(2),
                   np.full(2, 10.0), np.array([0.0, 1.0]),
                   np.array([-INF]), np.array([6.0]))
    m.set_piecewise_cost(0, [0.0, 4.0, 10.0], [-2.0, 3.0])
    sol = m.initial_solve()
    assert sol.status == ProblemStatus.OPTIMAL
    assert abs(sol.primal[0] - 4.0) < 1e-8
    # reformulation agreement
    m2 = Model()
    m2.load_problem(sp.csc_matrix(np.array([[1.0, 1.0]])), np.zeros(2),
                    np.full(2, 10.0), np.array([0.0, 1.0]),
                    np.array([-INF]), np.array([6.0]))
    set_piecewise_linear_cost(m2, 0, [0.0, 4.0, 10.0], [-2.0, 3.0])
    o = SolveOptions(method=SolveMethod.DUAL_SIMPLEX)
    o.presolve.enabled = False
    s2 = m2.initial_solve(o)
    assert abs(sol.objective_value - s2.objective_value) < 1e-8 * (
        1 + abs(s2.objective_value))
