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
