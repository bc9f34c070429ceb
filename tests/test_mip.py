"""fathom (embedded B&B) vs scipy.optimize.milp."""

import numpy as np
import pytest
import scipy.sparse as sp

import clp_tpu
from clp_tpu import Model, INF, ProblemStatus
from clp_tpu.mip import fathom


def _milp_ref(model):
    from scipy.optimize import milp, LinearConstraint, Bounds

    c = model.objective * (model.optimization_direction or 1.0)
    A = model.matrix.toarray()
    rl = np.where(model.row_lower <= -INF, -np.inf, model.row_lower)
    ru = np.where(model.row_upper >= INF, np.inf, model.row_upper)
    cl = np.where(model.col_lower <= -INF, -np.inf, model.col_lower)
    cu = np.where(model.col_upper >= INF, np.inf, model.col_upper)
    res = milp(
        c,
        constraints=LinearConstraint(A, rl, ru),
        bounds=Bounds(cl, cu),
        integrality=model.integer_mask.astype(int),
    )
    return res


def test_knapsack():
    """0-1 knapsack: max v'x s.t. w'x <= C."""
    rng = np.random.default_rng(0)
    n = 10
    v = rng.uniform(1, 10, n)
    w = rng.uniform(1, 8, n)
    model = Model()
    model.load_problem(
        sp.csc_matrix(w.reshape(1, -1)),
        col_lower=np.zeros(n),
        col_upper=np.ones(n),
        objective=v,
        row_lower=[-INF],
        row_upper=[0.4 * w.sum()],
    )
    model.set_maximize()
    for j in range(n):
        model.set_integer(j)
    res = fathom(model, max_nodes=500)
    ref = _milp_ref(model)
    assert res.status == ProblemStatus.OPTIMAL
    assert ref.success
    assert abs(res.objective_value - (-ref.fun)) < 1e-6 * (1 + abs(ref.fun))


def test_small_integer_program():
    """min c'x with equality + ranges and general integers."""
    rng = np.random.default_rng(3)
    m, n = 4, 7
    A = rng.integers(0, 4, (m, n)).astype(float)
    x_feas = rng.integers(0, 3, n).astype(float)
    b = A @ x_feas
    model = Model()
    model.load_problem(
        sp.csc_matrix(A),
        col_lower=np.zeros(n),
        col_upper=np.full(n, 4.0),
        objective=rng.uniform(-2, 3, n),
        row_lower=b - 1.0,
        row_upper=b + 1.0,
    )
    for j in range(n):
        model.set_integer(j)
    res = fathom(model, max_nodes=2000)
    ref = _milp_ref(model)
    assert ref.success
    assert res.status == ProblemStatus.OPTIMAL
    assert abs(res.objective_value - ref.fun) < 1e-6 * (1 + abs(ref.fun))
    # integrality of the incumbent
    assert np.abs(res.primal - np.round(res.primal)).max() < 1e-6


def test_infeasible_mip():
    """x1 + x2 = 0.5 with both integer in [0, 1] — no integer point."""
    model = Model()
    model.load_problem(
        sp.csc_matrix(np.array([[1.0, 1.0]])),
        col_lower=[0, 0],
        col_upper=[1, 1],
        objective=[1.0, 1.0],
        row_lower=[0.5],
        row_upper=[0.5],
    )
    model.set_integer(0)
    model.set_integer(1)
    res = fathom(model, max_nodes=100)
    assert res.status == ProblemStatus.PRIMAL_INFEASIBLE
