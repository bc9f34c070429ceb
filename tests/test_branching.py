"""Hot starts and batched strong branching."""

import numpy as np
import pytest
import scipy.sparse as sp

import clp_tpu
from clp_tpu import Model, SolveOptions, SolveMethod, ProblemStatus, INF
from clp_tpu.branching import mark_hot_start, solve_from_hot_start, strong_branch
from tests.test_mps import _linprog


def _knapsack_relax():
    """max 5a+4b+3c s.t. 2a+3b+c<=5, 4a+b+2c<=11, 3a+4b+2c<=8, 0<=x<=1."""
    model = Model()
    model.load_problem(
        sp.csc_matrix(np.array([[2.0, 3, 1], [4, 1, 2], [3, 4, 2]])),
        col_lower=[0, 0, 0],
        col_upper=[1, 1, 1],
        objective=[5.0, 4.0, 3.0],
        row_lower=[-INF] * 3,
        row_upper=[5.0, 11.0, 8.0],
    )
    model.set_maximize()
    return model


def _solve(model):
    o = SolveOptions(method=SolveMethod.DUAL_SIMPLEX)
    o.presolve.enabled = False
    return model.initial_solve(o)


def test_hot_start_bound_change():
    model = _knapsack_relax()
    sol = _solve(model)
    assert sol.status == ProblemStatus.OPTIMAL
    hot = mark_hot_start(model)
    # force x0 <= 0 and compare against a direct solve
    s2 = solve_from_hot_start(model, hot, 0, new_upper=0.0)
    m3 = _knapsack_relax()
    m3.col_upper[0] = 0.0
    ref = _linprog(m3)
    assert s2.status == ProblemStatus.OPTIMAL
    assert abs(s2.objective_value - (-ref.fun)) < 1e-8 * (1 + abs(ref.fun))
    # model bounds restored
    assert model.col_upper[0] == 1.0


def test_strong_branch_batched():
    model = _knapsack_relax()
    sol = _solve(model)
    frac = [j for j in range(3) if 1e-6 < sol.primal[j] < 1 - 1e-6]
    if not frac:
        frac = [0]
    results = strong_branch(model, frac)
    assert len(results) == 2 * len(frac)
    for r in results:
        # verify against direct solves
        m2 = _knapsack_relax()
        v = sol.primal[r.column]
        if r.direction == "down":
            m2.col_upper[r.column] = np.floor(v)
        else:
            m2.col_lower[r.column] = np.ceil(v)
        ref = _linprog(m2)
        if r.status == ProblemStatus.OPTIMAL:
            assert ref.status == 0
            assert abs(r.objective - (-ref.fun)) < 1e-7 * (1 + abs(ref.fun))
        elif r.status == ProblemStatus.PRIMAL_INFEASIBLE:
            assert ref.status == 2


def test_crunch_resolve():
    """Crunch after a bound change matches a full re-solve."""
    from clp_tpu.branching import crunch_solve
    from clp_tpu.utils.generators import random_lp
    from tests.test_mps import _linprog

    model = random_lp(30, 45, seed=9)
    sol = _solve(model)
    assert sol.status == ProblemStatus.OPTIMAL
    # change a bound and crunch-resolve
    m2 = model.copy()
    m2.col_upper = m2.col_upper.copy()
    m2.col_upper[0] = max(m2.col_lower[0], sol.primal[0] * 0.5)
    s2 = crunch_solve(m2, sol)
    ref = _linprog(m2)
    assert s2.status == ProblemStatus.OPTIMAL
    assert abs(s2.objective_value - ref.fun) < 1e-6 * (1 + abs(ref.fun))
    from clp_tpu import check_kkt

    assert check_kkt(m2, x=s2.primal, y=s2.duals).ok
