"""Presolve/postsolve round-trip tests: solve with presolve on == off."""

import numpy as np
import pytest
import scipy.sparse as sp

import clp_tpu
from clp_tpu import (
    Model,
    SolveOptions,
    SolveMethod,
    check_kkt,
    INF,
    ProblemStatus,
)
from clp_tpu.utils.generators import random_lp
from tests.test_mps import _linprog


def _with_fixed_and_singletons(seed=0):
    """Random LP plus fixed columns, singleton rows, and an empty row."""
    model = random_lp(8, 12, seed=seed)
    A = model.matrix.tolil()
    m, n = A.shape
    # fixed column
    model.col_lower[3] = model.col_upper[3] = 0.7
    # singleton row constraining column 5
    srow = np.zeros((1, n))
    srow[0, 5] = 2.0
    model.add_rows(sp.csc_matrix(srow), lower=[-INF], upper=[4.0])
    # empty row (feasible)
    model.add_rows(sp.csc_matrix((1, n)), lower=[-1.0], upper=[1.0])
    return model


@pytest.mark.parametrize("method", [SolveMethod.DUAL_SIMPLEX, SolveMethod.BARRIER_NO_CROSS])
@pytest.mark.parametrize("seed", [0, 1])
def test_presolve_matches_no_presolve(method, seed):
    m1 = _with_fixed_and_singletons(seed)
    m2 = m1.copy()

    opts_on = SolveOptions(method=method)
    opts_off = SolveOptions(method=method)
    opts_off.presolve.enabled = False

    s1 = m1.initial_solve(opts_on)
    s2 = m2.initial_solve(opts_off)
    assert s1.status == ProblemStatus.OPTIMAL
    assert s2.status == ProblemStatus.OPTIMAL
    assert abs(s1.objective_value - s2.objective_value) < 1e-6 * (
        1 + abs(s2.objective_value)
    )
    rep = check_kkt(m1)
    assert rep.ok, str(rep)
    # dimensions restored
    assert s1.primal.shape == (m1.num_cols,)
    assert s1.duals.shape == (m1.num_rows,)


def test_presolve_detects_infeasible_bounds():
    model = random_lp(5, 8, seed=2)
    model.col_lower[0] = 2.0
    model.col_upper[0] = 1.0
    sol = model.initial_solve(SolveOptions(method=SolveMethod.DUAL_SIMPLEX))
    assert sol.status == ProblemStatus.PRIMAL_INFEASIBLE


def test_presolve_detects_infeasible_empty_row():
    model = random_lp(5, 8, seed=3)
    model.add_rows(sp.csc_matrix((1, model.num_cols)), lower=[1.0], upper=[2.0])
    sol = model.initial_solve(SolveOptions(method=SolveMethod.DUAL_SIMPLEX))
    assert sol.status == ProblemStatus.PRIMAL_INFEASIBLE


def test_presolve_shrinks():
    from clp_tpu.presolve import presolve
    from clp_tpu.options import PresolveOptions

    model = _with_fixed_and_singletons(1)
    reduced, info = presolve(model, PresolveOptions())
    assert reduced.num_cols < model.num_cols
    assert reduced.num_rows < model.num_rows


def test_postsolve_duals_consistent():
    model = _with_fixed_and_singletons(4)
    ref = _linprog(model)
    sol = model.initial_solve(SolveOptions(method=SolveMethod.DUAL_SIMPLEX))
    assert sol.status == ProblemStatus.OPTIMAL
    assert abs(sol.objective_value - ref.fun) < 1e-6 * (1 + abs(ref.fun))
    rep = check_kkt(model)
    assert rep.ok, str(rep)
