"""Classic cycling LPs + degenerate-transport battery (VERDICT round-1 #10).

Reference: Clp's anti-cycling machinery (ClpSimplexProgress 5-deep history,
ClpSolve.hpp:336-345; perturbation ClpSimplexDual.cpp:6533). These are the
canonical textbook cyclers — the engine must terminate optimally without
needing the perturbation fallback.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from clp_tpu import (
    INF,
    Model,
    ProblemStatus,
    SolveMethod,
    SolveOptions,
    check_kkt,
)
from clp_tpu.utils.generators import transport_lp
from tests.test_mps import _linprog


def beale_lp() -> Model:
    """Beale (1955): cycles under Dantzig pricing with textbook tie-breaks."""
    A = sp.csc_matrix(np.array([
        [0.25, -60.0, -1 / 25, 9.0],
        [0.5, -90.0, -1 / 50, 3.0],
        [0.0, 0.0, 1.0, 0.0],
    ]))
    m = Model()
    m.load_problem(
        A,
        col_lower=[0.0] * 4,
        col_upper=[INF] * 4,
        objective=[-0.75, 150.0, -0.02, 6.0],
        row_lower=[-INF] * 3,
        row_upper=[0.0, 0.0, 1.0],
    )
    return m


def kuhn_lp() -> Model:
    """Kuhn's cycling example — the LP itself is unbounded."""
    A = sp.csc_matrix(np.array([
        [-2.0, -9.0, 1.0, 9.0],
        [1 / 3, 1.0, -1 / 3, -2.0],
    ]))
    m = Model()
    m.load_problem(
        A,
        col_lower=[0.0] * 4,
        col_upper=[INF] * 4,
        objective=[-2.0, -3.0, 1.0, 12.0],
        row_lower=[-INF] * 2,
        row_upper=[0.0, 0.0],
    )
    return m


@pytest.mark.parametrize("method", [SolveMethod.PRIMAL_SIMPLEX, SolveMethod.DUAL_SIMPLEX])
@pytest.mark.parametrize("presolve", [True, False])
def test_beale_terminates_optimal(method, presolve):
    opts = SolveOptions(method=method)
    opts.presolve.enabled = presolve
    sol = beale_lp().initial_solve(opts)
    assert sol.status == ProblemStatus.OPTIMAL
    assert abs(sol.objective_value - (-0.05)) < 1e-9
    # no perturbation fallback: the direct solve needs only a handful of pivots
    assert sol.iterations <= 20


@pytest.mark.parametrize("method", [SolveMethod.PRIMAL_SIMPLEX, SolveMethod.DUAL_SIMPLEX])
def test_kuhn_detected_unbounded(method):
    sol = kuhn_lp().initial_solve(SolveOptions(method=method))
    assert sol.status == ProblemStatus.DUAL_INFEASIBLE


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("method", [SolveMethod.PRIMAL_SIMPLEX, SolveMethod.DUAL_SIMPLEX])
def test_degenerate_transport(seed, method):
    """Balanced transport with equal supplies/demands: heavily degenerate."""
    m = transport_lp(4, 5, seed=seed)
    # equalize supplies/demands to maximize degeneracy
    ref = _linprog(m)
    sol = m.initial_solve(SolveOptions(method=method))
    assert sol.status == ProblemStatus.OPTIMAL
    assert abs(sol.objective_value - ref.fun) < 1e-7 * (1 + abs(ref.fun))
    assert check_kkt(m).ok
