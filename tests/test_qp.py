"""Quadratic-objective (QP) solves via the barrier path (testQP workload)."""

import numpy as np
import pytest
import scipy.sparse as sp

import clp_tpu
from clp_tpu import Model, INF, ProblemStatus, SolveMethod, SolveOptions, check_kkt


def test_simple_qp():
    """min 0.5(x1^2+x2^2) - x1 - x2  s.t. x1+x2 <= 1, x >= 0 -> (0.5, 0.5)."""
    model = Model()
    model.load_problem(
        sp.csc_matrix(np.array([[1.0, 1.0]])),
        col_lower=[0, 0],
        col_upper=[INF, INF],
        objective=[-1.0, -1.0],
        row_lower=[-INF],
        row_upper=[1.0],
    )
    model.load_quadratic_objective(sp.eye(2, format="csc"))
    sol = model.barrier(crossover=False)
    assert sol.status == ProblemStatus.OPTIMAL
    np.testing.assert_allclose(sol.primal, [0.5, 0.5], atol=1e-6)
    assert abs(sol.objective_value - (-0.75)) < 1e-6
    rep = check_kkt(model)
    assert rep.ok, str(rep)


def test_qp_interior_known_solution():
    """Equality-constrained QP with a constructed interior optimum."""
    rng = np.random.default_rng(0)
    n, m = 8, 3
    B = rng.standard_normal((n, n))
    Q = B @ B.T + n * np.eye(n)
    A = rng.standard_normal((m, n))
    x_star = rng.uniform(1.0, 2.0, n)
    y_star = rng.standard_normal(m)
    b = A @ x_star
    c = A.T @ y_star - Q @ x_star

    model = Model()
    model.load_problem(
        sp.csc_matrix(A),
        col_lower=np.full(n, -100.0),
        col_upper=np.full(n, 100.0),
        objective=c,
        row_lower=b,
        row_upper=b,
    )
    model.load_quadratic_objective(sp.csc_matrix(Q))
    sol = model.barrier(crossover=False)
    assert sol.status == ProblemStatus.OPTIMAL
    np.testing.assert_allclose(sol.primal, x_star, atol=1e-5)


def test_qp_unconstrained_bounds_only():
    """min 0.5 x'Qx + c'x with box bounds forcing some actives."""
    rng = np.random.default_rng(1)
    n = 6
    Q = np.diag(rng.uniform(1.0, 3.0, n))
    c = rng.standard_normal(n) * 5
    model = Model()
    # one trivial row to keep m >= 1
    row = np.zeros((1, n))
    row[0, 0] = 1.0
    model.load_problem(
        sp.csc_matrix(row),
        col_lower=np.full(n, -1.0),
        col_upper=np.full(n, 1.0),
        objective=c,
        row_lower=[-100.0],
        row_upper=[100.0],
    )
    model.load_quadratic_objective(sp.csc_matrix(Q))
    sol = model.barrier(crossover=False)
    assert sol.status == ProblemStatus.OPTIMAL
    # analytic: x_j = clip(-c_j / Q_jj, -1, 1)
    expected = np.clip(-c / np.diag(Q), -1.0, 1.0)
    np.testing.assert_allclose(sol.primal, expected, atol=1e-6)
    rep = check_kkt(model)
    assert rep.ok, str(rep)


def test_qp_mps_roundtrip(tmp_path):
    """QUADOBJ section round-trips through MPS."""
    model = Model()
    model.load_problem(
        sp.csc_matrix(np.array([[1.0, 1.0]])),
        col_lower=[0, 0],
        col_upper=[INF, INF],
        objective=[-1.0, -1.0],
        row_lower=[-INF],
        row_upper=[1.0],
    )
    model.load_quadratic_objective(sp.csc_matrix(np.array([[1.0, 0.5], [0.5, 2.0]])))
    path = str(tmp_path / "qp.mps")
    model.write_mps(path)
    m2 = Model()
    m2.read_mps(path)
    assert m2.quadratic_objective is not None
    np.testing.assert_allclose(
        np.asarray(m2.quadratic_objective.todense()),
        np.asarray(model.quadratic_objective.todense()),
        atol=1e-12,
    )
    s1 = model.barrier(crossover=False)
    s2 = m2.barrier(crossover=False)
    assert abs(s1.objective_value - s2.objective_value) < 1e-8


# ---------------------------------------------------------------------------
# QP by simplex (reduced-gradient active-set) vs barrier — the reference's
# QP unit-test pattern (unitTest.cpp:2530-2690: simplex-QP and barrier-QP
# must agree). Reference algorithm: ClpSimplexNonlinear.cpp:33,:773.
# ---------------------------------------------------------------------------


def _random_qp(seed, n=8, mr=5, box=2.0):
    rng = np.random.default_rng(seed)
    A = sp.csc_matrix(rng.standard_normal((mr, n)))
    L = rng.standard_normal((n, n)) * 0.4
    Q = sp.csc_matrix(L @ L.T + np.eye(n))
    m = Model()
    m.load_problem(A, col_lower=np.full(n, -box), col_upper=np.full(n, box),
                   objective=rng.standard_normal(n),
                   row_lower=np.full(mr, -3.0), row_upper=np.full(mr, 3.0))
    m.quadratic_objective = Q
    return m


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_qp_simplex_matches_barrier(seed):
    m = _random_qp(seed)
    sol = m.copy().initial_solve(SolveOptions(method=SolveMethod.PRIMAL_SIMPLEX))
    ref = m.copy().initial_solve(SolveOptions(method=SolveMethod.BARRIER_NO_CROSS))
    assert sol.status == ProblemStatus.OPTIMAL
    assert ref.status == ProblemStatus.OPTIMAL
    assert abs(sol.objective_value - ref.objective_value) < 1e-7 * (
        1 + abs(ref.objective_value)
    )
    rep = check_kkt(m, x=sol.primal, y=sol.duals, tol=1e-6)
    assert rep.ok, str(rep)


def test_qp_simplex_with_presolve_and_maximize():
    m = _random_qp(7)
    m.set_maximize()
    m.quadratic_objective = -m.quadratic_objective  # keep convex in min form
    sol = m.copy().initial_solve(SolveOptions(method=SolveMethod.PRIMAL_SIMPLEX))
    ref = m.copy().initial_solve(SolveOptions(method=SolveMethod.BARRIER_NO_CROSS))
    assert sol.status == ProblemStatus.OPTIMAL
    assert abs(sol.objective_value - ref.objective_value) < 1e-6 * (
        1 + abs(ref.objective_value)
    )


def test_qp_simplex_semidefinite():
    """Singular Q (rank-1): active-set must still terminate optimally."""
    n = 4
    q = np.array([1.0, -1.0, 0.5, 0.0])
    Q = sp.csc_matrix(np.outer(q, q) + 1e-10 * np.eye(n))
    A = sp.csc_matrix(np.ones((1, n)))
    m = Model()
    m.load_problem(A, col_lower=np.zeros(n), col_upper=np.full(n, 2.0),
                   objective=[-1.0, -0.5, 0.25, -0.1],
                   row_lower=[-INF], row_upper=[4.0])
    m.quadratic_objective = Q
    sol = m.copy().initial_solve(SolveOptions(method=SolveMethod.PRIMAL_SIMPLEX))
    ref = m.copy().initial_solve(SolveOptions(method=SolveMethod.BARRIER_NO_CROSS))
    assert sol.status == ProblemStatus.OPTIMAL
    assert abs(sol.objective_value - ref.objective_value) < 1e-6 * (
        1 + abs(ref.objective_value)
    )
