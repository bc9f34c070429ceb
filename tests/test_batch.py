"""Scenario-batched and mesh-sharded solves (the TPU scale-out path)."""

import numpy as np
import pytest
import jax

import clp_tpu
from clp_tpu import Model, SolveOptions, solve_batch, ProblemStatus, check_kkt
from clp_tpu.parallel.mesh import make_mesh
from clp_tpu.utils.generators import random_lp
from tests.test_mps import _linprog


def _perturbed_models(base_seed=0, count=8):
    """Same-shape LPs with perturbed RHS (the 10k-scenario config shrunk)."""
    models = []
    base = random_lp(10, 16, seed=base_seed)
    rng = np.random.default_rng(123)
    for k in range(count):
        m = base.copy()
        shift = rng.uniform(-0.05, 0.05, m.num_rows)
        m.row_lower = np.where(m.row_lower > -clp_tpu.INF, m.row_lower - np.abs(shift), m.row_lower)
        m.row_upper = np.where(m.row_upper < clp_tpu.INF, m.row_upper + np.abs(shift), m.row_upper)
        models.append(m)
    return models


def test_batch_matches_single():
    models = _perturbed_models(count=4)
    sols = solve_batch(models)
    assert len(sols) == 4
    for m, s in zip(models, sols):
        assert s.status == ProblemStatus.OPTIMAL
        ref = _linprog(m)
        assert abs(s.objective_value - ref.fun) < 1e-6 * (1 + abs(ref.fun))
        assert check_kkt(m).ok


def test_batch_sharded_over_mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh()
    models = _perturbed_models(count=8)
    sols = solve_batch(models, mesh=mesh)
    for m, s in zip(models, sols):
        assert s.status == ProblemStatus.OPTIMAL
        assert check_kkt(m).ok


def test_batch_shape_mismatch_raises():
    from clp_tpu.parallel.batch import stack_models

    a = random_lp(5, 8, seed=0)
    b = random_lp(6, 8, seed=0)
    with pytest.raises(ValueError):
        stack_models([a, b])


def test_batch_dual_simplex():
    from clp_tpu.parallel.batch import solve_batch_dual_simplex

    models = _perturbed_models(base_seed=2, count=4)
    sols = solve_batch_dual_simplex(models)
    for m, s in zip(models, sols):
        assert s.status == ProblemStatus.OPTIMAL
        ref = _linprog(m)
        assert abs(s.objective_value - ref.fun) < 1e-7 * (1 + abs(ref.fun))
        assert check_kkt(m).ok


def test_batch_qp():
    """Batched QP solves (same Q across scenarios with perturbed rhs)."""
    import scipy.sparse as sp

    rng = np.random.default_rng(3)
    n, mrows = 6, 3
    Q = sp.csc_matrix(np.diag(rng.uniform(1.0, 2.0, n)))
    base = Model()
    base.load_problem(
        sp.csc_matrix(rng.uniform(0, 1, (mrows, n))),
        col_lower=np.zeros(n),
        col_upper=np.full(n, 2.0),
        objective=rng.uniform(-2, -1, n),
        row_lower=np.full(mrows, -clp_tpu.INF),
        row_upper=rng.uniform(2.0, 4.0, mrows),
    )
    base.load_quadratic_objective(Q)
    models = []
    for k in range(3):
        m = base.copy()
        m.row_upper = m.row_upper + 0.05 * k
        models.append(m)
    sols = solve_batch(models)
    for m, s in zip(models, sols):
        assert s.status == ProblemStatus.OPTIMAL
        assert check_kkt(m).ok
    # objectives should improve monotonically as rows loosen
    objs = [s.objective_value for s in sols]
    assert objs[0] >= objs[1] >= objs[2]


def _portfolio_qp(n, gamma, seed):
    import scipy.sparse as sp

    rng = np.random.default_rng(seed)
    F = rng.normal(size=(n, max(2, n // 4)))
    S = F @ F.T / n + np.eye(n) * 0.05
    mu = rng.uniform(0.01, 0.12, n)
    m = Model()
    m.load_problem(sp.csc_matrix(np.ones((1, n))), np.zeros(n),
                   np.full(n, 0.3), -mu, np.array([1.0]), np.array([1.0]))
    m.quadratic_objective = sp.csc_matrix(gamma * S)
    return m


def test_batch_qp_simplex_parametric_sweep():
    """Batched QP ACTIVE-SET simplex (not the IPM): a risk-aversion sweep
    of same-structure portfolio QPs as one vmapped device program, each
    matching the single-instance reduced-gradient driver."""
    from clp_tpu.parallel.batch import solve_batch_qp_simplex
    from clp_tpu.simplex.qp import qp_simplex_solve

    gammas = np.linspace(0.5, 8.0, 8)
    models = [_portfolio_qp(16, g, seed=0) for g in gammas]
    sols = solve_batch_qp_simplex([m.copy() for m in models])
    for m, s in zip(models, sols):
        ref = qp_simplex_solve(m.copy(), SolveOptions())
        assert s.status == ref.status == ProblemStatus.OPTIMAL
        assert abs(s.objective_value - ref.objective_value) < 1e-6 * (
            1 + abs(ref.objective_value))
    # the efficient frontier is monotone in gamma
    risks = [float(s.primal @ (m.quadratic_objective @ s.primal)) / g
             for s, m, g in zip(sols, models, gammas)]
    assert all(risks[i + 1] <= risks[i] + 1e-9 for i in range(len(risks) - 1))


def test_batch_qp_simplex_sharded_over_mesh():
    from clp_tpu.parallel.batch import solve_batch_qp_simplex

    models = [_portfolio_qp(12, g, seed=1)
              for g in np.linspace(1.0, 4.0, 8)]
    mesh = make_mesh()
    sols = solve_batch_qp_simplex(models, mesh=mesh)
    assert all(s.status == ProblemStatus.OPTIMAL for s in sols)
