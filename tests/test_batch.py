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
