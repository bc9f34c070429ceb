"""Device (jit-traceable) multifrontal numeric vs the host plan."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from clp_tpu.ops.sparse_chol import SparseCholesky
from clp_tpu.ops.sparse_chol_device import (
    DeviceSparseCholesky, NormalEquationsDevice, make_device_normal_solver)


def _window_G(m=512, ncols=1024, win=30, k=8, seed=0):
    rng = np.random.default_rng(seed)
    rows, cols, vals = [], [], []
    for i in range(m):
        base = int(i * (ncols - win) / m)
        for j in base + rng.choice(win, k, replace=False):
            rows.append(i), cols.append(int(j)), vals.append(rng.normal())
    return sp.csr_matrix((vals, (rows, cols)), shape=(m, ncols))


def test_device_factor_solve_matches_host_f64():
    G = _window_G()
    m = G.shape[0]
    rng = np.random.default_rng(1)
    d = rng.random(G.shape[1]) + 0.1
    S = (G.multiply(d) @ G.T + 1e-8 * sp.eye(m)).tocsc()
    plan = SparseCholesky(S)
    assert plan.factor(S)
    rhs = rng.normal(size=m)
    x_host = plan.solve(rhs)

    dev = DeviceSparseCholesky(plan, dtype=jnp.float64)
    data = plan._permuted_data(S)
    factors, ok = jax.jit(dev.factor)(jnp.asarray(data))
    assert bool(ok)
    x_dev = np.asarray(jax.jit(dev.solve)(factors, jnp.asarray(rhs)))
    assert np.allclose(x_dev, x_host, rtol=1e-9, atol=1e-9)
    # true solve check
    assert np.linalg.norm(S @ x_dev - rhs) <= 1e-7 * np.linalg.norm(rhs)


def test_device_normal_equations_values():
    G = _window_G(m=256, ncols=512, win=20, k=6, seed=3)
    m = G.shape[0]
    rng = np.random.default_rng(4)
    d = rng.random(G.shape[1]) + 0.05
    reg = 1e-9
    Gp = sp.csr_matrix(G, copy=True)
    Gp.data[:] = 1.0
    S_pat = (Gp @ Gp.T + sp.eye(m, format="csr")).tocsc()
    plan = SparseCholesky(S_pat)
    neq = NormalEquationsDevice(G, plan, reg)
    vals_dev = np.asarray(jax.jit(neq.values)(jnp.asarray(d)))
    S = (G.multiply(d) @ G.T + reg * sp.eye(m)).tocsc()
    vals_host = plan._permuted_data(S)
    assert np.allclose(vals_dev, vals_host, rtol=1e-12, atol=1e-12)


def test_device_normal_solver_end_to_end():
    G = _window_G(m=640, ncols=1280, win=32, k=8, seed=5)
    m = G.shape[0]
    solver = make_device_normal_solver(G, reg=1e-9, dtype=jnp.float64)
    assert solver is not None
    rng = np.random.default_rng(6)
    d = rng.random(G.shape[1]) + 0.01
    rhs = rng.normal(size=m)
    x = np.asarray(jax.jit(solver.solve)(jnp.asarray(d), jnp.asarray(rhs)))
    S = (G.multiply(d) @ G.T + 1e-9 * sp.eye(m)).tocsc()
    assert np.linalg.norm(S @ x - rhs) <= 1e-6 * np.linalg.norm(rhs)


def test_device_f32_factor_with_refinement():
    """f32 factor + f64 matvec refinement reaches f64-class accuracy —
    the mixed-precision contract the TPU path runs under."""
    G = _window_G(m=512, ncols=1024, win=30, k=8, seed=7)
    m = G.shape[0]
    solver = make_device_normal_solver(G, reg=1e-9, dtype=jnp.float32)
    assert solver is not None
    rng = np.random.default_rng(8)
    d = rng.random(G.shape[1]) + 0.01
    rhs = rng.normal(size=m)
    Gd = jnp.asarray(G.toarray())
    dj = jnp.asarray(d)

    def matvec(v):
        return Gd @ (dj * (Gd.T @ v)) + 1e-9 * v

    @jax.jit
    def refined(d_, rhs_):
        factors, _ = solver.factor(d_)
        x = solver.solve_with(factors, rhs_.astype(jnp.float32)).astype(
            jnp.float64)
        for _ in range(3):
            r = rhs_ - matvec(x)
            x = x + solver.solve_with(
                factors, r.astype(jnp.float32)).astype(jnp.float64)
        return x

    x = np.asarray(refined(dj, jnp.asarray(rhs)))
    S = (G.multiply(d) @ G.T + 1e-9 * sp.eye(m)).tocsc()
    assert np.linalg.norm(S @ x - rhs) <= 1e-8 * np.linalg.norm(rhs)


def test_barrier_device_sparse_end_to_end_f32():
    """The IPM with the DEVICE multifrontal Newton solver (f32 factor +
    f64 refinement) converges on a window LP and matches the dual
    simplex objective — the whole barrier is one compiled program."""
    from tests.test_sparse_chol import window_lp
    from clp_tpu import SolveOptions, SolveMethod, ProblemStatus
    from clp_tpu.forms import to_ipm_form
    from clp_tpu.interior.mehrotra import IPMOptions, ipm_solve_jit
    from clp_tpu.solve import initial_solve

    model = window_lp(768, 1536, 30, 7)
    lp, info = to_ipm_form(model)
    G_csr = sp.csr_matrix(np.asarray(lp.G))
    dev = make_device_normal_solver(G_csr, reg=1e-10 + 1e-12,
                                    dtype=jnp.float32)
    assert dev is not None
    opts = IPMOptions(tol=1e-8, max_iter=100, reg_primal=1e-9,
                      reg_dual=1e-10, sparse_chol_device=dev)
    res = ipm_solve_jit(lp, opts)
    assert bool(res.converged)

    ref = window_lp(768, 1536, 30, 7)
    o2 = SolveOptions(method=SolveMethod.DUAL_SIMPLEX)
    o2.presolve.enabled = False
    s2 = initial_solve(ref, o2)
    assert s2.status == ProblemStatus.OPTIMAL
    sense = info.sense
    obj = float(res.pobj) * sense + ref.objective_offset
    assert abs(obj - s2.objective_value) < 1e-5 * (
        1 + abs(s2.objective_value)), (obj, s2.objective_value)
