"""Pallas kernel correctness vs the jnp reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from clp_tpu.ops.pallas_price import price_and_ratios, price_and_ratios_reference


def test_price_kernel_matches_reference():
    rng = np.random.default_rng(0)
    m, nt = 24, 700  # deliberately not a multiple of the block
    rho = jnp.asarray(rng.standard_normal(m))
    G = jnp.asarray(rng.standard_normal((m, nt)))
    dj = jnp.asarray(np.abs(rng.standard_normal(nt)))
    elig = jnp.asarray(rng.uniform(size=nt) < 0.7)
    sgn = jnp.asarray(np.where(rng.uniform(size=nt) < 0.5, 1.0, -1.0))
    sigma = jnp.asarray(1.0)
    rel = jnp.asarray(5e-8)

    a_ref, r_ref = price_and_ratios_reference(rho, G, dj, elig, sgn, sigma, rel, 1e-9)
    a_ker, r_ker = price_and_ratios(
        rho, G, dj, elig, sgn, sigma, rel, 1e-9, block_n=256, interpret=True
    )
    # kernel computes in f32 (Mosaic has no f64) — compare at f32 precision
    np.testing.assert_allclose(np.asarray(a_ker), np.asarray(a_ref), rtol=2e-5, atol=2e-5)
    r_ref_np = np.asarray(r_ref)
    r_ker_np = np.asarray(r_ker)
    both_finite = np.isfinite(r_ref_np) & np.isfinite(r_ker_np)
    # all but borderline-eligibility lanes must agree
    assert (np.isfinite(r_ref_np) == np.isfinite(r_ker_np)).mean() > 0.99
    np.testing.assert_allclose(
        r_ker_np[both_finite], r_ref_np[both_finite], rtol=2e-4, atol=2e-4
    )


def test_dual_engine_with_pallas_price_matches_plain():
    """Full dual-simplex solve with the fused PRICE kernel (interpret mode)."""
    from clp_tpu.forms import to_standard_form
    from clp_tpu.simplex import engine
    from clp_tpu.utils.generators import random_lp

    model = random_lp(10, 16, seed=3)
    lp, _ = to_standard_form(model)
    base = engine.SimplexOptions(max_iterations=500)
    pal = engine.SimplexOptions(max_iterations=500, use_pallas_price=True,
                                price_block_n=128)

    def solve(opts):
        st = engine.initial_state(lp, opts)
        st = engine.recompute(lp, st, opts.dual_bound)
        st = engine.make_dual_feasible(lp, st, opts)
        return engine.dual_solve(lp, st, opts)

    s0 = solve(base)
    s1 = solve(pal)
    assert int(s0.status) == engine.OPTIMAL
    assert int(s1.status) == engine.OPTIMAL
    import jax.numpy as jnp

    def obj(st):
        xn = engine.nonbasic_values(lp, st.vstat, 1e10)
        return float(jnp.take(lp.c, st.basis) @ st.xb + lp.c @ xn)

    assert abs(obj(s0) - obj(s1)) <= 1e-7 * (1 + abs(obj(s0)))


def test_fused_pivot_update_matches_reference():
    """ops/pallas_pivot: one-pass FTRAN+tau+flow+rank-1 update == the
    separate XLA ops (interpret mode; hardware-validated separately)."""
    import jax.numpy as jnp
    from clp_tpu.ops.pallas_pivot import fused_pivot_update

    rng = np.random.default_rng(3)
    m = 96
    binv = jnp.asarray(rng.standard_normal((m, m)), jnp.float32)
    gq = jnp.asarray(rng.standard_normal(m), jnp.float32)
    fd = jnp.asarray(rng.standard_normal(m), jnp.float32)
    r = 41
    rho = binv[r, :]
    triple = jnp.stack([gq, rho, fd], axis=1)
    abar = binv @ gq
    abar_r = rho @ gq
    bn, res = fused_pivot_update(binv, triple, rho, abar_r,
                                 jnp.asarray(1.0), jnp.asarray(r),
                                 interpret=True)
    factor = abar / abar_r
    factor = factor.at[r].set(1.0 - 1.0 / abar_r)
    bref = binv - jnp.outer(factor, rho)
    assert float(jnp.abs(bn - bref).max()) < 1e-5
    assert float(jnp.abs(res[:, 0] - abar).max()) < 1e-5
    assert float(jnp.abs(res[:, 1] - binv @ rho).max()) < 1e-5
    assert float(jnp.abs(res[:, 2] - binv @ fd).max()) < 1e-5
    # gate 0: binv passes through bit-exact
    bn0, _ = fused_pivot_update(binv, triple, rho, abar_r,
                                jnp.asarray(0.0), jnp.asarray(r),
                                interpret=True)
    assert float(jnp.abs(bn0 - binv).max()) == 0.0


def test_fused_pivot_in_engine():
    """use_pallas_pivot=True reaches the same optimum as the plain path."""
    from clp_tpu.forms import to_standard_form
    from clp_tpu.simplex import engine
    from clp_tpu.utils.generators import random_lp
    from tests.test_mps import _linprog

    model = random_lp(64, 96, seed=9, density=0.15)
    ref = _linprog(model)
    lp, _ = to_standard_form(model)
    opts = engine.SimplexOptions(
        max_iterations=10000, inverse_dtype="float32",
        refactor_frequency=50, dual_ratio="bfrt", use_pallas_pivot=True,
    )
    st = engine.initial_state(lp, opts)
    st = engine.recompute(lp, st, opts.dual_bound)
    st = engine.make_dual_feasible(lp, st, opts)
    st = engine.dual_solve(lp, st, opts)
    assert int(st.status) == engine.OPTIMAL
    l, u = np.asarray(lp.l), np.asarray(lp.u)
    vstat = np.asarray(st.vstat)
    x = np.where(vstat == engine.AT_LOWER, np.where(np.isfinite(l), l, 0),
                 np.where(vstat == engine.AT_UPPER,
                          np.where(np.isfinite(u), u, 0), 0.0))
    x[np.asarray(st.basis)] = np.asarray(st.xb)
    obj = float(np.asarray(lp.c) @ x)
    assert ref.status == 0
    assert abs(obj - ref.fun) < 1e-6 * (1 + abs(ref.fun))


def test_block_price_kernel_matches_reference_interpret():
    """Fused block-tile PRICE kernel (price_and_ratios_block) matches the
    dense reference exactly in interpret mode."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from clp_tpu.simplex.engine import block_forms
    from clp_tpu.ops.pallas_price import (
        price_and_ratios_block, price_and_ratios_reference)

    rng = np.random.default_rng(0)
    m, nt, nb, H, CB = 64, 384, 3, 40, 128
    G = np.zeros((m, nt))
    for j in range(nt):
        lo = min(int(j / nt * (m - 20)), m - 20)
        G[lo:lo + 16, j] = rng.normal(size=16) * (rng.random(16) < 0.5)
    Gj = jnp.asarray(G, jnp.float32)
    starts, W, m8 = block_forms(Gj, nb, H, CB)
    rho = jnp.asarray(rng.normal(size=m), jnp.float32)
    dj = jnp.asarray(rng.normal(size=nt), jnp.float32)
    elig = jnp.asarray(rng.random(nt) < 0.6)
    sgn = jnp.asarray(np.where(rng.random(nt) < 0.5, 1.0, -1.0), jnp.float32)
    rho_p = jnp.concatenate([rho, jnp.zeros(m8 - m, rho.dtype)])
    ntp = W.shape[0] * W.shape[2]
    padc = ntp - nt
    al, th = price_and_ratios_block(
        rho_p, starts, W,
        jnp.concatenate([dj, jnp.zeros(padc, dj.dtype)]),
        jnp.concatenate([elig.astype(jnp.int32), jnp.zeros(padc, jnp.int32)]),
        jnp.concatenate([sgn, jnp.ones(padc, sgn.dtype)]),
        1.0, 5e-8, 1e-9, interpret=True)
    ar, tr = price_and_ratios_reference(rho, Gj, dj, elig, sgn, 1.0, 5e-8, 1e-9)
    assert float(jnp.max(jnp.abs(al[:nt] - ar))) == 0.0
    ok = jnp.isfinite(tr)
    assert bool(jnp.all(jnp.isfinite(th[:nt]) == ok))
    assert float(jnp.max(jnp.abs(jnp.where(ok, th[:nt] - tr, 0.0)))) == 0.0
