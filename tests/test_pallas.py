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
