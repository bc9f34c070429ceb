"""Pallas TPU kernel: fused dual-simplex PRICE + ratio-test preparation.

The hot PRICE step (reference: ClpPackedMatrix::transposeTimesByRow,
ClpPackedMatrix.cpp:706-1307, parallelized there with cilk chunks and AVX)
computes alpha = rho' G and immediately feeds the Harris pass-1 ratio scan
(ClpSimplexDual.cpp:3665). Fusing both into one kernel reads G once from
HBM and emits both the tableau row and the relaxed ratios — bandwidth is
the binding resource for this step on TPU.

The kernel tiles over column blocks: each program computes
    alpha_tile   = rho @ G[:, tile]          (MXU)
    ratio_tile   = (dj + sgn*rel) / (sigma*alpha)  masked by eligibility
Global argmin/argmax reductions stay outside (they're O(nt) on the VPU).

Falls back to plain jnp on CPU (pallas interpret mode is used in tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_price_kernel(block_n: int, n_tiles: int):
    """Gridless kernel: the Mosaic toolchain in this environment cannot
    legalize grid kernels (func.return legalization failure), so the tile
    loop lives inside one program as a fori_loop over pl.ds slices.
    Stacked output: row 0 alpha, row 1 relaxed ratio."""

    def kernel(scal_ref, rho_ref, g_ref, dj_ref, elig_ref, sgn_ref, out_ref):
        sigma = scal_ref[0, 0]
        rel = scal_ref[0, 1]
        ptol = scal_ref[0, 2]
        rho = rho_ref[:]

        # statically unrolled tile loop: this Mosaic build rejects both grid
        # kernels and fori_loop-indexed dynamic slices, but compiles static
        # slices fine (n_tiles is trace-time constant)
        for i in range(n_tiles):
            sl = pl.ds(i * block_n, block_n)
            g = g_ref[:, sl]
            # alpha_tile = rho @ G_tile — (1, m) x (m, T) on the MXU.
            # HIGHEST precision: the MXU's default single-pass bf16 rounding
            # (~1e-2 relative) is too coarse for ratio-test eligibility.
            alpha = jnp.dot(
                rho, g, preferred_element_type=g.dtype,
                precision=jax.lax.Precision.HIGHEST,
            )
            out_ref[0:1, sl] = alpha
            a = sigma * alpha
            sgn = sgn_ref[0:1, sl]
            elig = (elig_ref[0:1, sl] != 0) & (jnp.abs(a) > ptol) & (sgn * a > 0)
            safe_a = jnp.where(elig, a, 1.0)
            out_ref[1:2, sl] = jnp.where(
                elig, (dj_ref[0:1, sl] + sgn * rel) / safe_a, jnp.inf
            )

    return kernel


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def price_and_ratios(rho, G, dj, elig_mask, sgn, sigma, rel, ptol,
                     block_n: int = 512, interpret: bool = False):
    """Fused alpha = rho'G and Harris pass-1 relaxed ratios.

    elig_mask: int8/bool — candidate nonbasic in the right direction class
    sgn: +1.0 for at-lower candidates, -1.0 for at-upper.
    Returns (alpha[nt], relaxed_ratio[nt]).
    """
    m, nt = G.shape
    out_dtype = G.dtype
    if G.dtype == jnp.float64:
        # Mosaic has no f64: pricing runs in f32 (the engine re-verifies the
        # chosen pivot against the f64 FTRAN, so reduced pricing precision
        # costs at most an extra pivot, never correctness)
        G = G.astype(jnp.float32)
        rho = rho.astype(jnp.float32)
        dj = dj.astype(jnp.float32)
        sgn = sgn.astype(jnp.float32)
        sigma = sigma.astype(jnp.float32)
        rel = rel.astype(jnp.float32)
    if nt % block_n:
        pad = block_n - nt % block_n
        G = jnp.pad(G, ((0, 0), (0, pad)))
        dj = jnp.pad(dj, (0, pad))
        elig_mask = jnp.pad(elig_mask.astype(jnp.int32), (0, pad))
        sgn = jnp.pad(sgn, (0, pad), constant_values=1.0)
    else:
        pad = 0
        elig_mask = elig_mask.astype(jnp.int32)
    ntp = G.shape[1]
    scal = jnp.stack([sigma, rel, jnp.asarray(ptol, G.dtype)]).reshape(1, 3)
    rho2 = rho.reshape(1, m)
    dj2 = dj.reshape(1, ntp)
    elig2 = elig_mask.reshape(1, ntp)
    sgn2 = sgn.reshape(1, ntp)

    n_tiles = ntp // block_n
    out = pl.pallas_call(
        _make_price_kernel(block_n, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 3), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, ntp), G.dtype),
        interpret=interpret,
    )(scal, rho2, G, dj2, elig2, sgn2)
    alpha = out[0, :nt].astype(out_dtype)
    ratio = out[1, :nt].astype(out_dtype)
    return alpha, ratio


def price_and_ratios_reference(rho, G, dj, elig_mask, sgn, sigma, rel, ptol):
    """Plain-jnp reference implementation (used on CPU and for testing)."""
    alpha = rho @ G
    a = sigma * alpha
    elig = (elig_mask != 0) & (jnp.abs(a) > ptol) & (sgn * a > 0)
    safe_a = jnp.where(elig, a, 1.0)
    ratio = jnp.where(elig, (dj + sgn * rel) / safe_a, jnp.inf)
    return alpha, ratio
