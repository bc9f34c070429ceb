"""Pallas TPU kernel: fused dual-simplex PRICE + ratio-test preparation.

The hot PRICE step (reference: ClpPackedMatrix::transposeTimesByRow,
ClpPackedMatrix.cpp:706-1307, parallelized there with cilk chunks and AVX)
computes alpha = rho' G and immediately feeds the Harris pass-1 ratio scan
(ClpSimplexDual.cpp:3665). Fusing both into one kernel reads G once from
HBM and emits both the tableau row and the relaxed ratios — bandwidth is
the binding resource for this step on TPU.

The kernel is gridded over column tiles: program i streams G[:, tile_i]
HBM->VMEM (the pallas pipeline double-buffers automatically) and computes
    alpha_tile   = rho @ G[:, tile]                (MXU)
    ratio_tile   = (dj + sgn*rel) / (sigma*alpha)  masked by eligibility
Global argmin/argmax reductions stay outside (they're O(nt) on the VPU).

Precision: Mosaic has no f64, so pricing runs in f32 on the MXU with
HIGHEST precision; the engine re-verifies the chosen pivot against the f64
FTRAN value, so reduced pricing precision costs at most an extra pivot,
never correctness (see SimplexOptions.use_pallas_price in simplex/engine).

Falls back to plain jnp on CPU (pallas interpret mode is used in tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _price_kernel(scal_ref, rho_ref, g_ref, dj_ref, elig_ref, sgn_ref, out_ref):
    """One program per column tile; all tensor refs are VMEM tiles."""
    sigma = scal_ref[0, 0]
    rel = scal_ref[0, 1]
    ptol = scal_ref[0, 2]
    # alpha_tile = rho @ G_tile — (1, m) x (m, T) on the MXU.
    # HIGHEST precision: the MXU's default single-pass bf16 rounding
    # (~1e-2 relative) is too coarse for ratio-test eligibility.
    alpha = jnp.dot(
        rho_ref[...],
        g_ref[...],
        preferred_element_type=g_ref.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )
    out_ref[0:1, :] = alpha
    a = sigma * alpha
    sgn = sgn_ref[...]
    elig = (elig_ref[...] != 0) & (jnp.abs(a) > ptol) & (sgn * a > 0)
    safe_a = jnp.where(elig, a, 1.0)
    out_ref[1:2, :] = jnp.where(elig, (dj_ref[...] + sgn * rel) / safe_a, jnp.inf)


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def price_and_ratios(rho, G, dj, elig_mask, sgn, sigma, rel, ptol,
                     block_n: int = 512, interpret: bool = False):
    """Fused alpha = rho'G and Harris pass-1 relaxed ratios.

    G may be f32 (preferred: pass a loop-invariant f32 copy so the cast is
    not re-done per pivot) or f64 (cast here). rho/dj/sgn/sigma/rel are cast
    to G's compute dtype.

    elig_mask: int8/bool — candidate nonbasic in the right direction class
    sgn: +1.0 for at-lower candidates, -1.0 for at-upper.
    Returns (alpha[nt], relaxed_ratio[nt]) in f64 (or G's dtype if f32 in).
    """
    m, nt = G.shape
    # VMEM budget: the pipeline double-buffers the (m, block_n) f32 G tile,
    # so 2*m*block_n*4 B must stay well under the ~16 MB scoped VMEM limit
    # (plus rho/dj/out tiles). Clamp block_n for tall problems.
    fit = max(128, int(12_000_000 // (8 * m)) // 128 * 128)
    block_n = min(block_n, fit)
    out_dtype = jnp.result_type(rho.dtype, G.dtype)
    if G.dtype == jnp.float64:
        # Mosaic has no f64: pricing runs in f32
        G = G.astype(jnp.float32)
    cdt = G.dtype
    rho = rho.astype(cdt)
    dj = dj.astype(cdt)
    sgn = sgn.astype(cdt)
    if nt % block_n:
        pad = block_n - nt % block_n
        G = jnp.pad(G, ((0, 0), (0, pad)))
        dj = jnp.pad(dj, (0, pad))
        elig_mask = jnp.pad(elig_mask.astype(jnp.int32), (0, pad))
        sgn = jnp.pad(sgn, (0, pad), constant_values=1.0)
    else:
        elig_mask = elig_mask.astype(jnp.int32)
    ntp = G.shape[1]
    scal = jnp.stack(
        [jnp.asarray(sigma, cdt), jnp.asarray(rel, cdt), jnp.asarray(ptol, cdt)]
    ).reshape(1, 3)
    rho2 = rho.reshape(1, m)
    dj2 = dj.reshape(1, ntp)
    elig2 = elig_mask.reshape(1, ntp)
    sgn2 = sgn.reshape(1, ntp)

    n_tiles = ntp // block_n
    # index maps must return int32: under jax_enable_x64 the default i64
    # block indices hit a Mosaic legalization failure (func.return on i64)
    def _fixed(i):
        return (jnp.int32(0), jnp.int32(0))

    def _tile(i):
        return (jnp.int32(0), jnp.asarray(i, jnp.int32))

    out = pl.pallas_call(
        _price_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 3), _fixed, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, m), _fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((m, block_n), _tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), _tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), _tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), _tile, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, block_n), _tile, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, ntp), cdt),
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


# ---------------------------------------------------------------------------
# block-banded variant: PRICE over window-compacted column tiles
# ---------------------------------------------------------------------------


def _block_price_kernel(scal_ref, start_ref, rho_ref, w_ref, dj_ref,
                        elig_ref, sgn_ref, out_ref, *, H):
    """One program per column BLOCK: the (H, CB) tile streams HBM->VMEM;
    the rho window is sliced from the full (8-aligned) rho resident in
    VMEM. Same fused Harris pass-1 as the dense kernel."""
    b = pl.program_id(0)
    sigma = scal_ref[0, 0]
    rel = scal_ref[0, 1]
    ptol = scal_ref[0, 2]
    s = start_ref[0, b]
    rho_win = rho_ref[pl.dslice(s, H), :]  # (H, 1), 8-aligned start
    alpha = jnp.dot(
        rho_win.reshape(1, H),
        w_ref[0],
        preferred_element_type=w_ref.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )
    out_ref[0:1, :] = alpha
    a = sigma * alpha
    sgn = sgn_ref[...]
    elig = (elig_ref[...] != 0) & (jnp.abs(a) > ptol) & (sgn * a > 0)
    safe_a = jnp.where(elig, a, 1.0)
    out_ref[1:2, :] = jnp.where(elig, (dj_ref[...] + sgn * rel) / safe_a, jnp.inf)


@functools.partial(jax.jit, static_argnames=("interpret",))
def price_and_ratios_block(rho_p, starts, W, dj, elig_mask, sgn, sigma,
                           rel, ptol, interpret: bool = False):
    """Fused block-banded PRICE + Harris pass-1.

    rho_p: (m8,) the BTRAN row padded to the block form's 8-aligned row
    domain. starts: (nb,) int32 window starts (multiples of 8).
    W: (nb, H, CB) f32 window-compacted tiles (engine.block_forms).
    dj/elig_mask/sgn: (nb*CB,) in SORTED column order.
    Returns (alpha, relaxed_ratio) of length nb*CB — HBM traffic is the
    covered windows (H*nt), not m*nt: the staircase PRICE reads ~5x less
    than the dense kernel.
    """
    nb, H, CB = W.shape
    m8 = rho_p.shape[0]
    cdt = W.dtype
    rho2 = rho_p.astype(cdt).reshape(m8, 1)
    ntp = nb * CB
    dj2 = dj.astype(cdt).reshape(1, ntp)
    elig2 = elig_mask.astype(jnp.int32).reshape(1, ntp)
    sgn2 = sgn.astype(cdt).reshape(1, ntp)
    scal = jnp.stack(
        [jnp.asarray(sigma, cdt), jnp.asarray(rel, cdt), jnp.asarray(ptol, cdt)]
    ).reshape(1, 3)
    starts2 = starts.astype(jnp.int32).reshape(1, nb)

    def _fixed(i):
        return (jnp.int32(0), jnp.int32(0))

    def _tile3(i):
        return (jnp.asarray(i, jnp.int32), jnp.int32(0), jnp.int32(0))

    def _tile(i):
        return (jnp.int32(0), jnp.asarray(i, jnp.int32))

    out = pl.pallas_call(
        functools.partial(_block_price_kernel, H=H),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 3), _fixed, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nb), _fixed, memory_space=pltpu.SMEM),
            pl.BlockSpec((m8, 1), _fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, CB), _tile3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CB), _tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CB), _tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CB), _tile, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, CB), _tile, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, ntp), cdt),
        interpret=interpret,
    )(scal, starts2, rho2, W, dj2, elig2, sgn2)
    return out[0], out[1]
