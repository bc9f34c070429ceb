"""Pallas TPU kernel: fused FTRAN + DSE tau + flip flow + rank-1 update.

Per dual pivot the engine runs three O(m^2) contractions against the basis
inverse and then a rank-1 product-form update of it (reference hot steps:
updateColumnFT / updateWeights / replaceColumn, ClpFactorization.hpp:89-135).
As separate XLA ops that costs three full passes over binv's HBM bytes
(read for the fused 3-column matmul, read + write for the update). This
kernel does all of it in ONE pass: each program loads a row block of binv,
computes

    R_blk   = binv_blk @ [g_q | rho | f_delta]      (MXU, bm x m x 3)
    factor  = R_blk[:,0] / abar_r   (row r: 1 - 1/abar_r;  x0 if no pivot)
    binv'   = binv_blk - factor (x) rho             (VPU)

and stores both the updated block and R_blk. binv HBM traffic per pivot
drops from 3 passes to 2 (read + write).

The pivot scalars (leaving row r, the pivot element abar_r, and the
do-pivot gate) are computed OUTSIDE from rho = binv[r,:] — abar_r =
rho . g_q is arithmetically the row-r result of the same contraction, and
using one consistent scalar everywhere preserves the product-form
identity. When the gate is 0 the factor column is zeroed, so the "update"
writes binv back unchanged (the jnp.where select a separate update would
need costs another full pass).

f32 only (Mosaic has no f64) — this is the mixed-precision engine's pivot
loop dtype already; verification stays f64 at refactorization like every
other f32 quantity. CPU tests run in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pivot_kernel(scal_ref, binv_ref, triple_ref, rho_ref, binv_out_ref, res_ref):
    """One program per row block of binv."""
    inv_abar_r = scal_ref[0, 0]
    gate = scal_ref[0, 1]       # 1.0 when the pivot proceeds, else 0.0
    r = scal_ref[0, 2]          # leaving row index (as f32; exact to 2^24)
    bm = binv_ref.shape[0]
    i = pl.program_id(0)

    R = jnp.dot(
        binv_ref[...],
        triple_ref[...],
        preferred_element_type=binv_ref.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )  # (bm, 3)
    res_ref[...] = R

    row_ids = (i * bm + jax.lax.broadcasted_iota(jnp.int32, (bm, 1), 0)).astype(
        jnp.float32
    )
    factor = R[:, 0:1] * inv_abar_r
    factor = jnp.where(row_ids == r, 1.0 - inv_abar_r, factor)
    binv_out_ref[...] = binv_ref[...] - (gate * factor) * rho_ref[...]


@functools.partial(jax.jit, static_argnames=("block_m", "interpret"))
def fused_pivot_update(binv, triple, rho, abar_r, gate, r,
                       block_m: int = 256, interpret: bool = False):
    """(binv', [abar | tau | flow]) in one pass over binv.

    binv: (m, m) f32. triple: (m, 3) f32 columns [g_q, rho, f_delta].
    rho: (m,) f32 — row r of binv. abar_r: consistent pivot element
    (rho . g_q). gate: 1.0 to pivot, 0.0 to pass binv through unchanged.
    r: leaving row index.
    """
    m = binv.shape[0]
    bm = block_m
    while m % bm:
        bm //= 2
    bm = max(bm, 1)
    scal = jnp.stack([
        1.0 / abar_r.astype(jnp.float32),
        gate.astype(jnp.float32),
        r.astype(jnp.float32),
    ]).reshape(1, 3)
    grid = (m // bm,)

    # index maps must return int32: under jax_enable_x64 the default i64
    # block indices hit a Mosaic legalization failure (func.return on i64)
    def _row(i):
        return (jnp.asarray(i, jnp.int32), jnp.int32(0))

    def _fixed(i):
        return (jnp.int32(0), jnp.int32(0))

    binv_new, res = pl.pallas_call(
        _pivot_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3), _fixed, memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, m), _row, memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 3), _fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), _fixed, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bm, m), _row, memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 3), _row, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, m), binv.dtype),
            jax.ShapeDtypeStruct((m, 3), binv.dtype),
        ],
        interpret=interpret,
    )(scal, binv, triple, rho.reshape(1, m))
    return binv_new, res
