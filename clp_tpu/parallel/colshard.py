"""Column-sharded dual simplex: ONE LP's columns distributed over the mesh.

SURVEY.md §2 parallelism table, "cross-chip psum/argmax over column
shards": the dual engine's per-pivot work is dominated by PRICE
(rho' G, an O(m*n) contraction over all columns) and the column-indexed
bookkeeping (dj updates, ratio tests, bound flips). Sharding the column
axis over a `block` mesh makes all of that local per shard; the only
cross-chip traffic per pivot is O(m) floats (the entering column's FTRAN
source + the flip-flow matvec) and the ratio-test argmax scalars.

The TPU-native design point: rather than hand-writing the collectives
(the reference's ABOCA spawns threads over column slices and reduces by
hand, ClpPackedMatrix.cpp:337-406), we annotate the PLACEMENT of the LP
and the engine state — columns sharded, rows replicated — and run the
standard jitted engine; XLA's SPMD partitioner derives the psum /
all-gather pattern from the annotations (the scaling-book recipe). The
engine code is therefore identical single-chip and multi-chip.

Layout:
    G     (m, nt)  P(None, "block")   column shards
    c,l,u (nt,)    P("block")
    b     (m,)     P()                replicated
    state.vstat/dj/wcol (nt,) P("block"); basis/binv/xb/y/weights P()

Columns are padded to a multiple of the mesh size with fixed dummy
columns (l = u = 0, zero objective, zero matrix column) — the engine's
`fixed` mask keeps them out of every ratio test and they price to 0.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..forms import StandardLP
from ..simplex import engine


def make_block_mesh(devices: Optional[Sequence] = None) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devs), ("block",))


def pad_lp_columns(lp: StandardLP, multiple: int) -> tuple[StandardLP, int]:
    """Pad nt up to a multiple with fixed (l=u=0) zero columns.

    Returns (padded lp, original nt). Fixed columns can never enter a
    basis (engine `fixed` mask) and contribute nothing to any matvec.
    """
    m, nt = lp.G.shape
    pad = (-nt) % multiple
    if pad == 0:
        return lp, nt
    z = jnp.zeros((m, pad), lp.G.dtype)
    zv = jnp.zeros((pad,), lp.c.dtype)
    return (
        dataclasses.replace(
            lp,
            G=jnp.concatenate([lp.G, z], axis=1),
            c=jnp.concatenate([lp.c, zv]),
            l=jnp.concatenate([lp.l, zv]),
            u=jnp.concatenate([lp.u, zv]),
        ),
        nt,
    )


def shard_lp_columns(lp: StandardLP, mesh: Mesh) -> tuple[StandardLP, int]:
    """Pad + place an LP with its column axis sharded over `mesh`."""
    lp, nt0 = pad_lp_columns(lp, mesh.devices.size)
    col2 = NamedSharding(mesh, P(None, "block"))
    col1 = NamedSharding(mesh, P("block"))
    rep = NamedSharding(mesh, P())
    return (
        dataclasses.replace(
            lp,
            G=jax.device_put(lp.G, col2),
            b=jax.device_put(lp.b, rep),
            c=jax.device_put(lp.c, col1),
            l=jax.device_put(lp.l, col1),
            u=jax.device_put(lp.u, col1),
        ),
        nt0,
    )


def shard_state_columns(
    state: engine.SimplexState, mesh: Mesh
) -> engine.SimplexState:
    """Place engine state: column-indexed arrays sharded, rows replicated."""
    col1 = NamedSharding(mesh, P("block"))
    rep = NamedSharding(mesh, P())

    def put(x, sh):
        return jax.device_put(x, sh)

    return engine.SimplexState(
        basis=put(state.basis, rep),
        vstat=put(state.vstat, col1),
        binv=put(state.binv, rep),
        xb=put(state.xb, rep),
        dj=put(state.dj, col1),
        y=put(state.y, rep),
        weights=put(state.weights, rep),
        wcol=put(state.wcol, col1),
        iterations=state.iterations,
        status=state.status,
        refactor_now=state.refactor_now,
        refactors=state.refactors,
    )


def dual_solve_colsharded(
    lp: StandardLP,
    opts: engine.SimplexOptions,
    mesh: Mesh,
    vstat=None,
    basis=None,
) -> tuple[engine.SimplexState, StandardLP, int]:
    """Full dual solve of one LP with columns sharded over `mesh`.

    Returns (final state, the padded+sharded lp, original nt). The caller
    slices column-indexed outputs back to the original nt. Pallas pricing
    and pm1 gathers are engine paths that assume replicated layouts, so
    they are forced off here; the plain contraction partitions cleanly.
    """
    opts = dataclasses.replace(opts, use_pallas_price=False, price_mode="dense")
    # build the start state on the ORIGINAL lp — padding appends columns
    # AFTER the slacks, so the all-slack basis indices (last m of nt0) stay
    # valid, but initial_state must not see the zero pads as slacks
    state = engine.initial_state(lp, opts, vstat=vstat, basis=basis)
    slp, nt0 = shard_lp_columns(lp, mesh)
    pad = slp.G.shape[1] - nt0
    if pad:
        state = dataclasses.replace(
            state,
            vstat=jnp.concatenate(
                [state.vstat, jnp.full((pad,), engine.AT_LOWER, jnp.int32)]
            ),
            dj=jnp.concatenate([state.dj, jnp.zeros((pad,), state.dj.dtype)]),
            wcol=jnp.concatenate([state.wcol, jnp.ones((pad,), state.wcol.dtype)]),
        )
    state = shard_state_columns(state, mesh)
    with mesh:
        state = engine.recompute(slp, state, opts.dual_bound)
        state = engine.make_dual_feasible(slp, state, opts)
        state = engine.dual_solve(slp, state, opts)
    return state, slp, nt0
