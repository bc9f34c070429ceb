"""Block mesh axis: column shards of ONE wide LP across devices.

SURVEY.md §2's parallelism table maps the reference's Sprint/column-
generation repricing (a sequential loop over all columns,
ClpSolve.cpp:2486+) to a column-sharded device computation: the matrix's
columns live sharded over the "block" mesh axis, the duals are replicated,
and the repricing dj = c - y'A is computed locally per shard with one
all-gather reduction for the global top-k candidate selection — the
collective moves O(n) floats, never the matrix.

This is the `block` axis counterpart to `parallel/batch.py`'s `scenario`
axis; both are exercised by __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_block_mesh(devices: Optional[Sequence] = None) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devs), ("block",))


@functools.partial(jax.jit, static_argnames=("k",))
def _reprice_kernel(G, c, y, k: int):
    """dj = c - y'G, then the k most attractive (most negative) columns.

    With G sharded P(None, "block") and y replicated, the matvec is local
    per shard; top_k induces the all-gather of per-shard candidates.
    """
    dj = c - y @ G
    neg_vals, idx = jax.lax.top_k(-dj, k)
    return dj, -neg_vals, idx


class BlockShardedColumns:
    """Device-resident column shards of (A, c) for repeated repricing."""

    def __init__(self, A, c, mesh: Mesh):
        A = np.asarray(A.todense()) if hasattr(A, "todense") else np.asarray(A)
        c = np.asarray(c, dtype=np.float64)
        m, n = A.shape
        d = mesh.devices.size
        pad = (-n) % d
        if pad:
            A = np.pad(A, ((0, 0), (0, pad)))
            # padded columns price to +inf attractiveness never
            c = np.pad(c, (0, pad), constant_values=1e30)
        self.n = n
        self.mesh = mesh
        self.G = jax.device_put(
            jnp.asarray(A), NamedSharding(mesh, P(None, "block"))
        )
        self.c = jax.device_put(jnp.asarray(c), NamedSharding(mesh, P("block")))

    def reprice(self, y: np.ndarray, k: int = 256):
        """Full-set pricing: returns (dj[n], top-k values, top-k indices)."""
        k = min(k, self.n)
        y_dev = jax.device_put(
            jnp.asarray(y, jnp.float64), NamedSharding(self.mesh, P())
        )
        dj, vals, idx = _reprice_kernel(self.G, self.c, y_dev, k)
        return (
            np.asarray(dj)[: self.n],
            np.asarray(vals),
            np.asarray(idx),
        )
