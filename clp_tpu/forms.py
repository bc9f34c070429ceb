"""Host -> device problem forms.

Both solver families consume one *computational standard form*:

    minimize  c'v   s.t.  G v = b,   l <= v <= u

built from the user form (rl <= Ax <= ru, cl <= x <= cu) by appending one
slack per row:  G = [A | -I],  b = 0,  slack bounds = [rl, ru].  This mirrors
the reference's internal convention of treating rows as bounded "logical"
variables (ClpSimplex status bytes cover rows and columns alike,
ClpSimplex.hpp:119-126), but collapses Clp's six matrix classes into a single
dense device array (kernel-selection metadata lives on the host Model,
Model.detect_structure()).

For the interior-point path, fixed variables (l == u) are additionally
substituted out on the host (the reference handles them via
ClpInterior::fixFixed, ClpInterior.cpp:1090-1113); the simplex path keeps
them (a fixed variable is just a bound pair).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .constants import INF


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class StandardLP:
    """Dense standard-form LP/QP on device:
        min c'v + (1/2) v'Qv   s.t.  Gv=b,  l<=v<=u   (Q optional).

    A pytree — safe to vmap/shard over an added leading batch axis.
    """

    G: jnp.ndarray  # (m, nt)
    b: jnp.ndarray  # (m,)
    c: jnp.ndarray  # (nt,)
    l: jnp.ndarray  # (nt,)  -inf allowed
    u: jnp.ndarray  # (nt,)  +inf allowed
    Q: Optional[jnp.ndarray] = None  # (nt, nt) PSD, or None for pure LP

    @property
    def m(self) -> int:
        return self.G.shape[-2]

    @property
    def nt(self) -> int:
        return self.G.shape[-1]


@dataclasses.dataclass
class FormInfo:
    """Static host-side bookkeeping to map device solutions back."""

    n: int  # structural columns
    m: int  # rows
    sense: float  # +1 min, -1 max
    offset: float
    # for the IPM form: indices of kept (non-fixed) variables among the
    # nt = n + m standard-form variables, and the fixed values of the rest.
    kept: Optional[np.ndarray] = None
    fixed_values: Optional[np.ndarray] = None


def to_standard_form(model, dtype=jnp.float64) -> tuple[StandardLP, FormInfo]:
    """User form -> [A | -I] equality standard form (simplex flavor)."""
    A = np.asarray(model.matrix.todense(), dtype=np.float64)
    m, n = A.shape
    sense = model.optimization_direction if model.optimization_direction != 0 else 1.0
    G = np.concatenate([A, -np.eye(m)], axis=1)
    c = np.concatenate([model.objective * sense, np.zeros(m)])
    l = np.concatenate([model.col_lower, model.row_lower])
    u = np.concatenate([model.col_upper, model.row_upper])
    l = np.where(l <= -INF, -np.inf, l)
    u = np.where(u >= INF, np.inf, u)
    b = np.zeros(m)
    Q_dev = None
    if model.quadratic_objective is not None:
        nt = n + m
        Qfull = np.zeros((nt, nt))
        Qfull[:n, :n] = np.asarray(model.quadratic_objective.todense()) * sense
        Q_dev = jnp.asarray(Qfull, dtype)
    lp = StandardLP(
        G=jnp.asarray(G, dtype),
        b=jnp.asarray(b, dtype),
        c=jnp.asarray(c, dtype),
        l=jnp.asarray(l, dtype),
        u=jnp.asarray(u, dtype),
        Q=Q_dev,
    )
    info = FormInfo(n=n, m=m, sense=sense, offset=model.objective_offset)
    return lp, info


def to_ipm_form(model, dtype=jnp.float64) -> tuple[StandardLP, FormInfo]:
    """Standard form with fixed variables substituted out (IPM flavor)."""
    A = np.asarray(model.matrix.todense(), dtype=np.float64)
    m, n = A.shape
    sense = model.optimization_direction if model.optimization_direction != 0 else 1.0
    G = np.concatenate([A, -np.eye(m)], axis=1)
    c = np.concatenate([model.objective * sense, np.zeros(m)])
    l = np.concatenate([model.col_lower, model.row_lower])
    u = np.concatenate([model.col_upper, model.row_upper])
    l = np.where(l <= -INF, -np.inf, l)
    u = np.where(u >= INF, np.inf, u)

    fixed = l == u
    kept = np.flatnonzero(~fixed)
    fixed_idx = np.flatnonzero(fixed)
    b = np.zeros(m)
    if fixed_idx.size:
        b = b - G[:, fixed_idx] @ l[fixed_idx]
    offset_extra = float(c[fixed_idx] @ l[fixed_idx]) if fixed_idx.size else 0.0

    Q_dev = None
    np_dtype = np.dtype(jnp.dtype(dtype).name)
    if model.quadratic_objective is not None:
        nt = n + m
        Qfull = np.zeros((nt, nt))
        Qfull[:n, :n] = np.asarray(model.quadratic_objective.todense()) * sense
        if fixed_idx.size:
            vals = l[fixed_idx]
            # cross terms with fixed variables fold into c and the offset
            c = c + Qfull[:, fixed_idx] @ vals
            offset_extra += 0.5 * float(vals @ (Qfull[np.ix_(fixed_idx, fixed_idx)] @ vals))
            # (c got the full cross term incl. fixed rows; kept slice below)
        Q_dev = Qfull[np.ix_(kept, kept)].astype(np_dtype)

    # HOST arrays by design (round 5): every un-jitted device op through
    # the axon tunnel compiles server-side (~1 s each) — the old
    # device-side shape-bucket padding alone cost 7.5 s per NEW shape.
    # Padding, RCM row permutation, and bucket assembly now run as free
    # numpy ops; jit dispatch device-puts the final arrays exactly once.
    lp = StandardLP(
        G=np.ascontiguousarray(G[:, kept], dtype=np_dtype),
        b=b.astype(np_dtype),
        c=c[kept].astype(np_dtype),
        l=l[kept].astype(np_dtype),
        u=u[kept].astype(np_dtype),
        Q=Q_dev,
    )
    fixed_values = np.where(fixed, l, 0.0)
    info = FormInfo(
        n=n,
        m=m,
        sense=sense,
        offset=model.objective_offset + offset_extra * sense,
        kept=kept,
        fixed_values=fixed_values,
    )
    return lp, info


def expand_ipm_solution(info: FormInfo, v_kept: np.ndarray) -> np.ndarray:
    """Re-insert fixed variables into the nt = n + m vector."""
    nt = info.n + info.m
    v = np.array(info.fixed_values, dtype=np.float64, copy=True)
    v[info.kept] = np.asarray(v_kept, dtype=np.float64)
    assert v.shape == (nt,)
    return v
