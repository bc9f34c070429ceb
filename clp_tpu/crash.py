"""Crash-basis construction — the Idiot equivalent.

The reference's Idiot crash (Idiot.hpp:70-90, IdiSolve.cpp, Idiot.cpp:399,
1324) is a mu-scheduled quadratic-penalty descent: repeated "major"
iterations of approximate minimization of  mu*c'x + (1/2)||viol(Ax)||^2
with mu dropped whenever infeasibility progress stalls, producing an
approximate primal point that warm-starts the simplex.

TPU redesign: the same major/minor schedule, but each major is an
accelerated (FISTA) projected-gradient sweep under one jit — a
`lax.scan` of majors over `lax.fori_loop` minors, all dense matvecs on
the MXU. The result warm-starts the primal simplex via the
crossover-slam path in simplex.driver.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .constants import INF
from .model import Model, Solution
from .options import SolveOptions


@partial(jax.jit, static_argnames=("majors", "minors"))
def _idiot_descend(A, c, rl, ru, cl, cu, x0, w0, majors: int, minors: int):
    # spectral Lipschitz estimate ||A||_2^2 via a few power iterations —
    # a valid global step for the full-gradient FISTA sweep (a diagonal
    # estimate is only valid coordinate-wise and diverges here)
    def power(k, v):
        v = A.T @ (A @ v)
        return v / (jnp.linalg.norm(v) + 1e-30)

    v0 = jnp.ones(A.shape[1], A.dtype) / jnp.sqrt(A.shape[1])
    v0 = jax.lax.fori_loop(0, 8, power, v0)
    lip = jnp.linalg.norm(A @ v0) ** 2 * 1.05 + 1e-12

    def minor(k, carry):
        x, v, w = carry  # v: momentum (look-ahead) point
        ax = A @ v
        viol = ax - jnp.clip(ax, rl, ru)
        grad = w * c + viol @ A
        x_new = jnp.clip(v - grad / lip, cl, cu)
        beta = k / (k + 3.0)  # FISTA-style momentum
        v_new = x_new + beta * (x_new - x)
        return x_new, v_new, w

    def major(carry, _):
        x, w, best_infeas = carry
        x, _, _ = jax.lax.fori_loop(0, minors, minor, (x, x, w))
        ax = A @ x
        infeas = jnp.linalg.norm(ax - jnp.clip(ax, rl, ru))
        # mu schedule (Idiot drop logic): infeasibility stalled -> shrink
        # the objective weight so the penalty dominates and feasibility
        # improves; otherwise keep pressing the objective
        stalled = infeas > 0.9 * best_infeas
        w = jnp.where(stalled, w * 0.25, w)
        best_infeas = jnp.minimum(best_infeas, infeas)
        return (x, w, best_infeas), infeas

    (x, _, _), _ = jax.lax.scan(
        major, (x0, w0, jnp.asarray(jnp.inf, x0.dtype)), None, length=majors
    )
    return x


def idiot_crash(model: Model, options: SolveOptions) -> Solution:
    """Mu-scheduled penalty descent -> approximate point for warm start."""
    A = jnp.asarray(model.matrix.todense())
    sense = model.optimization_direction if model.optimization_direction != 0 else 1.0
    c = jnp.asarray(model.objective * sense)
    rl = jnp.asarray(np.where(model.row_lower <= -INF, -np.inf, model.row_lower))
    ru = jnp.asarray(np.where(model.row_upper >= INF, np.inf, model.row_upper))
    cl = jnp.asarray(np.where(model.col_lower <= -INF, -np.inf, model.col_lower))
    cu = jnp.asarray(np.where(model.col_upper >= INF, np.inf, model.col_upper))
    x0 = jnp.clip(jnp.zeros(model.num_cols), cl, cu)
    # idiot_passes plays the reference's majorIterations role
    majors = max(10, options.idiot_passes or 30)
    minors = 25
    cscale = 1.0 + float(jnp.max(jnp.abs(c), initial=0.0))
    x = _idiot_descend(A, c, rl, ru, cl, cu, x0, 10.0 / cscale, majors, minors)
    return Solution(primal=np.asarray(x))
