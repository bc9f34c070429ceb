"""Crash-basis construction — the Idiot equivalent.

The reference's Idiot crash (Idiot.hpp:70-90, IdiSolve.cpp) is a quadratic-
penalty coordinate descent producing an approximate primal point, then a
basis guess. Here: a jitted projected-gradient descent on the penalty

    f(x) = c'x + (mu/2) ||clip(Ax, rl, ru) - Ax||^2

(embarrassingly vectorizable — SURVEY.md §7 step 4), whose result warm-starts
the primal simplex via the crossover-slam path in simplex.driver.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .constants import INF
from .model import Model, Solution
from .options import SolveOptions


@partial(jax.jit, static_argnames=("iters",))
def _idiot_descend(A, c, rl, ru, cl, cu, x0, mu0, iters: int):
    def body(k, carry):
        x, mu = carry
        ax = A @ x
        viol = ax - jnp.clip(ax, rl, ru)
        grad = c + mu * (viol @ A)
        # diagonal Lipschitz estimate for the step
        lip = mu * jnp.sum(A * A, axis=0) + 1e-12
        x = jnp.clip(x - grad / lip, cl, cu)
        mu = mu * jnp.where((k % 20) == 19, 1.5, 1.0)
        return x, mu

    x, _ = jax.lax.fori_loop(0, iters, body, (x0, mu0))
    return x


def idiot_crash(model: Model, options: SolveOptions) -> Solution:
    """Penalty descent -> approximate point -> Solution for warm start."""
    A = jnp.asarray(model.matrix.todense())
    sense = model.optimization_direction if model.optimization_direction != 0 else 1.0
    c = jnp.asarray(model.objective * sense)
    rl = jnp.asarray(np.where(model.row_lower <= -INF, -np.inf, model.row_lower))
    ru = jnp.asarray(np.where(model.row_upper >= INF, np.inf, model.row_upper))
    cl = jnp.asarray(np.where(model.col_lower <= -INF, -np.inf, model.col_lower))
    cu = jnp.asarray(np.where(model.col_upper >= INF, np.inf, model.col_upper))
    x0 = jnp.clip(jnp.zeros(model.num_cols), cl, cu)
    iters = max(50, options.idiot_passes or 100)
    cscale = 1.0 + float(jnp.max(jnp.abs(c), initial=0.0))
    x = _idiot_descend(A, c, rl, ru, cl, cu, x0, 10.0 / cscale, iters)
    return Solution(primal=np.asarray(x))
