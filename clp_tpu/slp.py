"""Sequential LP for smooth nonlinear objectives.

Reference: ClpSimplex::nonlinearSLP (ClpSimplex.hpp:357-371,
ClpSimplexNonlinear::primalSLP :2929) — minimize a smooth nonlinear
objective over the LP feasible region by iterating: linearize at x_k, add a
trust region, solve the LP warm, accept/shrink. The objective is a Python
callable; gradients come from the caller or jax.grad when the callable is
jax-traceable.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

from .constants import ProblemStatus, SolveMethod
from .model import Model, Solution
from .options import SolveOptions


def nonlinear_slp(
    model: Model,
    objective: Callable[[np.ndarray], float],
    gradient: Optional[Callable[[np.ndarray], np.ndarray]] = None,
    max_passes: int = 50,
    initial_trust: float = 1.0,
    tol: float = 1e-7,
) -> Solution:
    """Minimize `objective(x)` subject to the model's constraints/bounds.

    The model's linear objective is ignored; its rows and bounds define the
    feasible region. Returns a Solution with the nonlinear objective value.
    """
    if gradient is None:
        import jax

        gradient = lambda x: np.asarray(jax.grad(objective)(x))  # noqa: E731

    from .simplex.driver import simplex_solve

    opts = SolveOptions(method=SolveMethod.PRIMAL_SIMPLEX)
    opts.presolve.enabled = False

    # feasible starting point: solve with zero objective
    work = model.copy()
    work.objective = np.zeros(model.num_cols)
    sol = simplex_solve(work, opts, dual=False)
    if sol.status != ProblemStatus.OPTIMAL:
        return sol
    x = np.asarray(sol.primal, dtype=np.float64)
    fx = float(objective(x))
    trust = initial_trust
    warm = sol

    for it in range(max_passes):
        g = np.asarray(gradient(x), dtype=np.float64)
        lin = model.copy()
        lin.objective = g
        lin.optimization_direction = 1.0
        # trust region: intersect bounds with a box around x
        lin.col_lower = np.maximum(model.col_lower, x - trust)
        lin.col_upper = np.minimum(model.col_upper, x + trust)
        s = simplex_solve(lin, opts, dual=False, warm=warm)
        if s.status != ProblemStatus.OPTIMAL:
            break
        x_new = np.asarray(s.primal)
        f_new = float(objective(x_new))
        pred = float(g @ (x_new - x))  # predicted (linear) decrease, <= 0
        if f_new < fx - 1e-12 * (1 + abs(fx)):
            # accept; expand trust if the linear model predicted well
            step = float(np.max(np.abs(x_new - x), initial=0.0))
            x, fx = x_new, f_new
            warm = s
            if step >= 0.9 * trust:
                trust *= 2.0
        else:
            trust *= 0.25
        if trust < tol * (1.0 + float(np.abs(x).max(initial=0.0))) or abs(pred) < tol * (
            1 + abs(fx)
        ):
            break

    out = Solution(
        status=ProblemStatus.OPTIMAL,
        objective_value=fx,
        primal=x,
        duals=warm.duals,
        reduced_costs=warm.reduced_costs,
        row_activity=model.matrix @ x,
        iterations=it + 1,
    )
    model.solution = out
    return out
