"""Branch-and-bound support: hot starts and batched strong branching.

Reference surface: OsiClp's markHotStart/solveFromHotStart
(OsiClpSolverInterface.hpp:321-325 -> ClpSimplexDual::strongBranching,
ClpSimplexDual.cpp:6965) and the ClpNode fathom machinery
(ClpSimplex.hpp:589). TPU-native twist: strong branching evaluates ALL
candidate bound changes as one vmapped batch of warm dual solves — the
reference loops candidates serially on one core.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np

from .constants import INF, ProblemStatus, SolveMethod
from .model import Model, Solution
from .options import SolveOptions


@dataclasses.dataclass
class HotStart:
    """Saved basis + bounds snapshot (markHotStart equivalent)."""

    column_status: np.ndarray
    row_status: np.ndarray
    col_lower: np.ndarray
    col_upper: np.ndarray
    objective_value: float


def mark_hot_start(model: Model) -> HotStart:
    sol = model.solution
    if sol.column_status is None:
        raise ValueError("hot start requires a solved basis")
    return HotStart(
        column_status=sol.column_status.copy(),
        row_status=sol.row_status.copy(),
        col_lower=model.col_lower.copy(),
        col_upper=model.col_upper.copy(),
        objective_value=sol.objective_value,
    )


def solve_from_hot_start(
    model: Model,
    hot: HotStart,
    column: int,
    new_lower: Optional[float] = None,
    new_upper: Optional[float] = None,
    max_iterations: int = 1000,
) -> Solution:
    """Warm dual re-solve after one bound change; model state restored."""
    from .simplex.driver import simplex_solve

    saved_l = model.col_lower.copy()
    saved_u = model.col_upper.copy()
    try:
        if new_lower is not None:
            model.col_lower = model.col_lower.copy()
            model.col_lower[column] = new_lower
        if new_upper is not None:
            model.col_upper = model.col_upper.copy()
            model.col_upper[column] = new_upper
        opts = SolveOptions(method=SolveMethod.DUAL_SIMPLEX, max_iterations=max_iterations)
        opts.presolve.enabled = False
        warm = Solution(column_status=hot.column_status, row_status=hot.row_status)
        return simplex_solve(model, opts, dual=True, warm=warm)
    finally:
        model.col_lower = saved_l
        model.col_upper = saved_u


@dataclasses.dataclass
class BranchResult:
    column: int
    direction: str  # "down" | "up"
    status: ProblemStatus
    objective: float
    iterations: int


def strong_branch(
    model: Model,
    columns: Sequence[int],
    values: Optional[Sequence[float]] = None,
    max_iterations: int = 500,
) -> list[BranchResult]:
    """Evaluate floor/ceil branches for each candidate column, batched.

    Builds 2*len(columns) same-shape bound-modified models and solves them
    as one vmapped dual-simplex batch (parallel.batch.solve_batch_dual_simplex).
    """
    from .parallel.batch import solve_batch_dual_simplex

    x = model.solution.primal
    if x is None:
        raise ValueError("strong branching requires a solved relaxation")
    vals = list(values) if values is not None else [float(x[j]) for j in columns]

    branch_models: list[Model] = []
    descr: list[tuple[int, str]] = []
    for j, v in zip(columns, vals):
        down = model.copy()
        down.col_upper = down.col_upper.copy()
        down.col_upper[j] = np.floor(v)
        branch_models.append(down)
        descr.append((j, "down"))
        up = model.copy()
        up.col_lower = up.col_lower.copy()
        up.col_lower[j] = np.ceil(v)
        branch_models.append(up)
        descr.append((j, "up"))

    opts = SolveOptions(
        method=SolveMethod.DUAL_SIMPLEX, max_iterations=max_iterations
    )
    opts.presolve.enabled = False
    sols = solve_batch_dual_simplex(branch_models, opts)
    return [
        BranchResult(j, d, s.status, s.objective_value, s.iterations)
        for (j, d), s in zip(descr, sols)
    ]
