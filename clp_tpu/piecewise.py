"""Piecewise-linear convex objective costs.

The reference supports convex piecewise-linear costs per variable through
ClpNonLinearCost (ClpNonLinearCost.hpp:8-28, "also implements piecewise
linear convex costs" per SURVEY.md). Here the capability is provided by the
classical exact reformulation: split the variable into one bounded segment
variable per linear piece. Convexity (nondecreasing slopes) guarantees the
LP fills segments in order, so the reformulation is exact — and it keeps
the device kernels oblivious to cost shapes (fixed-shape friendly).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import scipy.sparse as sp

from .constants import INF
from .model import Model


@dataclasses.dataclass
class PiecewiseInfo:
    """Mapping to recover original-variable values after a solve."""

    column: int  # original column index
    segment_columns: list  # column indices of the segments (post-reform)
    breakpoints: np.ndarray
    slopes: np.ndarray


def set_piecewise_linear_cost(
    model: Model, column: int, breakpoints, slopes
) -> PiecewiseInfo:
    """Replace column's linear cost with a convex piecewise-linear one.

    breakpoints: ascending values b_0 < b_1 < ... < b_k covering the
      variable's domain (b_0 must equal the lower bound; b_k the upper, or
      +inf for an unbounded last piece).
    slopes: k slopes, one per piece [b_i, b_i+1], nondecreasing (convex).

    The column is rewritten in place: x_col is replaced by
      x = b_0 + sum_i s_i,  s_i in [0, b_{i+1} - b_i],  cost slope_i s_i.
    The first segment reuses the original column; extra segments are
    appended (same matrix column). Returns the mapping (original value =
    b_0 + sum of segment values).
    """
    b = np.asarray(breakpoints, dtype=np.float64)
    s = np.asarray(slopes, dtype=np.float64)
    if b.ndim != 1 or s.ndim != 1 or b.size != s.size + 1:
        raise ValueError("need k+1 breakpoints for k slopes")
    if np.any(np.diff(b) <= 0):
        raise ValueError("breakpoints must be strictly increasing")
    if np.any(np.diff(s) < -1e-12):
        raise ValueError("slopes must be nondecreasing (convex cost)")
    j = column
    lo, up = model.col_lower[j], model.col_upper[j]
    if abs(b[0] - lo) > 1e-9 * (1 + abs(lo)):
        raise ValueError("first breakpoint must equal the column lower bound")
    k = s.size

    col = model.matrix[:, j]
    # shift: x = b0 + sum s_i  =>  A x contributes A[:,j]*b0 to activities
    shift = np.asarray((col * b[0]).todense()).ravel()
    model.row_lower = np.where(model.row_lower > -INF, model.row_lower - shift, model.row_lower)
    model.row_upper = np.where(model.row_upper < INF, model.row_upper - shift, model.row_upper)
    model.objective_offset += 0.0  # cost measured from b0 with segment slopes

    # first segment reuses column j
    model.col_lower = model.col_lower.copy()
    model.col_upper = model.col_upper.copy()
    model.objective = model.objective.copy()
    model.col_lower[j] = 0.0
    model.col_upper[j] = b[1] - b[0]
    model.objective[j] = s[0]

    seg_cols = [j]
    if k > 1:
        extra = sp.hstack([col] * (k - 1), format="csc")
        widths = np.diff(b)[1:]
        uppers = np.where(np.isfinite(widths), widths, INF)
        start = model.num_cols
        model.add_columns(extra, lower=np.zeros(k - 1), upper=uppers, objective=s[1:])
        seg_cols += list(range(start, start + k - 1))
    return PiecewiseInfo(j, seg_cols, b, s)


def recover_piecewise_value(model: Model, info: PiecewiseInfo) -> float:
    """Original variable value = b_0 + sum of segment values."""
    x = model.solution.primal
    return float(info.breakpoints[0] + sum(x[c] for c in info.segment_columns))
