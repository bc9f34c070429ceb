"""GUB (generalized upper bound) structure handling.

Reference: ClpGubMatrix (ClpGubMatrix.hpp:12-20) keeps GUB row sets
implicit with one "key" variable per set. The TPU build keeps the rows
explicit in the dense frame (a handful of extra rows cost nothing on the
MXU) and instead exploits the structure where it actually pays here:

  - detect_gub: find disjoint unit-coefficient convexity rows
  - gub_crash_status: a GUB crash basis — the cheapest variable of each
    set made basic (the reference's key variable), everything else at
    lower, general-row slacks basic — a warm start that typically saves
    the phase-1 walk
  - GUB + column generation composes with clp_tpu.dynamic (the
    ClpGubDynamicMatrix capability): the column source tags each generated
    column with its set membership; the master keeps GUB rows explicit.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .constants import INF, VariableStatus
from .model import Model


@dataclasses.dataclass
class GubSet:
    row: int  # the GUB row index
    cols: np.ndarray  # member columns (unit coefficients in that row)
    lower: float  # row bounds (sum of members)
    upper: float


def detect_gub(model: Model, min_size: int = 2) -> list[GubSet]:
    """Find disjoint GUB rows: all-unit coefficient rows whose columns
    appear in no other GUB row (first-come keeps the row)."""
    A = model.matrix.tocsr()
    taken = np.zeros(model.num_cols, dtype=bool)
    sets: list[GubSet] = []
    for i in range(model.num_rows):
        s, e = A.indptr[i], A.indptr[i + 1]
        if e - s < min_size:
            continue
        if not np.allclose(A.data[s:e], 1.0):
            continue
        cols = A.indices[s:e]
        if taken[cols].any():
            continue
        sets.append(
            GubSet(
                row=i,
                cols=cols.copy(),
                lower=float(model.row_lower[i]),
                upper=float(model.row_upper[i]),
            )
        )
        taken[cols] = True
    return sets


def gub_crash_status(model: Model, sets: list[GubSet]):
    """Build (column_status, row_status) with one key variable per set
    basic (cheapest objective member — ClpGubMatrix's key choice) and the
    GUB-row slacks nonbasic at the binding bound; all other rows' slacks
    basic. Feed as a warm Solution to simplex_solve."""
    n, m = model.num_cols, model.num_rows
    cstat = np.full(n, int(VariableStatus.AT_LOWER), dtype=np.int8)
    rstat = np.full(m, int(VariableStatus.BASIC), dtype=np.int8)
    c = model.objective * (model.optimization_direction or 1.0)
    for gs in sets:
        key = int(gs.cols[np.argmin(c[gs.cols])])
        cstat[key] = int(VariableStatus.BASIC)
        # the key variable replaces the GUB slack in the basis; park the
        # slack at whichever bound exists (equality rows: FIXED)
        if gs.lower == gs.upper:
            rstat[gs.row] = int(VariableStatus.FIXED)
        elif gs.lower > -INF:
            rstat[gs.row] = int(VariableStatus.AT_LOWER)
        else:
            rstat[gs.row] = int(VariableStatus.AT_UPPER)
    return cstat, rstat
