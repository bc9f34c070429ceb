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

from .constants import INF, VariableStatus
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


def triangular_crash(model: Model, options: SolveOptions = None) -> Solution:
    """Structural triangular crash basis (reference: ClpSimplex::crash,
    ClpSimplex.hpp:562 / ClpSimplex.cpp — Bixby-style column selection).

    Greedily assigns columns to pivot rows so that, ordered by assignment
    time, each selected column has its pivot as the ONLY nonzero in
    not-yet-assigned rows. The selected columns plus the remaining slacks
    then form a permuted-triangular basis: guaranteed nonsingular, no
    factorization risk, and on structured LPs (staircase, transport) it
    captures a large fraction of the rows so the simplex starts far from
    the all-slack corner.

    Host-side and O(passes * nnz): this is setup work, not compute-path
    work, mirroring where the reference runs it (before startup()).
    Returns a status-only warm Solution consumed by simplex_solve.

    Measured (CPU, staircase 640x1360): captures 382/640 rows but COSTS
    iterations vs the all-slack start (dual 1079 -> 1202, primal 3838 ->
    5362) — steepest-edge pricing from the clean all-slack corner beats
    a structural basis whose nonbasic slacks park dual-infeasibly. Kept
    as opt-in capability parity (`crash="triangular"`), not auto-wired,
    same rationale as the idiot-primal measurement in _auto_idiot.
    """
    A = model.matrix.tocsc()
    m, n = A.shape
    cl = np.asarray(model.col_lower, dtype=np.float64)
    cu = np.asarray(model.col_upper, dtype=np.float64)
    rl = np.asarray(model.row_lower, dtype=np.float64)
    ru = np.asarray(model.row_upper, dtype=np.float64)
    obj = np.asarray(model.objective, dtype=np.float64)
    sense = model.optimization_direction if model.optimization_direction != 0 else 1.0

    counts = np.diff(A.indptr)
    has_lo = cl > -INF
    has_up = cu < INF
    fixed = has_lo & has_up & (cu - cl < 1e-12)
    # preference: free columns first (they should be basic in any optimal
    # basis), then single-bound, then boxed; fewer nonzeros break ties
    type_score = np.where(~has_lo & ~has_up, 0,
                          np.where(has_lo ^ has_up, 1, 2))
    type_score = np.where(fixed | (counts == 0), 9, type_score)
    order = np.lexsort((counts, type_score))
    order = order[type_score[order] < 9]

    indptr, indices, data = A.indptr, A.indices, A.data
    row_done = np.zeros(m, dtype=bool)
    col_row = np.full(n, -1, dtype=np.int64)
    # rows whose slack has no finite bound must keep it basic
    row_eligible = (rl > -INF) | (ru < INF)
    changed = True
    while changed:
        changed = False
        for j in order:
            if col_row[j] >= 0:
                continue
            s, e = indptr[j], indptr[j + 1]
            rows = indices[s:e]
            vals = data[s:e]
            live = ~row_done[rows] & row_eligible[rows]
            if np.count_nonzero(live) != 1:
                continue
            k = np.flatnonzero(live)[0]
            if abs(vals[k]) < 1e-2 * np.max(np.abs(vals)):
                continue  # pivot too small relative to its column
            row_done[rows[k]] = True
            col_row[j] = rows[k]
            changed = True

    col_status = np.empty(n, dtype=np.int8)
    csense = obj * sense
    for j in range(n):
        if col_row[j] >= 0:
            col_status[j] = int(VariableStatus.BASIC)
        elif fixed[j]:
            col_status[j] = int(VariableStatus.FIXED)
        elif has_lo[j] and (csense[j] >= 0 or not has_up[j]):
            col_status[j] = int(VariableStatus.AT_LOWER)
        elif has_up[j]:
            col_status[j] = int(VariableStatus.AT_UPPER)
        else:
            col_status[j] = int(VariableStatus.FREE)
    row_status = np.empty(m, dtype=np.int8)
    for i in range(m):
        if not row_done[i]:
            row_status[i] = int(VariableStatus.BASIC)
        elif rl[i] > -INF:
            row_status[i] = int(VariableStatus.AT_LOWER)
        else:
            row_status[i] = int(VariableStatus.AT_UPPER)
    return Solution(column_status=col_status, row_status=row_status)


def apply_idiot_crash(model: Model, passes: int = 30) -> int:
    """C-API/CLI helper (Clp_idiot role, Clp_C_Interface.h): run the
    idiot descent and leave the point on model.solution so a values-pass
    solve (dual(1)/primal(1)) starts from it."""
    from .options import SolveOptions

    sol = idiot_crash(model, SolveOptions(idiot_passes=int(passes)))
    model.solution.primal = np.asarray(sol.primal, dtype=np.float64)
    model.solution.row_activity = np.asarray(
        model.matrix @ model.solution.primal, dtype=np.float64)
    return 0


def apply_triangular_crash(model: Model) -> int:
    """C-API helper (Clp_crash with pivot != 0): build the structural
    triangular basis and load it as the pending warm start."""
    w = triangular_crash(model)
    model.set_basis_status(w.column_status, w.row_status)
    return 0
