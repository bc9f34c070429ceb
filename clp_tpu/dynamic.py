"""Dynamic-matrix simplex: in-loop column generation over a bounded
working set (the ClpDynamicMatrix / ClpGubDynamicMatrix capability,
ClpDynamicMatrix.hpp:8-16).

TPU-first design: the working set is a FIXED-SIZE block of column slots in
the device matrix. Pricing happens INSIDE the simplex loop at
refactorization boundaries (the reference prices in partialPricing hooks at
the same cadence): after each jitted chunk of pivots, the column source is
priced with the current duals; attractive columns are swapped INto
nonbasic slots (device scatter on the same arrays — shapes never change,
so the chunk kernel never recompiles), unattractive nonbasic columns swap
out. The basis always references slots, so warm state survives every swap.

This differs from sprint.py (which rebuilds a new sub-MODEL each pass and
re-enters the solver): here one engine state machine runs start-to-finish
and the matrix mutates under it — the dynamic-matrix semantics.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import numpy as np
import jax.numpy as jnp

from .constants import INF, ProblemStatus, VariableStatus
from .forms import StandardLP
from .model import Model, Solution
from .options import SolveOptions
from .simplex import engine


class ColumnSource:
    """Supplies columns on demand (ClpDynamicMatrix's createVariable role).

    Implement:
      n_total          — number of columns in the (possibly huge) universe,
                         or -1 when columns are generated (cutting stock)
      initial(k)       — k starting columns: (cols (m,k) ndarray, cost,
                         lower, upper, ids)
      price(y, k)      — up to k attractive columns given duals y, with
                         reduced cost < -tol: same tuple shape; ids must be
                         stable so duplicates can be filtered
    """

    n_total: int = -1

    def initial(self, k: int):
        raise NotImplementedError

    def price(self, y: np.ndarray, k: int):
        raise NotImplementedError


class ExplicitColumnSource(ColumnSource):
    """Universe given as an explicit matrix (ClpDynamicMatrix's stored
    whole-matrix mode): pricing is one dense dj sweep."""

    def __init__(self, A, cost, lower=None, upper=None, dual_tol=1e-7):
        A = np.asarray(A.todense()) if hasattr(A, "todense") else np.asarray(A)
        self.A = A
        self.cost = np.asarray(cost, dtype=np.float64)
        n = A.shape[1]
        self.lower = np.zeros(n) if lower is None else np.asarray(lower, float)
        self.upper = np.full(n, INF) if upper is None else np.asarray(upper, float)
        self.n_total = n
        self.dual_tol = dual_tol

    def initial(self, k: int):
        order = np.argsort(self.cost)
        ids = order[: min(k, self.n_total)]
        return self.A[:, ids], self.cost[ids], self.lower[ids], self.upper[ids], ids

    def price(self, y: np.ndarray, k: int, exclude=()):
        dj = self.cost - y @ self.A
        dj[list(exclude)] = np.inf
        order = np.argsort(dj)
        ids = [int(j) for j in order[:k] if dj[j] < -self.dual_tol]
        ids = np.asarray(ids, dtype=np.int64)
        return self.A[:, ids], self.cost[ids], self.lower[ids], self.upper[ids], ids


def dynamic_simplex_solve(
    row_lower: np.ndarray,
    row_upper: np.ndarray,
    source: ColumnSource,
    working_set: int = 0,
    options: Optional[SolveOptions] = None,
    max_rounds: int = 200,
) -> tuple[Solution, dict]:
    """Solve min c'x s.t. rl <= A x <= ru, l <= x <= u with columns drawn
    from `source`, keeping at most `working_set` columns device-resident.

    Returns (solution-over-the-universe-ids, info). solution.primal is a
    dict-like pair (ids, values) exposed via info; the Solution carries the
    working-set values with info['ids'] giving universe ids per slot.
    """
    options = options or SolveOptions()
    rl = np.asarray(row_lower, dtype=np.float64)
    ru = np.asarray(row_upper, dtype=np.float64)
    m = rl.size
    ws = working_set or max(3 * m, 64)
    if source.n_total >= 0:
        ws = min(ws, source.n_total)

    cols, cost, lo, up, ids = source.initial(ws)
    k0 = cols.shape[1]
    if k0 < ws:  # pad with dummy fixed columns (never enter)
        pad = ws - k0
        cols = np.concatenate([cols, np.zeros((m, pad))], axis=1)
        cost = np.concatenate([cost, np.zeros(pad)])
        lo = np.concatenate([lo, np.zeros(pad)])
        up = np.concatenate([up, np.zeros(pad)])
        ids = np.concatenate([ids, np.full(pad, -1, dtype=np.int64)])
    ids = np.asarray(ids, dtype=np.int64).copy()

    # standard form arrays (working columns + slacks), device-resident
    G = jnp.asarray(np.concatenate([cols, -np.eye(m)], axis=1))
    c = jnp.asarray(np.concatenate([cost, np.zeros(m)]))
    l = jnp.asarray(
        np.concatenate([lo, np.where(rl <= -INF, -np.inf, rl)])
    )
    u = jnp.asarray(
        np.concatenate([up, np.where(ru >= INF, np.inf, ru)])
    )
    lp = StandardLP(G=G, b=jnp.zeros(m), c=c, l=l, u=u)

    opts = engine.SimplexOptions(
        refactor_frequency=options.refactor_frequency or 100,
        max_iterations=options.max_iterations or 200000,
    )
    state = engine.initial_state(lp, opts)

    dual_tol = 1e-7
    total_swaps = 0
    rounds = 0
    seen_optimal = False
    for rounds in range(max_rounds):
        # run primal chunks until the working-set LP claims verified optimal
        while True:
            state, verified, obj = engine.primal_chunk(lp, state, opts)
            st = int(state.status)
            if bool(verified) or st not in (engine.CONTINUE, engine.OPTIMAL):
                break
        if st != engine.OPTIMAL:
            break

        # in-loop pricing with the current duals
        y = np.asarray(state.y)
        exclude = set(int(i) for i in ids if i >= 0)
        new_cols, new_cost, new_lo, new_up, new_ids = source.price(
            y, max(1, ws // 4), exclude=exclude
        ) if isinstance(source, ExplicitColumnSource) else source.price(
            y, max(1, ws // 4)
        )
        if getattr(new_ids, "size", len(new_ids)) == 0:
            seen_optimal = True
            break
        # generated sources may return columns already in the set: filter
        fresh = [t for t in range(len(new_ids)) if int(new_ids[t]) not in exclude]
        if not fresh:
            seen_optimal = True
            break

        # swap-out candidates: nonbasic slots at a zero-valued bound with
        # comfortably non-negative dj (never a basic slot: basis stays valid)
        vstat = np.asarray(state.vstat)
        dj = np.asarray(state.dj)
        lo_h = np.asarray(lp.l)
        # at working-set optimality every nonbasic-at-lower slot has
        # dj >= -tol; all of them (at a zero-valued lower bound) are safe
        # to evict — removal changes nothing about the current solution
        swappable = [
            s
            for s in range(ws)
            if vstat[s] == engine.AT_LOWER
            and abs(lo_h[s]) < 1e-12
            and (dj[s] >= -dual_tol or ids[s] < 0)
        ]
        # prefer evicting dummies, then the least attractive columns
        swappable.sort(key=lambda s: (ids[s] >= 0, -dj[s]))
        if len(swappable) < len(fresh):
            # saturation: columns pinned basic/at-upper leave no slots.
            # Grow the working set geometrically (ClpDynamicMatrix grows its
            # gub-column store the same way); slacks stay at the end, so
            # basis/vstat indices >= ws shift by `grow`.
            grow = max(ws // 2, len(fresh) - len(swappable))
            Gh = np.asarray(lp.G)
            ch = np.asarray(lp.c)
            lh = np.asarray(lp.l)
            uh = np.asarray(lp.u)
            zpad = np.zeros((m, grow))
            lp = StandardLP(
                G=jnp.asarray(np.concatenate([Gh[:, :ws], zpad, Gh[:, ws:]], axis=1)),
                b=lp.b,
                c=jnp.asarray(np.concatenate([ch[:ws], np.zeros(grow), ch[ws:]])),
                l=jnp.asarray(np.concatenate([lh[:ws], np.zeros(grow), lh[ws:]])),
                u=jnp.asarray(np.concatenate([uh[:ws], np.zeros(grow), uh[ws:]])),
            )
            vst = np.asarray(state.vstat)
            djh = np.asarray(state.dj)
            wch = np.asarray(state.wcol)
            basis_h = np.asarray(state.basis)
            basis_h = np.where(basis_h >= ws, basis_h + grow, basis_h)
            state = dataclasses.replace(
                state,
                basis=jnp.asarray(basis_h, jnp.int32),
                vstat=jnp.asarray(
                    np.concatenate(
                        [vst[:ws], np.full(grow, engine.AT_LOWER, vst.dtype), vst[ws:]]
                    )
                ),
                dj=jnp.asarray(np.concatenate([djh[:ws], np.zeros(grow), djh[ws:]])),
                wcol=jnp.asarray(np.concatenate([wch[:ws], np.ones(grow), wch[ws:]])),
            )
            ids = np.concatenate([ids, np.full(grow, -1, dtype=np.int64)])
            swappable += list(range(ws, ws + grow))
            ws += grow
            lo_h = np.asarray(lp.l)
        n_swap = min(len(fresh), len(swappable))
        if n_swap == 0:
            break  # saturated: stop WITHOUT claiming universe optimality
        G_h = None
        for t, slot in zip(fresh[:n_swap], swappable[:n_swap]):
            colv = np.asarray(new_cols)[:, t]
            lp = dataclasses.replace(
                lp,
                G=lp.G.at[:, slot].set(jnp.asarray(colv)),
                c=lp.c.at[slot].set(float(np.asarray(new_cost)[t])),
                l=lp.l.at[slot].set(float(np.asarray(new_lo)[t])),
                u=lp.u.at[slot].set(float(np.asarray(new_up)[t])),
            )
            ids[slot] = int(new_ids[t])
            total_swaps += 1
        # re-open the state: statuses stay, next chunk refactorizes + reprices
        state = dataclasses.replace(
            state, status=jnp.asarray(engine.CONTINUE, jnp.int32)
        )

    # extract
    xn = engine.nonbasic_values(lp, state.vstat, opts.dual_bound)
    xfull = np.array(xn)  # writable copy
    xfull[np.asarray(state.basis)] = np.asarray(state.xb)
    x_ws = xfull[:ws]
    y = np.asarray(state.y)
    obj_val = float(np.asarray(lp.c[:ws]) @ x_ws)
    status = (
        ProblemStatus.OPTIMAL
        if seen_optimal and int(state.status) == engine.OPTIMAL
        else {
            engine.OPTIMAL: ProblemStatus.OPTIMAL,
            engine.PRIMAL_INFEASIBLE: ProblemStatus.PRIMAL_INFEASIBLE,
            engine.DUAL_INFEASIBLE: ProblemStatus.DUAL_INFEASIBLE,
            engine.ITER_LIMIT: ProblemStatus.STOPPED,
        }.get(int(state.status), ProblemStatus.ERRORS)
    )
    sol = Solution(
        status=status,
        objective_value=obj_val,
        primal=x_ws,
        duals=y,
        reduced_costs=np.asarray(state.dj)[:ws],
        row_activity=np.asarray(lp.G[:, :ws]) @ x_ws,
        iterations=int(state.iterations),
    )
    info = {
        "ids": ids.copy(),
        "rounds": rounds + 1,
        "swaps": total_swaps,
        "working_set": ws,
        "proved_optimal_over_universe": seen_optimal,
    }
    return sol, info
