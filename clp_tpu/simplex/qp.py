"""QP primal simplex — reduced-gradient active-set method, jitted.

The TPU-native counterpart of ClpSimplexNonlinear's primal QP
(ClpSimplexNonlinear.cpp:33 primal, :773 directionVector): minimize
c'x + 0.5 x'Qx over Gx = b, l <= x <= u from a primal-feasible basis.

Per iteration (all fixed-shape, jit/vmap-safe):
  gradient   g  = c + Qx
  duals      y  = g_B @ binv          (B' y = g_B)
  reduced    dj = g - y @ G
  choose a driving variable q: nonbasic-at-bound with wrong-sign dj, or a
  superbasic (FREE status) with |dj| > tol
  direction  d_B = -+ binv @ G[:, q]  (one driving variable at a time — the
  coordinate reduced-gradient strategy; Clp builds the same one-column
  direction in its default mode)
  curvature  kappa = d'Qd ; unconstrained step t* = |dj_q| / kappa
  ratio test over basic bounds and q's own opposite bound
  - curvature-limited: x moves, q becomes SUPERBASIC (no basis change)
  - basic-blocked:     q enters the basis, blocker leaves (LP pivot)
  - own-bound-limited: status flip

Status protocol matches the LP engines (engine.py).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..forms import StandardLP
from .engine import (
    AT_LOWER,
    AT_UPPER,
    BASIC,
    CONTINUE,
    DUAL_INFEASIBLE,
    FREE,
    ITER_LIMIT,
    NUMERICAL,
    OPTIMAL,
    SimplexOptions,
)
from ..ops.linalg import lu_refactor


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QPState:
    basis: jnp.ndarray  # int32[m]
    vstat: jnp.ndarray  # int32[nt] (FREE = superbasic)
    binv: jnp.ndarray  # f64[m, m]
    x: jnp.ndarray  # f64[nt] — full primal iterate (the authority)
    iterations: jnp.ndarray
    status: jnp.ndarray
    refactor_now: jnp.ndarray


def qp_recompute(lp: StandardLP, state: QPState) -> QPState:
    """Refactorize and project x_B to satisfy Gx = b exactly."""
    G, b = lp.G, lp.b
    B = jnp.take(G, state.basis, axis=1)
    binv, ok = lu_refactor(B)
    nonbasic = jnp.zeros_like(state.x).at[state.basis].set(1.0)
    xn = jnp.where(nonbasic > 0, 0.0, state.x)
    xb = binv @ (b - G @ xn)
    x = xn.at[state.basis].set(xb)
    status = jnp.where(ok, state.status, NUMERICAL).astype(state.status.dtype)
    return dataclasses.replace(
        state, binv=binv, x=x, status=status, refactor_now=jnp.asarray(False)
    )


def _gradient(lp: StandardLP, x):
    g = lp.c
    if lp.Q is not None:
        g = g + lp.Q @ x
    return g


def qp_iteration(lp: StandardLP, state: QPState, opts: SimplexOptions) -> QPState:
    G = lp.G
    m, nt = G.shape
    dtol = opts.dual_tolerance
    ptol = opts.primal_tolerance

    x = state.x
    g = _gradient(lp, x)
    gb = jnp.take(g, state.basis)
    y = gb @ state.binv
    dj = g - y @ G
    dj = dj.at[state.basis].set(0.0)  # basic dj exactly 0 by construction

    at_lo = state.vstat == AT_LOWER
    at_up = state.vstat == AT_UPPER
    at_fr = state.vstat == FREE
    fixed = lp.l == lp.u
    elig = (
        (at_lo & (dj < -dtol)) | (at_up & (dj > dtol)) | (at_fr & (jnp.abs(dj) > dtol))
    ) & ~fixed
    score = jnp.where(elig, jnp.abs(dj), -jnp.inf)
    q = jnp.argmax(score)
    any_elig = jnp.any(elig)

    direction = jnp.where(dj[q] > 0, -1.0, 1.0)  # descent for x_q

    # direction on basics: d_B = -direction * binv @ G[:, q]
    abar = state.binv @ G[:, q]
    dB = -direction * abar

    # curvature kappa = d'Qd with d = direction*e_q + scatter(dB)
    if lp.Q is not None:
        dfull = jnp.zeros(nt).at[state.basis].set(dB).at[q].set(direction)
        kappa = dfull @ (lp.Q @ dfull)
        gd = g @ dfull  # = direction * dj[q] (+ rounding)
        t_star = jnp.where(kappa > 1e-12, -gd / jnp.maximum(kappa, 1e-300), jnp.inf)
        t_star = jnp.maximum(t_star, 0.0)
    else:
        kappa = jnp.asarray(0.0)
        t_star = jnp.asarray(jnp.inf)

    # ratio test on basics
    xb = jnp.take(x, state.basis)
    lb = jnp.take(lp.l, state.basis)
    ub = jnp.take(lp.u, state.basis)
    dec = dB < -opts.pivot_tolerance
    inc = dB > opts.pivot_tolerance
    lb_f = jnp.isfinite(lb)
    ub_f = jnp.isfinite(ub)
    safe_d = jnp.where(dec | inc, dB, 1.0)
    t_cand = jnp.where(
        dec & lb_f, (lb - xb) / safe_d, jnp.where(inc & ub_f, (ub - xb) / safe_d, jnp.inf)
    )
    t_cand = jnp.maximum(t_cand, 0.0)
    r = jnp.argmin(t_cand)
    t_basic = t_cand[r]

    # q's own opposite bound
    width_q = jnp.where(direction > 0, lp.u[q] - x[q], x[q] - lp.l[q])
    t_own = jnp.where(jnp.isfinite(width_q), jnp.maximum(width_q, 0.0), jnp.inf)

    theta = jnp.minimum(jnp.minimum(t_star, t_basic), t_own)
    unbounded = ~jnp.isfinite(theta) & any_elig

    # --- apply step ---
    x_new = x.at[state.basis].add(theta * dB)
    x_new = x_new.at[q].add(direction * theta)

    curvature_limited = (t_star <= t_basic) & (t_star <= t_own)
    own_limited = (t_own < t_star) & (t_own <= t_basic)

    # basis pivot (blocker r leaves)
    abar_r = abar[r]
    piv_small = jnp.abs(abar_r) < opts.pivot_tolerance
    p_leave = state.basis[r]
    hit_lower = dB[r] < 0
    basis_piv = state.basis.at[r].set(q.astype(state.basis.dtype))
    vstat_piv = state.vstat.at[p_leave].set(
        jnp.where(hit_lower, AT_LOWER, AT_UPPER).astype(state.vstat.dtype)
    )
    vstat_piv = vstat_piv.at[q].set(BASIC)
    factor = abar / abar_r
    factor = factor.at[r].set(1.0 - 1.0 / abar_r)
    binv_piv = state.binv - jnp.outer(factor, state.binv[r, :])

    # superbasic landing (curvature-limited): q parks interior
    vstat_super = state.vstat.at[q].set(
        jnp.where(fixed[q], state.vstat[q], FREE).astype(state.vstat.dtype)
    )
    # own-bound flip
    flip_stat = jnp.where(direction > 0, AT_UPPER, AT_LOWER)
    vstat_flip = state.vstat.at[q].set(flip_stat.astype(state.vstat.dtype))

    do_any = any_elig & ~unbounded
    do_pivot = do_any & ~curvature_limited & ~own_limited & ~piv_small
    do_super = do_any & curvature_limited
    do_flip = do_any & own_limited
    bad = do_any & ~curvature_limited & ~own_limited & piv_small

    vstat_new = jnp.where(
        do_pivot,
        vstat_piv,
        jnp.where(do_super, vstat_super, jnp.where(do_flip, vstat_flip, state.vstat)),
    ).astype(state.vstat.dtype)
    basis_new = jnp.where(do_pivot, basis_piv, state.basis)
    binv_new = jnp.where(do_pivot, binv_piv, state.binv)
    x_out = jnp.where(do_any & ~bad, x_new, x)

    status = jnp.where(
        ~any_elig,
        OPTIMAL,
        jnp.where(unbounded, DUAL_INFEASIBLE, state.status),
    ).astype(state.status.dtype)
    # a degenerate (zero) step that isn't a pivot/flip makes no progress
    progressed = do_pivot | do_flip | (do_super & (theta > 0))
    refactor_now = state.refactor_now | bad | (do_super & (theta <= 0))

    return QPState(
        basis=basis_new,
        vstat=vstat_new,
        binv=binv_new,
        x=x_out,
        iterations=state.iterations + progressed.astype(state.iterations.dtype),
        status=status,
        refactor_now=refactor_now,
    )


def qp_sweep_iteration(lp: StandardLP, state: QPState, opts: SimplexOptions) -> QPState:
    """Reduced-gradient descent over ALL superbasics at once.

    One-variable pivots alone are coordinate descent and zigzag on coupled
    Q; this is the directionVector analogue (ClpSimplexNonlinear.cpp:773):
    move every superbasic along -dj with exact line search, keeping basics
    feasible. No basis change; superbasics landing on a bound leave the
    superbasic set. No-op when fewer than one superbasic is active.
    """
    G = lp.G
    m, nt = G.shape
    dtol = opts.dual_tolerance

    x = state.x
    g = _gradient(lp, x)
    gb = jnp.take(g, state.basis)
    y = gb @ state.binv
    dj = (g - y @ G).at[state.basis].set(0.0)

    fixed = lp.l == lp.u
    sup = (state.vstat == FREE) & ~fixed
    rhs = jnp.where(sup & (jnp.abs(dj) > dtol), -dj, 0.0)
    active = jnp.sum(jnp.abs(rhs) > 0) >= 1

    # reduced-Newton direction in the superbasic space by masked CG on
    # Z'QZ w = -dj_S  (Z: supers free, basics follow, others 0). Fixed
    # iteration count keeps it jit-able; steepest descent is the k=0 case.
    def Zmul(w):
        wm = jnp.where(sup, w, 0.0)
        dB_ = -(state.binv @ (G @ wm))
        return wm.at[state.basis].set(dB_)

    if lp.Q is not None:
        def Hmul(w):
            d = Zmul(w)
            u = lp.Q @ d
            t = jnp.take(u, state.basis) @ state.binv
            red = u - t @ G
            return jnp.where(sup, red + 1e-10 * w, 0.0)

        def cg_body(_, carry):
            w, rcg, p, rs = carry
            Hp = Hmul(p)
            denom = p @ Hp
            alpha = jnp.where(denom > 1e-300, rs / denom, 0.0)
            w = w + alpha * p
            rcg = rcg - alpha * Hp
            rs_new = rcg @ rcg
            beta = jnp.where(rs > 1e-300, rs_new / rs, 0.0)
            p = rcg + beta * p
            return w, rcg, p, rs_new

        w0 = jnp.zeros_like(rhs)
        wN, _, _, _ = jax.lax.fori_loop(
            0, 25, cg_body, (w0, rhs, rhs, rhs @ rhs)
        )
        # fall back to steepest descent if CG went bad (non-descent/NaN)
        ok = jnp.all(jnp.isfinite(wN)) & ((jnp.where(sup, dj, 0.0) @ wN) < 0)
        dN = jnp.where(ok, wN, rhs)
    else:
        dN = rhs
    dB = -(state.binv @ (G @ jnp.where(sup, dN, 0.0)))
    dfull = jnp.where(sup, dN, 0.0).at[state.basis].set(dB)

    if lp.Q is not None:
        kappa = dfull @ (lp.Q @ dfull)
    else:
        kappa = jnp.asarray(0.0)
    gd = g @ dfull  # <= 0 by construction
    t_star = jnp.where(kappa > 1e-12, -gd / jnp.maximum(kappa, 1e-300), jnp.inf)
    t_star = jnp.maximum(t_star, 0.0)

    mov_dec = dfull < -opts.pivot_tolerance
    mov_inc = dfull > opts.pivot_tolerance
    safe_d = jnp.where(mov_dec | mov_inc, dfull, 1.0)
    lo_f = jnp.isfinite(lp.l)
    up_f = jnp.isfinite(lp.u)
    t_bnd = jnp.where(
        mov_dec & lo_f,
        (lp.l - x) / safe_d,
        jnp.where(mov_inc & up_f, (lp.u - x) / safe_d, jnp.inf),
    )
    t_bound = jnp.min(jnp.maximum(t_bnd, 0.0), initial=jnp.inf)
    theta = jnp.minimum(t_star, t_bound)
    unbounded = active & ~jnp.isfinite(theta) & (gd < -dtol)

    x_new = x + theta * dfull
    # exact landing: clip movers onto the bound they hit
    x_new = jnp.clip(
        x_new,
        jnp.where(lo_f, lp.l, -jnp.inf),
        jnp.where(up_f, lp.u, jnp.inf),
    )
    ptol = opts.primal_tolerance
    land_lo = sup & mov_dec & lo_f & (x_new <= lp.l + ptol * (1 + jnp.abs(lp.l)))
    land_up = sup & mov_inc & up_f & (x_new >= lp.u - ptol * (1 + jnp.abs(lp.u)))
    vstat_new = jnp.where(
        land_lo, AT_LOWER, jnp.where(land_up, AT_UPPER, state.vstat)
    ).astype(state.vstat.dtype)

    do = active & ~unbounded & jnp.isfinite(theta) & (theta > 0)
    status = jnp.where(unbounded, DUAL_INFEASIBLE, state.status).astype(
        state.status.dtype
    )
    return QPState(
        basis=state.basis,
        vstat=jnp.where(do, vstat_new, state.vstat),
        binv=state.binv,
        x=jnp.where(do, x_new, x),
        iterations=state.iterations + do.astype(state.iterations.dtype),
        status=status,
        refactor_now=state.refactor_now,
    )


def _qp_feasible(lp: StandardLP, state: QPState, opts: SimplexOptions):
    viol = jnp.maximum(
        jnp.maximum(lp.l - state.x, state.x - lp.u), 0.0
    )
    return jnp.max(viol, initial=0.0) <= opts.primal_tolerance * 10


def _qp_optimal(lp: StandardLP, state: QPState, opts: SimplexOptions):
    g = _gradient(lp, state.x)
    gb = jnp.take(g, state.basis)
    y = gb @ state.binv
    dj = (g - y @ G_of(lp)).at[state.basis].set(0.0)
    at_lo = state.vstat == AT_LOWER
    at_up = state.vstat == AT_UPPER
    at_fr = state.vstat == FREE
    fixed = lp.l == lp.u
    viol = jnp.where(
        at_lo & ~fixed,
        jnp.maximum(-dj, 0.0),
        jnp.where(
            at_up & ~fixed,
            jnp.maximum(dj, 0.0),
            jnp.where(at_fr, jnp.abs(dj), 0.0),
        ),
    )
    return (jnp.max(viol, initial=0.0) <= 10 * opts.dual_tolerance) & _qp_feasible(
        lp, state, opts
    )


def G_of(lp):
    return lp.G


@partial(jax.jit, static_argnames=("opts",))
def qp_solve(lp: StandardLP, state: QPState, opts: SimplexOptions) -> QPState:
    """Outer refactorize loop + inner pivot loop with verified optimality."""
    chunk = opts.refactor_frequency

    def inner_cond(carry):
        st, k = carry
        return (
            (st.status == CONTINUE)
            & (k < chunk)
            & ~st.refactor_now
            & (st.iterations < opts.max_iterations)
        )

    def inner_body(carry):
        st, k = carry
        st = qp_iteration(lp, st, opts)
        # follow each pivot with a joint superbasic descent sweep (no-op
        # when the superbasic set is empty)
        st = qp_sweep_iteration(lp, st, opts)
        return st, k + 1

    def outer_cond(carry):
        st, stalls, verified = carry
        running = (st.status == CONTINUE) | ((st.status == OPTIMAL) & ~verified)
        return running & (st.iterations < opts.max_iterations) & (stalls < 3)

    def outer_body(carry):
        st, stalls, _ = carry
        iters_before = st.iterations
        claimed = st.status == OPTIMAL
        st = qp_recompute(lp, st)
        verified = claimed & _qp_optimal(lp, st, opts) & (st.status != NUMERICAL)
        st = dataclasses.replace(
            st,
            status=jnp.where(
                st.status == NUMERICAL,
                NUMERICAL,
                jnp.where(verified, OPTIMAL, CONTINUE),
            ).astype(st.status.dtype),
        )

        def run_chunk(s):
            s, _ = jax.lax.while_loop(inner_cond, inner_body, (s, 0))
            return s

        st = jax.lax.cond(verified, lambda s: s, run_chunk, st)
        made = (st.iterations > iters_before) | verified
        stalls = jnp.where(made, 0, stalls + 1).astype(stalls.dtype)
        return st, stalls, verified

    state, stalls, verified = jax.lax.while_loop(
        outer_cond,
        outer_body,
        (state, jnp.asarray(0, jnp.int32), jnp.asarray(False)),
    )
    state = dataclasses.replace(
        state,
        status=jnp.where(
            (state.status == CONTINUE) & (stalls >= 3), NUMERICAL, state.status
        ).astype(state.status.dtype),
    )
    state = jax.lax.cond(verified, lambda s: s, lambda s: qp_recompute(lp, s), state)
    state = dataclasses.replace(
        state,
        status=jnp.where(
            (state.status == CONTINUE) & (state.iterations >= opts.max_iterations),
            ITER_LIMIT,
            state.status,
        ).astype(state.status.dtype),
    )
    return state


def qp_simplex_solve(model, options):
    """Host driver: phase-1 feasibility via the LP engine (zero objective),
    then the reduced-gradient QP loop. Returns a Solution.

    Reference pattern: ClpSimplexNonlinear::primal on a model with a
    ClpQuadraticObjective (unitTest.cpp:2530-2690 checks simplex-QP and
    barrier-QP agree; tests/test_qp.py does the same here).
    """
    import numpy as np

    from ..constants import ProblemStatus, VariableStatus
    from ..forms import to_standard_form
    from ..model import Solution
    from . import engine as eng
    from .driver import _ENGINE_TO_VS

    lp, info = to_standard_form(model)
    m, nt = lp.G.shape
    n = nt - m
    opts = eng.SimplexOptions(
        primal_tolerance=model.primal_tolerance,
        dual_tolerance=model.dual_tolerance,
        refactor_frequency=options.refactor_frequency or 100,
        max_iterations=int(min(options.max_iterations or 10**9, 50 * (m + n) + 10000)),
    )

    # phase 1: zero-cost LP for a feasible vertex
    lp0 = dataclasses.replace(lp, c=jnp.zeros_like(lp.c), Q=None)
    st0 = eng.initial_state(lp0, opts)
    st0 = eng.recompute(lp0, st0, opts.dual_bound)
    st0 = eng.make_dual_feasible(lp0, st0, opts)
    st0 = eng.dual_solve(lp0, st0, opts)
    if int(st0.status) == eng.PRIMAL_INFEASIBLE:
        return Solution(status=ProblemStatus.PRIMAL_INFEASIBLE)
    if int(st0.status) != eng.OPTIMAL:
        return Solution(status=ProblemStatus.ERRORS)

    xn = eng.nonbasic_values(lp0, st0.vstat, opts.dual_bound)
    x_full = jnp.asarray(xn).at[st0.basis].set(st0.xb)
    qstate = QPState(
        basis=st0.basis,
        vstat=st0.vstat,
        binv=st0.binv,
        x=x_full,
        iterations=jnp.asarray(0, jnp.int32),
        status=jnp.asarray(CONTINUE, jnp.int32),
        refactor_now=jnp.asarray(False),
    )
    qstate = qp_solve(lp, qstate, opts)
    st = int(qstate.status)

    x = np.asarray(qstate.x)
    g = np.asarray(_gradient(lp, qstate.x))
    y = g[np.asarray(qstate.basis)] @ np.asarray(qstate.binv)
    sense = info.sense
    status_map = {
        OPTIMAL: ProblemStatus.OPTIMAL,
        DUAL_INFEASIBLE: ProblemStatus.DUAL_INFEASIBLE,
        ITER_LIMIT: ProblemStatus.STOPPED,
        NUMERICAL: ProblemStatus.ERRORS,
        CONTINUE: ProblemStatus.ERRORS,
    }
    xs = x[:n]
    obj = float(model.objective @ xs) + model.objective_offset
    if model.quadratic_objective is not None:
        obj += 0.5 * float(xs @ (model.quadratic_objective @ xs))
    vstat = np.asarray(qstate.vstat)
    col_status = np.array([_ENGINE_TO_VS[int(s)] for s in vstat[:n]], dtype=np.int8)
    row_status = np.array([_ENGINE_TO_VS[int(s)] for s in vstat[n:]], dtype=np.int8)
    duals = y * sense
    dj_user = (
        model.objective
        + (model.quadratic_objective @ xs if model.quadratic_objective is not None else 0.0)
        - model.matrix.T @ duals
    )
    sol = Solution(
        status=status_map.get(st, ProblemStatus.ERRORS),
        objective_value=obj,
        primal=xs,
        duals=duals,
        reduced_costs=np.asarray(dj_user),
        row_activity=np.asarray(model.matrix @ xs),
        iterations=int(qstate.iterations) + int(st0.iterations),
        column_status=col_status,
        row_status=row_status,
    )
    model.solution = sol
    return sol
