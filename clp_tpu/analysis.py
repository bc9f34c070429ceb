"""Post-optimal analysis: ranging, parametrics, dualize.

The ClpSimplexOther capability set (ClpSimplexOther.cpp): dualRanging (:50),
primalRanging (:770), parametrics (:2554+), dualize/restoreFromDual
(:1681/:1397). Host-side numpy implementations operating on the optimal
basis — analysis features are control-path, not hot-path, so they live on
the host and reuse scipy LU.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import scipy.linalg as sla

from .constants import INF, ProblemStatus, VariableStatus
from .model import Model


def _basis_data(model: Model):
    """Rebuild standard-form arrays + basis partition from the solution."""
    sol = model.solution
    if sol.column_status is None:
        raise ValueError("ranging needs a basic solution (solve with simplex first)")
    A = np.asarray(model.matrix.todense())
    m, n = A.shape
    sense = model.optimization_direction if model.optimization_direction != 0 else 1.0
    G = np.concatenate([A, -np.eye(m)], axis=1)
    c = np.concatenate([model.objective * sense, np.zeros(m)])
    l = np.concatenate([model.col_lower, model.row_lower])
    u = np.concatenate([model.col_upper, model.row_upper])
    stat = np.concatenate([sol.column_status, sol.row_status])
    basic = np.flatnonzero(stat == int(VariableStatus.BASIC))
    assert basic.size == m, f"basis has {basic.size} != {m} members"
    B = G[:, basic]
    lu = sla.lu_factor(B)
    x = np.concatenate([sol.primal, sol.row_activity])
    dj = c - (sla.lu_solve(lu, c[basic], trans=1)) @ G
    return G, c, l, u, stat, basic, lu, x, dj, sense


@dataclasses.dataclass
class RangingResult:
    """Per-column cost ranges and per-row RHS ranges preserving the basis."""

    cost_down: np.ndarray  # (n,) lowest c_j keeping basis optimal
    cost_up: np.ndarray  # (n,)
    rhs_down: np.ndarray  # (m,) lowest rhs keeping basis feasible
    rhs_up: np.ndarray  # (m,)


def ranging(model: Model, dual_tol: float = 1e-9) -> RangingResult:
    """Cost (dual) and RHS (primal) ranging at the optimal basis.

    Reference behavior: ClpSimplexOther::dualRanging/primalRanging with
    exact expected values tested in unitTest.cpp:1609-1698.
    """
    G, c, l, u, stat, basic, lu, x, dj, sense = _basis_data(model)
    m = G.shape[0]
    n = model.num_cols
    nt = G.shape[1]
    pos_in_basis = {int(j): r for r, j in enumerate(basic)}
    nonbasic = np.flatnonzero(stat != int(VariableStatus.BASIC))

    cost_down = np.full(n, -np.inf)
    cost_up = np.full(n, np.inf)
    for j in range(n):
        if stat[j] == int(VariableStatus.BASIC):
            r = pos_in_basis[j]
            # tableau row r over nonbasics
            rho = sla.lu_solve(lu, np.eye(m)[r], trans=1)
            alpha = rho @ G
            up = np.inf
            down = -np.inf
            for k in nonbasic:
                a = alpha[k]
                if abs(a) < 1e-11:
                    continue
                dk = dj[k]
                at_lo = stat[k] in (int(VariableStatus.AT_LOWER), int(VariableStatus.FIXED))
                # delta on c_j shifts dj_k by -delta*alpha_k; keep sign
                if at_lo:  # dj_k >= 0 required
                    bound = dk / a  # delta <= dk/a if a>0 ; >= if a<0
                    if a > 0:
                        up = min(up, bound)
                    else:
                        down = max(down, bound)
                elif stat[k] == int(VariableStatus.AT_UPPER):  # dj_k <= 0
                    bound = dk / a
                    if a > 0:
                        down = max(down, bound)
                    else:
                        up = min(up, bound)
            cost_down[j] = c[j] + down
            cost_up[j] = c[j] + up
        else:
            d = dj[j]
            if stat[j] == int(VariableStatus.AT_UPPER):
                # dj <= 0 must hold: c_j may rise by -dj, fall without limit
                cost_down[j] = -np.inf
                cost_up[j] = c[j] - d
            else:
                # at lower (dj >= 0): c_j may fall by dj, rise without limit
                cost_down[j] = c[j] - d
                cost_up[j] = np.inf
    # back to user sense
    if sense < 0:
        cost_down, cost_up = -cost_up, -cost_down

    # RHS ranging: reported as DELTA ranges [rhs_down, rhs_up] (how far both
    # row bounds can shift together keeping the basis primal feasible).
    rhs_down = np.full(m, -np.inf)
    rhs_up = np.full(m, np.inf)
    xb = x[basic]
    lb = l[basic]
    ub = u[basic]
    slack_stat = stat[n:]
    s_act = x[n : n + m]
    for i in range(m):
        if slack_stat[i] == int(VariableStatus.BASIC):
            # non-binding row: bounds can move until they reach the activity
            rhs_down[i] = (
                s_act[i] - model.row_upper[i] if model.row_upper[i] < INF else -np.inf
            )
            rhs_up[i] = (
                s_act[i] - model.row_lower[i] if model.row_lower[i] > -INF else np.inf
            )
            continue
        # nonbasic slack moves with the bound shift: x_{n+i} += delta, and
        # xB' = xB + delta * w with w = Binv e_i  (slack column is -e_i)
        w = sla.lu_solve(lu, np.eye(m)[:, i])
        down = -np.inf
        up = np.inf
        for r in range(m):
            a = w[r]
            if abs(a) < 1e-11:
                continue
            gap_up = (ub[r] - xb[r]) if ub[r] < INF else np.inf
            gap_dn = (xb[r] - lb[r]) if lb[r] > -INF else np.inf
            if a > 0:
                up = min(up, gap_up / a)
                down = max(down, -gap_dn / a)
            else:
                up = min(up, gap_dn / (-a))
                down = max(down, -gap_up / (-a))
        rhs_down[i] = down
        rhs_up[i] = up
    return RangingResult(cost_down, cost_up, rhs_down, rhs_up)


@dataclasses.dataclass
class ParametricsResult:
    """Exact homotopy output: every basis-change breakpoint in theta."""

    thetas: list  # breakpoint thetas (0 and theta_reached included)
    objectives: list  # objective value at each theta
    pivots: int  # total basis changes walked
    theta_reached: float  # == theta_end unless the LP left the feasible/
    #                        bounded region earlier
    status: ProblemStatus  # OPTIMAL if theta_end reached; PRIMAL_INFEASIBLE
    #                        / DUAL_INFEASIBLE if the homotopy hit the wall
    solution: object = None  # Solution at theta_reached (model.solution is
    #                          left at theta=0 — the model data is theta=0)

    def points(self) -> list[tuple[float, float]]:
        return list(zip(self.thetas, self.objectives))


def parametrics_exact(
    model: Model,
    theta_end: float,
    dc: Optional[np.ndarray] = None,
    d_row_lower: Optional[np.ndarray] = None,
    d_row_upper: Optional[np.ndarray] = None,
    d_col_lower: Optional[np.ndarray] = None,
    d_col_upper: Optional[np.ndarray] = None,
    tol: float = 1e-9,
    max_pivots: int = 0,
) -> ParametricsResult:
    """Pivot-level parametric simplex — the nextTheta semantics
    (ClpSimplexOther::nextTheta, ClpSimplexOther.cpp:5148).

    From the optimal basis at theta=0, primal values and reduced costs are
    LINEAR in theta within a basis: the exact next breakpoint is the
    smallest theta where either a basic variable meets a (possibly moving)
    bound (then one DUAL pivot restores feasibility) or a nonbasic reduced
    cost crosses zero (then one PRIMAL pivot restores optimality).  Cost
    O(#basis changes) pivots total — no re-solves, no bisection — and the
    breakpoint list is exact.

    Row-bound changes are slack-bound changes in the standard form
    [A | -I]v = 0, so rhs parametrics and bound parametrics share one code
    path.  Stops early (status reports which wall) when the LP goes primal
    infeasible (no dual-eligible entering column) or unbounded (no primal
    blocker) at some theta < theta_end.
    """
    from .constants import SolveMethod
    from .options import SolveOptions

    if model.solution is None or model.solution.column_status is None:
        opts = SolveOptions(method=SolveMethod.DUAL_SIMPLEX)
        opts.presolve.enabled = False
        model.initial_solve(opts)
    G, c0, l0, u0, stat, basic, lu, x, dj, sense = _basis_data(model)
    m, nt = G.shape
    n = model.num_cols
    stat = stat.copy().astype(np.int64)
    x = x.copy()

    # per-unit-theta changes in standard form (only finite bounds move)
    dcost = np.zeros(nt)
    if dc is not None:
        dcost[:n] = np.asarray(dc, dtype=float) * sense
    dl = np.zeros(nt)
    du = np.zeros(nt)
    if d_col_lower is not None:
        dl[:n] = np.where(l0[:n] > -INF, np.asarray(d_col_lower, float), 0.0)
    if d_col_upper is not None:
        du[:n] = np.where(u0[:n] < INF, np.asarray(d_col_upper, float), 0.0)
    if d_row_lower is not None:
        dl[n:] = np.where(l0[n:] > -INF, np.asarray(d_row_lower, float), 0.0)
    if d_row_upper is not None:
        du[n:] = np.where(u0[n:] < INF, np.asarray(d_row_upper, float), 0.0)
    lo = np.where(l0 <= -INF, -np.inf, l0)
    up = np.where(u0 >= INF, np.inf, u0)

    Binv = np.linalg.inv(G[:, basic])
    basic = basic.copy()
    in_basis = np.zeros(nt, dtype=bool)
    in_basis[basic] = True
    BASIC, AT_LO, AT_UP = (int(VariableStatus.BASIC),
                           int(VariableStatus.AT_LOWER),
                           int(VariableStatus.AT_UPPER))
    FIXED, FREE = int(VariableStatus.FIXED), int(VariableStatus.SUPER_BASIC)
    FREE0 = int(VariableStatus.FREE)
    at_lo_codes = (AT_LO, FIXED)

    if max_pivots <= 0:
        max_pivots = 50 * (m + nt) + 10000

    theta = 0.0
    pivots = 0
    zero_steps = 0
    status = ProblemStatus.OPTIMAL
    thetas: list[float] = []
    objs: list[float] = []

    def record():
        obj = float((c0 + theta * dcost) @ x) + model.objective_offset * sense
        thetas.append(theta)
        objs.append(obj * (1.0 if sense > 0 else -1.0))

    def refresh_basics():
        """Recompute basic values/duals/djs exactly at the current theta."""
        nonlocal x, dj
        xnb = x.copy()
        xnb[basic] = 0.0
        x[basic] = Binv @ (-G @ xnb)
        cb = (c0 + theta * dcost)[basic]
        y = Binv.T @ cb
        dj = (c0 + theta * dcost) - G.T @ y

    # nonbasic values at theta: the active bound's moving value
    def nb_velocity():
        v = np.zeros(nt)
        nb_lo = ~in_basis & np.isin(stat, at_lo_codes)
        nb_up = ~in_basis & (stat == AT_UP)
        v[nb_lo] = dl[nb_lo]
        v[nb_up] = du[nb_up]
        return v

    refresh_basics()
    record()

    while theta < theta_end - 1e-15 and pivots < max_pivots:
        # --- linear rates within the current basis ---
        vel = nb_velocity()
        w = -(Binv @ (G @ vel))  # d x_B / d theta
        cb_rate = dcost[basic]
        y_rate = Binv.T @ cb_rate
        dj_rate = dcost - G.T @ y_rate

        # primal wall: basic i meets its (moving) bound
        xb, wb = x[basic], w
        lb = lo[basic] + theta * dl[basic]
        ub_ = up[basic] + theta * du[basic]
        rate_lo = wb - dl[basic]  # d(x - l)/d theta
        rate_up = wb - du[basic]  # d(x - u)/d theta
        gap_lo = xb - lb
        gap_up = ub_ - xb
        with np.errstate(divide="ignore", invalid="ignore"):
            t_lo = np.where((rate_lo < -tol) & np.isfinite(gap_lo),
                            np.maximum(gap_lo, 0.0) / (-rate_lo), np.inf)
            t_up = np.where((rate_up > tol) & np.isfinite(gap_up),
                            np.maximum(gap_up, 0.0) / rate_up, np.inf)
        t_primal = np.minimum(t_lo, t_up)
        rp = int(np.argmin(t_primal)) if m else -1
        tp = float(t_primal[rp]) if m else np.inf

        # dual wall: nonbasic k's dj crosses zero against its status
        nb = ~in_basis
        d_now = dj
        with np.errstate(divide="ignore", invalid="ignore"):
            lo_cross = np.where(
                nb & np.isin(stat, at_lo_codes) & (lo != up)[np.arange(nt)]
                & (dj_rate < -tol),
                np.maximum(d_now, 0.0) / (-dj_rate), np.inf)
            up_cross = np.where(
                nb & (stat == AT_UP) & (lo != up) & (dj_rate > tol),
                np.maximum(-d_now, 0.0) / dj_rate, np.inf)
            fr_cross = np.where(
                nb & np.isin(stat, (FREE, FREE0)) & (np.abs(dj_rate) > tol),
                np.abs(d_now) / np.maximum(np.abs(dj_rate), tol), np.inf)
        t_dual = np.minimum(np.minimum(lo_cross, up_cross), fr_cross)
        kq = int(np.argmin(t_dual))
        td = float(t_dual[kq])

        t_star = min(tp, td, theta_end - theta)
        if t_star > 0:
            zero_steps = 0
            theta += t_star
            x[basic] += t_star * w
            x += t_star * (vel * nb)  # nonbasics ride their moving bounds
            dj += t_star * dj_rate
        else:
            zero_steps += 1
            if zero_steps > m + nt + 100:
                status = ProblemStatus.STOPPED  # degenerate cycling guard
                break
        if theta >= theta_end - 1e-15:
            break

        if tp <= min(td, theta_end):  # includes tie: prefer the dual pivot
            # --- basic leaves at a bound: one dual pivot ---
            to_lower = t_lo[rp] <= t_up[rp]
            leave = int(basic[rp])
            rho = Binv[rp]
            alpha = rho @ G
            alpha[basic] = 0.0
            direction = 1.0 if to_lower else -1.0
            # entering must keep dual feasibility: standard dual ratio test
            cand_lo = nb & np.isin(stat, at_lo_codes) & (lo != up)
            cand_up = nb & (stat == AT_UP) & (lo != up)
            cand_fr = nb & np.isin(stat, (FREE, FREE0))
            aa = direction * alpha
            elig = ((cand_lo & (aa < -tol)) | (cand_up & (aa > tol))
                    | (cand_fr & (np.abs(aa) > tol)))
            if not np.any(elig):
                status = ProblemStatus.PRIMAL_INFEASIBLE
                break
            ratio = np.full(nt, np.inf)
            ratio[elig] = np.abs(dj[elig]) / np.abs(alpha[elig])
            cands = np.flatnonzero(elig)
            best = cands[np.argmin(ratio[cands])]
            # largest |alpha| among near-ties for stability
            near = cands[ratio[cands] <= ratio[best] + 1e-10]
            q = int(near[np.argmax(np.abs(alpha[near]))])
            abar = Binv @ G[:, q]
            piv = abar[rp]
            if abs(piv) < 1e-11:
                status = ProblemStatus.STOPPED
                break
            stat[leave] = AT_LO if to_lower else AT_UP
            in_basis[leave] = False
            x[leave] = (lo[leave] + theta * dl[leave] if to_lower
                        else up[leave] + theta * du[leave])
            basic[rp] = q
            in_basis[q] = True
            stat[q] = BASIC
            er = np.zeros(m)
            er[rp] = 1.0
            Binv -= np.outer((abar - er) / piv, Binv[rp])
            pivots += 1
        else:
            # --- nonbasic dj hits zero: one primal pivot ---
            q = kq
            sigma = 1.0 if (stat[q] in at_lo_codes
                            or (stat[q] in (FREE, FREE0)
                                and dj[q] + tol * 0 < 0)) else -1.0
            abar = Binv @ G[:, q]
            dxb = -sigma * abar
            lb = lo[basic] + theta * dl[basic]
            ub_ = up[basic] + theta * du[basic]
            with np.errstate(divide="ignore", invalid="ignore"):
                r_up = np.where(dxb > tol, (ub_ - x[basic]) / dxb, np.inf)
                r_dn = np.where(dxb < -tol, (x[basic] - lb) / (-dxb), np.inf)
            r_all = np.minimum(np.maximum(r_up, 0.0), np.maximum(r_dn, 0.0))
            rr = int(np.argmin(r_all)) if m else -1
            t_blk = float(r_all[rr]) if m else np.inf
            t_own = up[q] - lo[q] + theta * (du[q] - dl[q])
            if not np.isfinite(min(t_blk, t_own)):
                status = ProblemStatus.DUAL_INFEASIBLE
                break
            if t_own <= t_blk:  # bound flip
                x[q] += sigma * t_own
                x[basic] += t_own * dxb
                stat[q] = AT_UP if sigma > 0 else AT_LO
            else:
                piv = abar[rr]
                if abs(piv) < 1e-11:
                    # bail BEFORE mutating statuses/values: the current
                    # basis stays internally consistent for the report
                    status = ProblemStatus.STOPPED
                    break
                leave = int(basic[rr])
                went_up = dxb[rr] > 0
                x[q] += sigma * t_blk
                x[basic] += t_blk * dxb
                stat[leave] = AT_UP if went_up else AT_LO
                in_basis[leave] = False
                x[leave] = (up[leave] + theta * du[leave] if went_up
                            else lo[leave] + theta * dl[leave])
                basic[rr] = q
                in_basis[q] = True
                stat[q] = BASIC
                er = np.zeros(m)
                er[rr] = 1.0
                Binv -= np.outer((abar - er) / piv, Binv[rr])
            pivots += 1

        if pivots % 50 == 0:
            Binv = np.linalg.inv(G[:, basic])
        refresh_basics()
        record()
        from .events import Event, fire_event

        fire_event(model, Event.THETA, theta=theta, pivots=pivots)

    # exact values at the final theta
    refresh_basics()
    if not thetas or abs(thetas[-1] - theta) > 1e-15:
        record()
    else:
        obj = float((c0 + theta * dcost) @ x) + model.objective_offset * sense
        objs[-1] = obj * (1.0 if sense > 0 else -1.0)

    from .model import Solution

    sol = Solution(
        # optimal AT theta_reached — except when the walk stalled
        # (degenerate cycling guard / tiny pivot), where optimality at
        # the final theta is NOT established
        status=(ProblemStatus.STOPPED if status == ProblemStatus.STOPPED
                else ProblemStatus.OPTIMAL),
        objective_value=objs[-1],
        primal=x[:n] * 1.0,
        duals=(Binv.T @ (c0 + theta * dcost)[basic]) * sense,
        reduced_costs=dj[:n] * sense,
        row_activity=model.matrix @ x[:n],
        iterations=pivots,
        column_status=stat[:n].astype(np.int8),
        row_status=stat[n:].astype(np.int8),
    )
    if status == ProblemStatus.OPTIMAL:
        from .events import Event, fire_event

        fire_event(model, Event.NO_THETA, theta=theta)  # end: no more pivots
    return ParametricsResult(
        thetas=thetas, objectives=objs, pivots=pivots,
        theta_reached=theta, status=status, solution=sol,
    )


def parametrics(
    model: Model,
    theta_end: float,
    dc: Optional[np.ndarray] = None,
    d_row_lower: Optional[np.ndarray] = None,
    d_row_upper: Optional[np.ndarray] = None,
    d_col_lower: Optional[np.ndarray] = None,
    d_col_upper: Optional[np.ndarray] = None,
    max_points: int = 64,
    tol: float = 1e-9,
) -> list[tuple[float, float]]:
    """Objective/rhs/bound homotopy in theta over [0, theta_end].

    Returns the EXACT (theta, objective) breakpoint list (endpoint
    included) from the pivot-level walker `parametrics_exact` — the
    nextTheta semantics of ClpSimplexOther::parametrics (:2554, :5148).
    Falls back to adaptive-bisection re-solves if the walker stalls
    numerically (degenerate cycling guard).
    """
    try:
        res = parametrics_exact(
            model, theta_end, dc=dc,
            d_row_lower=d_row_lower, d_row_upper=d_row_upper,
            d_col_lower=d_col_lower, d_col_upper=d_col_upper, tol=tol,
        )
        if res.status in (ProblemStatus.OPTIMAL,
                          ProblemStatus.PRIMAL_INFEASIBLE,
                          ProblemStatus.DUAL_INFEASIBLE):
            pts = res.points()
            if len(pts) > max_points:  # keep ends, thin the middle
                idx = np.unique(np.linspace(0, len(pts) - 1, max_points)
                                .astype(int))
                pts = [pts[i] for i in idx]
            return pts
    except (np.linalg.LinAlgError, ValueError):
        pass
    return _parametrics_bisect(
        model, theta_end, dc, d_row_lower, d_row_upper,
        d_col_lower, d_col_upper, max_points, tol,
    )


def _parametrics_bisect(
    model: Model,
    theta_end: float,
    dc: Optional[np.ndarray] = None,
    d_row_lower: Optional[np.ndarray] = None,
    d_row_upper: Optional[np.ndarray] = None,
    d_col_lower: Optional[np.ndarray] = None,
    d_col_upper: Optional[np.ndarray] = None,
    max_points: int = 64,
    tol: float = 1e-9,
) -> list[tuple[float, float]]:
    """Bisection-with-warm-re-solves fallback (round-2 implementation)."""
    from .options import SolveOptions
    from .constants import SolveMethod
    from .simplex.driver import simplex_solve

    base = model.copy()

    def at(theta: float):
        mm = base.copy()
        if dc is not None:
            mm.objective = mm.objective + theta * np.asarray(dc)
        if d_row_lower is not None:
            mm.row_lower = np.where(
                mm.row_lower > -INF, mm.row_lower + theta * np.asarray(d_row_lower), mm.row_lower
            )
        if d_row_upper is not None:
            mm.row_upper = np.where(
                mm.row_upper < INF, mm.row_upper + theta * np.asarray(d_row_upper), mm.row_upper
            )
        if d_col_lower is not None:
            mm.col_lower = np.where(
                mm.col_lower > -INF, mm.col_lower + theta * np.asarray(d_col_lower), mm.col_lower
            )
        if d_col_upper is not None:
            mm.col_upper = np.where(
                mm.col_upper < INF, mm.col_upper + theta * np.asarray(d_col_upper), mm.col_upper
            )
        opts = SolveOptions(method=SolveMethod.DUAL_SIMPLEX)
        opts.presolve.enabled = False
        warm = model.solution if model.solution.column_status is not None else None
        sol = simplex_solve(mm, opts, dual=True, warm=warm)
        basis_sig = (
            tuple(np.flatnonzero(sol.column_status == int(VariableStatus.BASIC)))
            if sol.column_status is not None
            else ()
        )
        return sol, basis_sig

    points: list[tuple[float, float]] = []
    s0, b0 = at(0.0)
    s1, b1 = at(theta_end)
    points.append((0.0, s0.objective_value))

    def refine(t0, b_0, t1, b_1, depth):
        if depth <= 0 or b_0 == b_1 or (t1 - t0) < 1e-9 * max(1.0, abs(theta_end)):
            return
        tm = 0.5 * (t0 + t1)
        sm, bm = at(tm)
        refine(t0, b_0, tm, bm, depth - 1)
        points.append((tm, sm.objective_value))
        refine(tm, bm, t1, b_1, depth - 1)

    refine(0.0, b0, theta_end, b1, depth=int(np.ceil(np.log2(max_points))))
    points.append((theta_end, s1.objective_value))
    return points


def dualize(model: Model) -> tuple[Model, dict]:
    """Build the explicit LP dual (ClpSimplexOther::dualize, :1681).

    Primal: min c'x s.t. bL <= Ax <= bU, l <= x <= u (minimization form).
    Dual variables: lamL_i >= 0 (rows with finite bL), lamU_i >= 0 (finite
    bU), muL_j >= 0 (finite l), muU_j >= 0 (finite u), with
        A'(lamL - lamU) + muL - muU = c
        max bL'lamL - bU'lamU + l'muL - u'muU
    Returned as a *minimization* model (negated objective). The mapping dict
    lists the column index of each dual variable so `restore_from_dual` can
    rebuild the primal solution.
    """
    import scipy.sparse as sp

    sense = model.optimization_direction if model.optimization_direction != 0 else 1.0
    A = model.matrix
    m, n = A.shape
    c = model.objective * sense
    bL, bU = model.row_lower, model.row_upper
    l, u = model.col_lower, model.col_upper

    cols = []
    obj = []
    names = []
    mapping = {"lamL": {}, "lamU": {}, "muL": {}, "muU": {}, "n": n, "m": m}
    k = 0
    for i in range(m):
        if bL[i] > -INF:
            cols.append(A[i, :].T)
            obj.append(-bL[i])  # min of negated max objective
            mapping["lamL"][i] = k
            names.append(f"lamL{i}")
            k += 1
        if bU[i] < INF:  # equality rows get BOTH parts (free dual, split)
            cols.append(-A[i, :].T)
            obj.append(bU[i])
            mapping["lamU"][i] = k
            names.append(f"lamU{i}")
            k += 1
    eye = sp.eye(n, format="csc")
    for j in range(n):
        if l[j] > -INF:
            cols.append(eye[:, j])
            obj.append(-l[j])
            mapping["muL"][j] = k
            names.append(f"muL{j}")
            k += 1
        if u[j] < INF:  # fixed columns get BOTH parts (free dual, split)
            cols.append(-eye[:, j])
            obj.append(u[j])
            mapping["muU"][j] = k
            names.append(f"muU{j}")
            k += 1
    D = sp.hstack([sp.csc_matrix(col.reshape(n, 1)) for col in cols], format="csc")
    dual = Model()
    dual.load_problem(
        D,
        col_lower=np.zeros(k),
        col_upper=np.full(k, INF),
        objective=np.array(obj),
        row_lower=c,
        row_upper=c,
    )
    dual.col_names = names
    dual.problem_name = f"dual_{model.problem_name or 'model'}"
    return dual, mapping


def restore_from_dual(model: Model, dual: Model, mapping: dict) -> None:
    """Map the solved dual back onto the primal model's Solution."""
    from .model import Solution

    dsol = dual.solution
    if dsol.status != ProblemStatus.OPTIMAL:
        model.solution.status = dsol.status
        return
    sense = model.optimization_direction if model.optimization_direction != 0 else 1.0
    n, m = mapping["n"], mapping["m"]
    # primal x = NEGATED duals of the dual's equality rows: the dual model
    # minimizes the negated dual objective, flipping its multipliers
    x = -np.asarray(dsol.duals)
    lam = np.zeros(m)
    dv = np.asarray(dsol.primal)
    for i, k in mapping["lamL"].items():
        lam[i] += dv[k]
    for i, k in mapping["lamU"].items():
        lam[i] -= dv[k]
    obj = float(model.objective @ x) + model.objective_offset
    model.solution = Solution(
        status=ProblemStatus.OPTIMAL,
        objective_value=obj,
        primal=x,
        duals=lam * sense,
        reduced_costs=model.objective - model.matrix.T @ (lam * sense),
        row_activity=model.matrix @ x,
        iterations=dsol.iterations,
    )


def find_iis(model: Model, options=None, batch: bool = True) -> list[int]:
    """Irreducible infeasible subsystem of rows (reference role:
    examples/iis.cpp — explain WHY a model is infeasible).

    The Farkas ray's support seeds the candidate set; a deletion filter
    shrinks it to irreducibility (every remaining row necessary). With
    `batch=True` each filter round tests EVERY candidate deletion in one
    batched dual-simplex sweep on-device (the trials differ only in row
    bounds, so they stack on the scenario axis) and drops all
    simultaneously-redundant rows when a re-verification confirms the
    reduced set is still infeasible — typically 2-3 solves total instead
    of |candidates| sequential ones.
    """
    from .options import SolveOptions
    from .constants import SolveMethod

    opts = options or SolveOptions(method=SolveMethod.DUAL_SIMPLEX)
    opts.presolve.enabled = False  # rays + stable row indexing

    def _free_rows(m, rows):
        t = m.copy()
        t.row_lower = t.row_lower.copy()
        t.row_upper = t.row_upper.copy()
        for q in rows:
            t.row_lower[q] = -INF
            t.row_upper[q] = INF
        return t

    def _infeasible(m) -> bool:
        return m.initial_solve(opts).status == ProblemStatus.PRIMAL_INFEASIBLE

    sol = model.initial_solve(opts)
    if sol.status != ProblemStatus.PRIMAL_INFEASIBLE:
        raise ValueError(f"model is not primal infeasible: {sol.status}")
    ray = model.infeasibility_ray()
    all_rows = set(range(model.num_rows))
    cand = (
        [int(r) for r in np.flatnonzero(np.abs(ray) > 1e-9)]
        if ray is not None and np.any(np.abs(ray) > 1e-9)
        else sorted(all_rows)
    )
    # rows outside the candidate set play no part: free them once
    base = _free_rows(model, sorted(all_rows - set(cand)))
    if not _infeasible(base):  # ray support insufficient -> use all rows
        cand = sorted(all_rows)
        base = model

    iis = list(cand)
    while len(iis) > 1:
        trials = [_free_rows(base, sorted((set(all_rows) - set(iis)) | {r}))
                  for r in iis]
        if batch and len(trials) > 1:
            from .parallel.batch import solve_batch_dual_simplex

            sols = solve_batch_dual_simplex(trials, opts)
            redundant = [r for r, s in zip(iis, sols)
                         if s.status == ProblemStatus.PRIMAL_INFEASIBLE]
        else:
            redundant = [r for r, t in zip(iis, trials) if _infeasible(t)]
        if not redundant:
            break  # every row necessary -> irreducible
        if len(redundant) > 1:
            # try dropping all redundant rows at once; accept if the
            # reduced set still proves infeasibility
            shrunk = [r for r in iis if r not in redundant]
            if shrunk and _infeasible(
                _free_rows(base, sorted(set(all_rows) - set(shrunk)))
            ):
                iis = shrunk
                continue
        iis.remove(redundant[0])
    return iis
