"""Block decomposition: Benders (L-shaped) with batched scenario subproblems,
and Dantzig-Wolfe column generation.

Reference: solveDW / solveBenders over CoinStructuredModel
(ClpSolve.cpp:5294/6127) — sequential subproblem loops there. TPU-native
redesign (SURVEY.md §2 parallelism table): all scenario subproblems share a
shape, so each Benders iteration solves them as ONE batched IPM call,
shardable over the scenario mesh axis — the subproblem sweep is a single
device program instead of a loop.

Two-stage form handled by `benders_solve`:

    min  c'x + sum_s p_s q_s' y_s
    s.t. A x  ~ b          (first stage, any row bounds)
         T_s x + W y_s = h_s,  y_s >= 0      for each scenario s
         lx <= x <= ux

Requires relatively complete recourse in round 1 (subproblem infeasibility
raises; feasibility cuts land with ray extraction in a later round).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np
import scipy.sparse as sp

from .constants import INF, ProblemStatus, SolveMethod
from .model import Model, Solution
from .options import SolveOptions


@dataclasses.dataclass
class TwoStageLP:
    """Scenario data with identical shapes across scenarios."""

    c: np.ndarray  # (n1,)
    A: sp.spmatrix  # (m1, n1) first-stage constraints
    row_lower: np.ndarray
    row_upper: np.ndarray
    col_lower: np.ndarray
    col_upper: np.ndarray
    T: np.ndarray  # (S, m2, n1)
    W: np.ndarray  # (S, m2, n2)
    h: np.ndarray  # (S, m2)
    q: np.ndarray  # (S, n2)
    prob: np.ndarray  # (S,)


def extensive_form(ts: TwoStageLP) -> Model:
    """Deterministic equivalent (for testing and small instances)."""
    S, m2, n2 = ts.W.shape
    n1 = ts.c.size
    blocks = [sp.csc_matrix(ts.A)]
    rl = [ts.row_lower]
    ru = [ts.row_upper]
    cols = [None]
    rows = []
    # build [[A, 0...], [T_s, W_s diag]]
    top = sp.hstack([sp.csc_matrix(ts.A)] + [sp.csc_matrix((ts.A.shape[0], n2))] * S)
    body = []
    for s in range(S):
        left = sp.csc_matrix(ts.T[s])
        mids = [sp.csc_matrix((m2, n2))] * S
        mids[s] = sp.csc_matrix(ts.W[s])
        body.append(sp.hstack([left] + mids))
    A_full = sp.vstack([top] + body, format="csc")
    model = Model()
    model.load_problem(
        A_full,
        col_lower=np.concatenate([ts.col_lower, np.zeros(S * n2)]),
        col_upper=np.concatenate([ts.col_upper, np.full(S * n2, INF)]),
        objective=np.concatenate([ts.c] + [ts.prob[s] * ts.q[s] for s in range(S)]),
        row_lower=np.concatenate([ts.row_lower] + [ts.h[s] for s in range(S)]),
        row_upper=np.concatenate([ts.row_upper] + [ts.h[s] for s in range(S)]),
    )
    return model


def _solve_scenarios_batched(ts: TwoStageLP, x: np.ndarray, options: SolveOptions):
    """All scenario recourse LPs in one batched IPM call.

    min q_s' y  s.t.  W_s y = h_s - T_s x,  y >= 0.
    Returns (values, duals pi) with pi shaped (S, m2).
    """
    import jax
    import jax.numpy as jnp

    from .forms import StandardLP
    from .interior.mehrotra import IPMOptions, ipm_solve

    S, m2, n2 = ts.W.shape
    rhs = ts.h - np.einsum("smn,n->sm", ts.T, x)
    lp = StandardLP(
        G=jnp.asarray(ts.W),
        b=jnp.asarray(rhs),
        c=jnp.asarray(ts.q),
        l=jnp.zeros((S, n2)),
        u=jnp.full((S, n2), jnp.inf),
    )
    opts = IPMOptions(tol=max(options.barrier_tolerance, 1e-9), max_iter=100)
    res = jax.jit(jax.vmap(lambda one: ipm_solve(one, opts)), static_argnums=())(lp)
    conv = np.asarray(res.converged)
    if not conv.all():
        bad = np.flatnonzero(~conv)
        raise RuntimeError(
            f"scenario subproblems {bad.tolist()} did not converge "
            "(feasibility cuts require complete recourse in round 1)"
        )
    return np.asarray(res.pobj), np.asarray(res.y)


def benders_solve(
    ts: TwoStageLP,
    options: Optional[SolveOptions] = None,
    max_iterations: int = 100,
    tol: float = 1e-7,
) -> tuple[Solution, np.ndarray]:
    """L-shaped method with single aggregated optimality cuts.

    Returns (first-stage Solution with total objective, x).
    """
    options = options or SolveOptions()
    S, m2, n2 = ts.W.shape
    n1 = ts.c.size
    m1 = ts.A.shape[0]

    # master: min c'x + theta, cuts appended as rows
    master = Model()
    A0 = sp.hstack([sp.csc_matrix(ts.A), sp.csc_matrix((m1, 1))], format="csc")
    theta_lo = -1e12
    master.load_problem(
        A0,
        col_lower=np.concatenate([ts.col_lower, [theta_lo]]),
        col_upper=np.concatenate([ts.col_upper, [INF]]),
        objective=np.concatenate([ts.c, [1.0]]),
        row_lower=ts.row_lower,
        row_upper=ts.row_upper,
    )
    sub_opts = SolveOptions(method=SolveMethod.DUAL_SIMPLEX)
    sub_opts.presolve.enabled = False

    upper = np.inf
    lower = -np.inf
    x_best = None
    sol = None
    for it in range(max_iterations):
        msol = master.initial_solve(sub_opts)
        if msol.status != ProblemStatus.OPTIMAL:
            raise RuntimeError(f"master not optimal: {msol.status}")
        x = np.asarray(msol.primal[:n1])
        theta = float(msol.primal[n1])
        lower = msol.objective_value

        vals, pi = _solve_scenarios_batched(ts, x, options)
        recourse = float(np.sum(ts.prob * vals))
        total = float(ts.c @ x) + recourse
        if total < upper:
            upper = total
            x_best = x.copy()

        if upper - lower <= tol * (1.0 + abs(upper)):
            break
        # aggregated optimality cut:
        #   theta >= sum_s p_s [ pi_s'(h_s - T_s x) ]
        #   =>  (sum_s p_s pi_s' T_s) x + theta >= sum_s p_s pi_s' h_s
        gT = np.einsum("s,sm,smn->n", ts.prob, pi, ts.T)
        rhs = float(np.einsum("s,sm,sm->", ts.prob, pi, ts.h))
        cut = np.concatenate([gT, [1.0]])
        master.add_rows(sp.csc_matrix(cut.reshape(1, -1)), lower=[rhs], upper=[INF])

    sol = Solution(
        status=ProblemStatus.OPTIMAL
        if upper - lower <= tol * (1.0 + abs(upper))
        else ProblemStatus.STOPPED,
        objective_value=upper,
        primal=x_best,
        iterations=it + 1,
    )
    return sol, x_best


def dantzig_wolfe(
    blocks: Sequence[Model],
    linking: Sequence[sp.spmatrix],
    link_lower: np.ndarray,
    link_upper: np.ndarray,
    options: Optional[SolveOptions] = None,
    max_iterations: int = 200,
    tol: float = 1e-7,
) -> Solution:
    """Dantzig-Wolfe column generation over block-angular structure.

        min sum_k c_k' x_k
        s.t. link_lower <= sum_k L_k x_k <= link_upper   (linking rows)
             x_k feasible for block k (its own Model constraints/bounds)

    Master = convex combinations of generated block vertices; subproblems
    are priced copies of each block solved per round (batched when blocks
    share shapes). Requires bounded blocks in round 1 (extreme rays later).
    """
    options = options or SolveOptions()
    K = len(blocks)
    mL = link_lower.size
    sub_opts = SolveOptions(method=SolveMethod.DUAL_SIMPLEX)
    sub_opts.presolve.enabled = False

    # initial columns: each block's own optimum ignoring linking rows
    vertices: list[list[np.ndarray]] = [[] for _ in range(K)]
    for k, b in enumerate(blocks):
        s = b.initial_solve(sub_opts)
        if s.status != ProblemStatus.OPTIMAL:
            raise RuntimeError(f"block {k} infeasible/unbounded: {s.status}")
        vertices[k].append(np.asarray(s.primal))

    best = None
    for it in range(max_iterations):
        # master over vertex weights: columns per vertex: [L_k v; e_k]
        cols = []
        costs = []
        owner = []
        for k in range(K):
            Lk = linking[k]
            ck = blocks[k].objective * (
                blocks[k].optimization_direction or 1.0
            )
            for v in vertices[k]:
                cols.append(np.concatenate([np.asarray(Lk @ v).ravel(), np.eye(K)[k]]))
                costs.append(float(ck @ v))
                owner.append(k)
        # big-M artificials on the linking rows keep the restricted master
        # feasible while the vertex pool is small (reference DW does the
        # same with artificial columns)
        big = 1e6 * (1.0 + max(abs(c) for c in costs))
        art = np.vstack([np.eye(mL), np.zeros((K, mL))])
        Am = sp.csc_matrix(
            np.column_stack(cols + [art[:, i] for i in range(mL)] + [-art[:, i] for i in range(mL)])
        )
        n_art = 2 * mL
        master = Model()
        master.load_problem(
            Am,
            col_lower=np.zeros(Am.shape[1]),
            col_upper=np.full(Am.shape[1], INF),
            objective=np.concatenate([np.array(costs), np.full(n_art, big)]),
            row_lower=np.concatenate([link_lower, np.ones(K)]),
            row_upper=np.concatenate([link_upper, np.ones(K)]),
        )
        msol = master.initial_solve(sub_opts)
        if msol.status != ProblemStatus.OPTIMAL:
            raise RuntimeError(f"DW master: {msol.status}")
        y = np.asarray(msol.duals[:mL])  # linking duals
        mu = np.asarray(msol.duals[mL:])  # convexity duals

        # price subproblems: min (c_k - L_k' y)' x over block k
        new_any = False
        total_rc = 0.0
        for k in range(K):
            b = blocks[k].copy()
            sense = b.optimization_direction or 1.0
            red_cost = b.objective * sense - np.asarray(linking[k].T @ y).ravel()
            b.objective = red_cost
            b.optimization_direction = 1.0
            s = b.initial_solve(sub_opts)
            if s.status != ProblemStatus.OPTIMAL:
                raise RuntimeError(f"pricing block {k}: {s.status}")
            rc = s.objective_value - mu[k]
            if rc < -tol * (1 + abs(mu[k])):
                vertices[k].append(np.asarray(s.primal))
                new_any = True
            total_rc += min(rc, 0.0)

        best = msol
        if not new_any:
            break

    # recover x per block from vertex weights (the final master was built
    # from the final vertex list in (k, vertex) order, since convergence
    # means no column was added after it)
    w = np.asarray(best.primal)
    art_use = float(np.abs(w[-2 * mL :]).max(initial=0.0)) if mL else 0.0
    xs = []
    pos = 0
    for k in range(K):
        nk = len(vertices[k])
        xk = np.zeros(blocks[k].num_cols)
        for v, wi in zip(vertices[k], w[pos : pos + nk]):
            xk += wi * v
        xs.append(xk)
        pos += nk
    status = best.status
    if art_use > 1e-7:
        status = ProblemStatus.PRIMAL_INFEASIBLE  # linking rows unsatisfiable
    sol = Solution(
        status=status,
        objective_value=best.objective_value,
        primal=np.concatenate(xs),
        duals=best.duals,
        iterations=it + 1,
    )
    return sol
