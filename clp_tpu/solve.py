"""Solve orchestration — the ClpSimplex::initialSolve equivalent.

Mirrors the reference's dispatcher flow (ClpSolve.cpp:845-4070):
  1. empty-problem short-circuit (:877-906)
  2. presolve (:955-1076)
  3. problem analysis & automatic method choice (:1276-1760)
  4. run the chosen method (dual / primal / barrier+crossover / batched)
  5. postsolve + cleanup solve if residual infeasibilities remain
  6. final status, timing

TPU-first differences: the solvers are jitted fixed-shape device programs;
`solve_batch` exposes the scenario-batched path (vmap/pjit over a mesh axis)
that the reference has no analogue for (SURVEY.md §2 parallelism table).
"""

from __future__ import annotations

import time
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from .constants import INF, ProblemStatus, SecondaryStatus, SolveMethod
from .forms import StandardLP, to_ipm_form, expand_ipm_solution
from .model import Model, Solution
from .options import SolveOptions


def _empty_solution(model: Model) -> Solution:
    """Reference: empty-problem short-circuit (ClpSolve.cpp:877-906).

    With no rows the problem separates per column: minimize each
    c_j x_j (+ quadratic terms) over [l_j, u_j]. A pure clip-to-bounds of
    x = 0 would be feasible but NOT optimal.
    """
    n, m = model.num_cols, model.num_rows
    c = model.objective
    l, u = model.col_lower, model.col_upper
    Q = model.quadratic_objective
    unbounded = False
    if n == 0:
        x = np.zeros(0)
    elif Q is None:
        x = np.where(c > 0, l, np.where(c < 0, u, np.clip(0.0, l, u)))
        unbounded = bool(np.any((c > 0) & (l <= -INF)) or np.any((c < 0) & (u >= INF)))
        x = np.clip(x, np.maximum(l, -INF), np.minimum(u, INF))
    else:
        # box QP: projected gradient (convex; small after presolve)
        Qd = np.asarray(Q.todense()) if hasattr(Q, "todense") else np.asarray(Q)
        lam = float(np.linalg.norm(Qd, 2)) if n else 1.0
        step = 1.0 / max(lam, 1e-12)
        lo = np.maximum(l, -1e18)
        hi = np.minimum(u, 1e18)
        x = np.clip(np.zeros(n), lo, hi)
        for _ in range(2000):
            g = c + Qd @ x
            x_new = np.clip(x - step * g, lo, hi)
            if np.max(np.abs(x_new - x)) < 1e-12 * (1 + np.max(np.abs(x))):
                x = x_new
                break
            x = x_new
    obj = float(c @ x) + model.objective_offset
    if Q is not None:
        obj += 0.5 * float(x @ (Q @ x))
    dj = c.copy() if Q is None else c + np.asarray(Q @ x).ravel()
    sol = Solution(
        status=ProblemStatus.DUAL_INFEASIBLE if unbounded else ProblemStatus.OPTIMAL,
        objective_value=obj,
        primal=x,
        duals=np.zeros(m),
        reduced_costs=dj,
        row_activity=np.zeros(m) if n == 0 else model.matrix @ x,
    )
    infeas_col = np.any(model.col_lower > model.col_upper + 1e-12)
    infeas_row = np.any(
        (model.row_lower > model.row_upper + 1e-12)
        | ((model.row_lower > 1e-12) & (model.num_cols == 0))
        | ((model.row_upper < -1e-12) & (model.num_cols == 0))
    ) if m else False
    if infeas_col or infeas_row:
        sol.status = ProblemStatus.PRIMAL_INFEASIBLE
    return sol


def _auto_idiot(model: Model) -> bool:
    """doIdiot analogue, built from the reference's decision surface
    (ClpSolve.cpp:1276-1726):

      * tryIt gate (:1663): rows > 200, cols > 2000-ish, cols > 2*rows
        — wide enough that the descent point pays for itself;
      * free columns kill it (:1622-1623 ``if (nFree) doIdiot = 0``) —
        the penalty descent has nothing to project them against;
      * rhs statistics (:1628-1670): every finite nonzero rhs entry must
        be (near-)integral, and the magnitude range must be tame
        (ratio <= 10, and <= 2 when values exceed 50) — wild rhs ranges
        mean the quadratic penalty surface is badly scaled;
      * element structure (:1530-1568 plus-minus statistics, :1684
        ``numberElements <= 3 * numberColumns``): mostly-unit entries OR
        very sparse columns — the combinatorial shapes idiot was built
        for. (The reference computes the same +-1 statistics to pick the
        matrix class; here they gate the crash.)

    Deviation from the reference, by measurement: the reference warms
    its PRIMAL with the idiot point; in this engine the mixed dual with
    DSE + long-step BFRT is the stronger finisher, so the idiot point
    feeds the DUAL's values pass instead — measured 1.5x vs cold dual
    and 3.6x vs the barrier on 0/1 covering LPs at 512x2048-4096
    (idiot-warm primal was tried and loses to cold dual here).
    """
    m, n = model.num_rows, model.num_cols
    # tryIt gate, with our measured upper width cap (beyond ~8*m the
    # sprint working-set route wins; reference reaches the same point via
    # its doSprint arbitration, :1590-1596)
    if m <= 200 or n <= 1500 or n <= 2 * m or n > 8 * m:
        return False
    A = model.matrix
    if A.nnz == 0:
        return False
    # free columns switch idiot off (:1622-1623)
    cl, cu = model.col_lower, model.col_upper
    if bool(np.any((cl < -1e10) & (cu > 1e10))):
        return False
    # rhs statistics: integrality + magnitude range (:1628-1670)
    vals = []
    for a in (model.row_lower, model.row_upper):
        a = np.asarray(a, dtype=np.float64)
        vals.append(a[(a != 0.0) & (np.abs(a) < 1e30)])
    rhs = np.abs(np.concatenate(vals)) if vals else np.zeros(0)
    if rhs.size:
        if bool(np.any(np.abs(rhs - np.round(rhs)) > 1e-8)):
            return False
        largest = float(rhs.max())
        smallest = float(rhs.min())
        if largest / smallest > 10.0 or (largest / smallest > 2.0 and largest > 50.0):
            return False
    # element structure: unit-heavy or very sparse columns
    unit_frac = float(np.mean(np.abs(A.data) == 1.0))
    return unit_frac >= 0.8 or A.nnz <= 3 * n


def _matrix_fingerprint(model: Model) -> tuple:
    """Content key for per-matrix probe caches (ADVICE r4 #2: id() can be
    reused after free AND survives in-place edits — a stale hit silently
    flips routing). crc32 over the pattern arrays + a data sample is
    O(nnz) C-speed (~ms at 5M nnz), negligible next to any probe."""
    import zlib

    A = model.matrix
    crc = zlib.crc32(np.ascontiguousarray(A.indptr).tobytes())
    crc = zlib.crc32(np.ascontiguousarray(A.indices).tobytes(), crc)
    d = np.ascontiguousarray(A.data)
    sample = d if d.size <= 65536 else np.concatenate(
        [d[:32768], d[-32768:]]
    )
    crc = zlib.crc32(sample.tobytes(), crc)
    return (A.shape, A.nnz, crc)


def _auto_method(model: Model, options: SolveOptions,
                 idiot_hint: Optional[bool] = None) -> SolveMethod:
    """Automatic method choice from shape statistics.

    Policy modeled on the reference's doIdiot/doSprint heuristics
    (ClpSolve.cpp:1276-1760), simplified for the TPU build: barrier is the
    most hardware-natural default for anything square-ish and dense-ish; the
    dual simplex covers warm starts and finishing.
    """
    m, n = model.num_rows, model.num_cols
    if model.quadratic_objective is not None:
        return SolveMethod.BARRIER_NO_CROSS
    if m == 0 or n == 0:
        return SolveMethod.DUAL_SIMPLEX
    # pure networks: spanning-tree basis, no factorization at all
    # (reference: ClpSolve.cpp network shortcut via ClpNetworkMatrix)
    if model.detect_structure()["network"]:
        return SolveMethod.NETWORK
    # GUB-dominated LPs: the key-variable engine pivots on the small
    # general-row working basis instead of the full m x m inverse
    # (ClpGubMatrix role; detection mirrors ClpSimplexOther::gubVersion)
    if m <= 20000 and n <= 200000:
        from .gub import detect_gub

        sets = detect_gub(model)
        K = len(sets)
        m_g = m - K
        covered = sum(int(gs.cols.size) for gs in sets)
        if (K >= 8 and K >= m // 2 and covered >= n // 2
                and m_g * (n + K + m_g) * 8 <= 1 << 30):
            return SolveMethod.GUB
    # block-structured models: detected two-stage scenario structure routes
    # to Benders with the batched-IPM scenario sweep (reference: the
    # CoinStructuredModel decomposeType dispatch, ClpSolve.cpp:4910-4924 —
    # detection from the FLAT model is ours, structure.py). Probe only at
    # sizes where the decomposition can win and cache per matrix.
    if m >= 192 and n >= 192 and model.num_elements >= 512:
        from .structure import detect_two_stage

        key = _matrix_fingerprint(model)
        cached = getattr(model, "_two_stage_probe_cache", None)
        if cached is not None and cached[0] == key:
            det = cached[1]
        else:
            try:
                det = detect_two_stage(model)
            except Exception:
                det = None
            model._two_stage_probe_cache = (key, det)
        if det is not None:
            return SolveMethod.DECOMPOSE
    wants_idiot = _auto_idiot(model) if idiot_hint is None else idiot_hint
    if wants_idiot:
        # wide + unit-heavy: idiot-crash values-pass dual (doIdiot role)
        return SolveMethod.DUAL_SIMPLEX
    if n > 6 * m and n > 2000:
        return SolveMethod.SPRINT  # wide LPs: column-subset working sets
    # beyond-dense-scale sparse instances: neither a dense G (m x (n+m) f64)
    # nor an explicit basis inverse fits; the sparse-matvec PDHG is the
    # TPU-idiomatic large-sparse path (simplex/IPM finish after presolve
    # shrinks, or the user picks a method explicitly)
    nnz = model.num_elements
    dense_bytes = m * (n + m) * 8
    if (dense_bytes > 4 << 30 and nnz < 0.02 * m * n) or (
        # very sparse at large m: dense factorizations are O(m^3) even when
        # they fit — PDHG + crunch_polish reaches 1e-8 in O(nnz) iterations
        # plus a small dense finish (bigsolve.py)
        m >= 4096 and nnz < 0.01 * m * n
    ):
        # ...unless the sparse NORMAL EQUATIONS factor in O(fill): then
        # the multifrontal barrier reaches full accuracy directly —
        # measured on a 4096x8192 window LP: 44 s no-cross barrier
        # (KKT 5e-12) vs 172 s PDLP+polish vs 427 s with the dense-dual
        # crossover, identical objectives. No-cross: at this scale the
        # crossover's dense dual dominates; users needing a basis pick
        # BARRIER explicitly.
        if 4096 <= m <= 8192 and dense_bytes <= 4 << 30:
            import scipy.sparse as _sp

            from .ops.sparse_chol import make_normal_solver

            key = _matrix_fingerprint(model)
            cached = getattr(model, "_normal_probe_cache", None)
            if cached is not None and cached[0] == key:
                probe = cached[1]
            else:
                try:
                    # routing probe only: _solve_barrier rebuilds the
                    # solver from the actual IPM form (columns may differ
                    # after fixed-column elimination)
                    probe = make_normal_solver(
                        _sp.hstack([model.matrix, _sp.eye(m)]).tocsr(),
                        reg=1e-10)
                except Exception:
                    probe = None
                model._normal_probe_cache = (key, probe)
            if probe is not None:
                return SolveMethod.BARRIER_NO_CROSS
        return SolveMethod.PDLP
    # backend-aware: on TPU the mixed-precision dual simplex is the
    # measured champion at netlib scale — 7.4 s end-to-end (incl. compile)
    # vs 1925 s for the f64-emulated barrier on the same 1024x1792 LP.
    # Barrier stays the default on CPU, where f64 is native and its
    # iteration count wins.
    if m >= 512 and jax.default_backend() == "tpu":
        return SolveMethod.DUAL_SIMPLEX
    return SolveMethod.BARRIER


def _ipm_to_solution(model: Model, res, info, options: SolveOptions) -> Solution:
    n, m = info.n, info.m
    sense = info.sense
    v = expand_ipm_solution(info, np.asarray(res.x))
    x = v[:n]
    y_int = np.asarray(res.y)
    d_full = np.asarray(res.z) - np.asarray(res.w)  # internal reduced costs of kept vars
    # rebuild reduced costs in user sense: d_user = c_user - A'y_user
    y = y_int * sense
    A = model.matrix
    d = model.objective - A.T @ y
    if model.quadratic_objective is not None:
        d = d + sense * (model.quadratic_objective @ x)
    row_act = A @ x
    obj = float(model.objective @ x) + model.objective_offset
    if model.quadratic_objective is not None:
        obj += 0.5 * float(x @ (model.quadratic_objective @ x))

    converged = bool(res.converged)
    status = ProblemStatus.OPTIMAL if converged else ProblemStatus.STOPPED
    secondary = SecondaryStatus.NONE
    if not converged:
        # crude divergence-based certificates; the simplex cleanup refines
        if float(res.blowup) > 1e11 and float(res.primal_infeas) > options.barrier_tolerance:
            status = ProblemStatus.PRIMAL_INFEASIBLE
        elif float(np.max(np.abs(x), initial=0.0)) > 1e12:
            status = ProblemStatus.DUAL_INFEASIBLE
        else:
            secondary = SecondaryStatus.FAILED_TO_CONVERGE
    return Solution(
        status=status,
        secondary_status=secondary,
        objective_value=obj,
        primal=x,
        duals=y,
        reduced_costs=np.asarray(d),
        row_activity=np.asarray(row_act),
        iterations=int(res.iterations),
    )


def _rcm_band_plan(G: np.ndarray):
    """RCM row ordering + bandwidth of pattern(G G') — the symbolic phase
    of the sparse-Cholesky capability (ClpCholeskyBase.cpp:638 ordering).

    Returns (perm, nb) with nb > 0 only when the banded block-tridiagonal
    path is worthwhile (band narrow relative to m).
    """
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    m = G.shape[0]
    if m < 192:
        return None, 0
    Gs = sp.csr_matrix((np.abs(G) > 0).astype(np.int8))
    S = (Gs @ Gs.T).tocsr()
    perm = np.asarray(reverse_cuthill_mckee(S, symmetric_mode=True))
    inv = np.empty(m, dtype=np.int64)
    inv[perm] = np.arange(m)
    Sp = S.tocoo()
    band = int(np.max(np.abs(inv[Sp.row] - inv[Sp.col]), initial=0))
    nb = max(64, band + 1)
    nb = ((nb + 63) // 64) * 64  # MXU-friendly block size
    if nb * 3 > m:
        return None, 0  # too wide: dense is better
    return perm, nb


def _pad_ipm_lp(lp: StandardLP, bucket: int):
    """Pad the IPM standard form (m, nt) up to shape-bucket multiples so
    nearby shapes share ONE compiled barrier program — the IPM analogue
    of the simplex driver's _bucketed_solve, addressing the per-shape
    XLA compile cost that dominates one-shot QP/barrier solves on TPU.

    to_ipm_form substitutes fixed variables out, so the padding must be
    strictly interior-feasible rather than fixed (a [0, 0] pad column
    would be stripped and a bare zero row would make the normal
    equations lean on regularization):
      - each pad ROW i carries a singleton +1 entry on its own pad
        column with [-1, 1] bounds: the row reads x_pad = 0 (strictly
        interior) and contributes a strictly positive diagonal to GDG';
      - remaining pad COLUMNS are all-zero with cost 0 and [-1, 1]
        bounds: reduced cost identically 0, no coupling to the LP.
    Returns (padded_lp, (m, nt)) or (lp, None) when already aligned.

    Pure HOST numpy (round 5): the device-side .at[] version compiled
    ~8 tiny server-side programs per NEW input shape through the tunnel
    — 7.5 s of the measured 7.45 s "zero-recompile" second-shape wall
    (tools/profile_barrier_bucket.py). to_ipm_form now returns host
    arrays, so padding costs microseconds and the single device transfer
    happens at jit dispatch.
    """
    G = np.asarray(lp.G)
    m, nt = G.shape
    m2 = -(-m // bucket) * bucket
    k = m2 - m
    nt2 = -(-(nt + k) // bucket) * bucket
    p = nt2 - nt
    if k == 0 and p == 0:
        return lp, None
    dtype = G.dtype
    G2 = np.zeros((m2, nt2), dtype)
    G2[:m, :nt] = G
    if k:
        G2[m + np.arange(k), nt + np.arange(k)] = 1.0
    pad1 = np.ones(p, dtype)
    Q2 = None
    if lp.Q is not None:
        Q2 = np.zeros((nt2, nt2), dtype)
        Q2[:nt, :nt] = np.asarray(lp.Q)
    lp2 = StandardLP(
        G=G2,
        b=np.concatenate([np.asarray(lp.b), np.zeros(k, dtype)]),
        c=np.concatenate([np.asarray(lp.c), np.zeros(p, dtype)]),
        l=np.concatenate([np.asarray(lp.l), -pad1]),
        u=np.concatenate([np.asarray(lp.u), pad1]),
        Q=Q2,
    )
    return lp2, (m, nt)


def _solve_barrier(model: Model, options: SolveOptions) -> Solution:
    import dataclasses as _dc

    from .interior.mehrotra import IPMOptions, ipm_solve_jit

    lp, info = to_ipm_form(model)
    pad_dims = None
    bucket = int(getattr(options, "shape_bucket", 0) or 0)
    if bucket > 0:
        lp, pad_dims = _pad_ipm_lp(lp, bucket)
    boost = 100.0 if options.barrier_regularize else 1.0
    mixed32 = getattr(options, "barrier_mixed32", "auto")
    if mixed32 == "auto":
        # TPU: f32 MXU assembly/factor + f64 refinement — f64 emulation
        # otherwise dominates both iteration wall time and compile time
        mixed32 = jax.default_backend() == "tpu"
    opts = IPMOptions(
        tol=options.barrier_tolerance,
        max_iter=options.barrier_max_iterations,
        reg_primal=1e-9 * boost,
        reg_dual=1e-10 * boost,
        mixed32=bool(mixed32),
    )
    perm = None
    if lp.Q is not None:
        # separable QP: a diagonal Q keeps H = Q + D^-1 diagonal, so the
        # barrier takes the LP Newton branches (incl. banded) with
        # dinv += diag(Q) instead of the (nt, nt) Cholesky
        Qh = np.asarray(lp.Q)
        if np.count_nonzero(Qh - np.diag(np.diagonal(Qh))) == 0:
            opts = _dc.replace(opts, q_diag=True)
    if lp.Q is None or opts.q_diag:
        perm, nb = _rcm_band_plan(np.asarray(lp.G))
        if perm is not None:
            # permute ROWS so the normal matrix is banded; x and columns
            # are untouched, so only y needs unpermuting afterwards.
            # Host numpy indexing: lp carries host arrays until dispatch.
            lp = _dc.replace(
                lp, G=np.asarray(lp.G)[perm, :], b=np.asarray(lp.b)[perm]
            )
            opts = _dc.replace(opts, band_nb=nb)
        else:
            # general (unbanded) sparse normal equations: minimum-degree +
            # supernodal multifrontal plan, used when its fill estimate
            # beats the dense O(m^3) by a wide margin (ClpCholeskyBase
            # ordering/symbolic/dense-window roles, .cpp:638/1982/3640)
            import scipy.sparse as _sp

            from .ops.sparse_chol import make_normal_solver

            Gh = np.asarray(lp.G)
            m_ = Gh.shape[0]
            # shape bucketing exists to share ONE compiled program across
            # nearby shapes; make_normal_solver embeds a per-PATTERN
            # numeric callback in IPMOptions, which would recompile per
            # model and defeat the bucket — so the bucketed path sticks
            # to the dense/banded branches (trade-off: bucketed sparse
            # models factor dense; pick sparse_chol OR shape_bucket)
            if bucket == 0 and m_ >= 512 and np.count_nonzero(Gh) < 0.02 * Gh.size:
                # rebuilt from the ACTUAL IPM G (to_ipm_form may drop
                # fixed columns, so _auto_method's routing probe cannot
                # be reused — only its decision is)
                G_csr = _sp.csr_matrix(Gh)
                reg_ = float(opts.reg_dual) + 1e-12
                dev_solver = None
                if jax.default_backend() == "tpu":
                    # device multifrontal numeric: the whole IPM stays one
                    # compiled program, frontal POTRF/TRSM/SYRK tiles run
                    # on the MXU in f32 + f64 refinement (round-4; the
                    # host-callback path remains for CPU and for arrow
                    # structures needing the Woodbury dense-column split)
                    from .ops.sparse_chol_device import (
                        make_device_normal_solver,
                    )

                    try:
                        dev_solver = make_device_normal_solver(
                            G_csr, reg=reg_, dtype=jnp.float32)
                    except Exception:
                        dev_solver = None
                if dev_solver is not None:
                    opts = _dc.replace(opts, sparse_chol_device=dev_solver)
                elif jax.default_backend() != "tpu":
                    # host-callback numeric — CPU only: axon_pjrt does not
                    # support pure_callback AT ALL (measured round 4), so
                    # a TPU model the device solver declines (arrow/dense
                    # columns) runs the dense mixed32 Cholesky instead
                    solver = make_normal_solver(G_csr, reg=reg_)
                    if solver is not None:
                        opts = _dc.replace(opts, sparse_chol=solver)
    res = ipm_solve_jit(lp, opts)
    if (
        not bool(res.converged)
        and opts.mixed32
        and getattr(options, "barrier_mixed32", "auto") == "auto"
        and (jax.default_backend() != "tpu" or lp.Q is not None)
    ):
        # f64 escalation (ADVICE r4 #4): when Jacobi scaling + refinement
        # cannot recover the Newton direction, one full-f64 retry. On TPU
        # the retry is limited to QPs (no simplex fallback exists there);
        # TPU LPs escalate downstream to the simplex adjudication instead
        # — the f64 barrier compile alone costs tens of minutes through
        # the tunnel.
        opts64 = _dc.replace(opts, mixed32=False, sparse_chol_device=None)
        res64 = ipm_solve_jit(lp, opts64)
        if bool(res64.converged):
            res = res64
    from .events import get_handler

    mh = get_handler(model, options)
    if mh is not None:
        if bool(res.converged):
            mh.message("CLP_BARRIER_END", obj=float(res.pobj), it=int(res.iterations))
        else:
            mh.message(
                "CLP_BARRIER_EXIT2",
                why=f"not converged: gap {float(res.rel_gap):.3e} "
                    f"pinf {float(res.primal_infeas):.3e}",
            )
    if perm is not None:
        y_full = np.empty_like(np.asarray(res.y))
        y_full[perm] = np.asarray(res.y)
        res = _dc.replace(res, y=y_full)
    if pad_dims is not None:
        m0, nt0 = pad_dims
        res = _dc.replace(
            res,
            x=np.asarray(res.x)[:nt0],
            y=np.asarray(res.y)[:m0],
            z=np.asarray(res.z)[:nt0],
            w=np.asarray(res.w)[:nt0],
        )
    sol = _ipm_to_solution(model, res, info, options)
    return sol


def _solve_simplex(model: Model, options: SolveOptions, dual: bool,
                   warm: Optional[Solution] = None) -> Solution:
    from .simplex.driver import simplex_solve

    return simplex_solve(model, options, dual=dual, warm=warm)


def _fire(model: Model, which, **info) -> bool:
    """Fire an event hook; True means the handler requested an abort
    (reference: event handler return >= 0 -> status 5, ClpModel.hpp:435)."""
    from .events import fire_event

    return fire_event(model, which, **info)


def initial_solve(model: Model, options: Optional[SolveOptions] = None) -> Solution:
    """Presolve -> method -> solve -> postsolve -> cleanup; sets model.solution."""
    from .events import Event

    options = options or SolveOptions()
    t0 = time.time()
    if _fire(model, Event.START_SOLVE):
        sol = Solution(status=ProblemStatus.USER_STOPPED)
        model.solution = sol
        return sol

    if model.num_cols == 0 or model.num_rows == 0:
        sol = _empty_solution(model)
        sol.solve_time = time.time() - t0
        model.solution = sol
        return sol

    # sanity check (reference: ClpModel data validation + ClpSimplex
    # sanityCheck — non-finite matrix entries or NaN rim data are
    # rejected with CLP_BAD_MATRIX/CLP_BAD_BOUNDS, status ERRORS)
    bad = None
    if not np.isfinite(model.matrix.data).all():
        bad = ("CLP_BAD_MATRIX",
               {"n": int((~np.isfinite(model.matrix.data)).sum())})
    else:
        for a in (model.objective, model.col_lower, model.col_upper,
                  model.row_lower, model.row_upper):
            if np.isnan(np.asarray(a, dtype=np.float64)).any():
                bad = ("CLP_BAD_BOUNDS",
                       {"n": int(np.isnan(np.asarray(a)).sum())})
                break
    if bad is not None:
        from .events import get_handler

        mh = get_handler(model, options)
        if mh is not None:
            mh.message(bad[0], **bad[1])
        sol = Solution(status=ProblemStatus.ERRORS)
        sol.solve_time = time.time() - t0
        model.solution = sol
        return sol

    # A pending warm basis is consumed by THIS solve, whatever route it
    # takes: capture the flag and clear it now, so an early-return route
    # (piecewise / dualize / values pass / barrier-family methods) that
    # cannot use the basis drops it explicitly instead of leaving it set
    # for a LATER solve to misinterpret.
    warm_basis_pending = bool(getattr(model, "warm_start_pending", False))
    model.warm_start_pending = False

    # --- piecewise-linear costs (ClpNonLinearCost attachment): route to
    # the in-engine kink-aware primal simplex; presolve/scaling would
    # invalidate the per-column breakpoint specs, so this path owns the
    # whole solve (the reference's nonlinear-cost solves skip presolve
    # the same way)
    if getattr(model, "piecewise_costs", None):
        from .piecewise import solve_piecewise

        sol = solve_piecewise(model, model.piecewise_costs, options)
        sol.timings = {"solve": sol.solve_time}
        _fire(model, Event.END_SOLVE, status=sol.status, time=sol.solve_time)
        return sol

    # --- dualize: solve the transposed model and map back (reference:
    # ClpSimplexOther::dualOfModel/restoreFromDual, ClpSimplexOther.cpp:1681).
    # Auto: very tall LPs transpose to wide ones the engines handle better
    # (per-pivot work scales with the row count; reference tryDualize hint)
    if (
        not options.dualize
        and options.method == SolveMethod.AUTOMATIC
        and model.num_rows > 6 * model.num_cols
        and model.num_rows > 2000
    ):
        import dataclasses as _dc

        options = _dc.replace(options, dualize=1)
    if options.dualize:
        import dataclasses as _dc

        from .analysis import dualize as _dualize, restore_from_dual

        dm, mapping = _dualize(model)
        inner = _dc.replace(options, dualize=0)
        initial_solve(dm, inner)
        restore_from_dual(model, dm, mapping)
        return model.solution

    # --- rim scale factors (objScale / rhsScale dblParams,
    # ClpModel.hpp:1124-1161): scale in, unscale out ---
    if options.objective_scale != 1.0 or options.rhs_scale != 1.0:
        import dataclasses as _dc

        import numpy as _np

        os_, rs_ = float(options.objective_scale), float(options.rhs_scale)
        work0 = model.copy()
        work0.objective = work0.objective * os_
        if rs_ != 1.0:
            for attr in ("row_lower", "row_upper", "col_lower", "col_upper"):
                a = getattr(work0, attr)
                setattr(work0, attr, _np.where(_np.abs(a) < 1e29, a * rs_, a))
        inner = _dc.replace(options, objective_scale=1.0, rhs_scale=1.0)
        sol = initial_solve(work0, inner)
        if sol.primal is not None:
            sol.primal = sol.primal / rs_
            sol.row_activity = None if sol.row_activity is None else sol.row_activity / rs_
            sol.objective_value = float(model.objective @ sol.primal) + model.objective_offset
            if model.quadratic_objective is not None:
                sol.objective_value += 0.5 * float(
                    sol.primal @ (model.quadratic_objective @ sol.primal)
                )
        if sol.duals is not None:
            sol.duals = sol.duals / os_
        if sol.reduced_costs is not None:
            sol.reduced_costs = sol.reduced_costs / os_
        model.solution = sol
        return sol

    # --- values pass (reference: ClpSimplex::dual(1)/primal(1),
    # ClpSimplexDual.cpp:637 ifValuesPass — start the simplex from the
    # CURRENT solution values; the crossover machinery builds the starting
    # basis from the point). Like the reference's direct method call this
    # bypasses presolve; the point is taken as-is.
    if (
        getattr(options, "values_pass", 0)
        and options.method in (SolveMethod.DUAL_SIMPLEX, SolveMethod.PRIMAL_SIMPLEX)
        and model.solution.primal is not None
        and model.solution.primal.size == model.num_cols
    ):
        warm = Solution(
            primal=np.asarray(model.solution.primal, dtype=np.float64).copy(),
            row_activity=(
                None
                if model.solution.row_activity is None
                else np.asarray(model.solution.row_activity, dtype=np.float64).copy()
            ),
        )
        sol = _solve_simplex(
            model, options, dual=options.method == SolveMethod.DUAL_SIMPLEX,
            warm=warm,
        )
        from .events import get_handler

        mh = get_handler(model, options)
        if mh is not None:
            mh.message("CLP_END_VALUES_PASS", it=sol.iterations)
        sol.solve_time = time.time() - t0
        model.solution = sol
        _fire(model, Event.END_SOLVE, status=sol.status, time=sol.solve_time)
        return sol

    # --- pending warm basis (reference: a basis loaded via readBasis /
    # setBasisStatus is the simplex starting basis, ClpModel statusCopy).
    # Presolve would invalidate the status arrays (sizes change) and is
    # worth far less than the basis on a re-solve, so it is skipped;
    # scaling still applies (basis STATUSES are scale-invariant).
    pending_warm = None
    if (
        warm_basis_pending
        and options.method in (SolveMethod.DUAL_SIMPLEX,
                               SolveMethod.PRIMAL_SIMPLEX,
                               SolveMethod.PRIMAL_IDIOT,
                               SolveMethod.AUTOMATIC)
        and model.quadratic_objective is None
        and model.solution.column_status is not None
        and model.solution.row_status is not None
        and np.asarray(model.solution.column_status).size == model.num_cols
        and np.asarray(model.solution.row_status).size == model.num_rows
    ):
        pending_warm = Solution(
            column_status=np.asarray(model.solution.column_status).copy(),
            row_status=np.asarray(model.solution.row_status).copy(),
        )

    # --- presolve ---
    # QP: Q-aware transforms only (fixed columns fold Q terms into the rim;
    # variable-eliminating transforms are gated off inside presolve() —
    # reference analogy: ClpPresolve handles QP via the same action list
    # with substitutions disabled)
    is_qp = model.quadratic_objective is not None
    presolved = None
    pinfo = None
    work = model
    def _stop_now():
        sol = Solution(status=ProblemStatus.USER_STOPPED)
        sol.solve_time = time.time() - t0
        model.solution = sol
        return sol

    if options.presolve.enabled and pending_warm is None:
        from .presolve import presolve as run_presolve

        if _fire(model, Event.PRESOLVE_START):
            return _stop_now()
        t_phase = time.time()
        presolved, pinfo = run_presolve(model, options.presolve)
        # the inner solve runs on the presolved model: carry the handler so
        # phase messages still reach the user's interceptor (driver2 flow)
        presolved.message_handler = model.message_handler
        presolved.log_level = model.log_level
        timings = {"presolve": time.time() - t_phase}
        if _fire(
            model,
            Event.PRESOLVE_SIZE,
            rows=presolved.num_rows,
            cols=presolved.num_cols,
        ) | _fire(
            model,
            Event.PRESOLVE_END,
            rows_dropped=model.num_rows - presolved.num_rows,
            cols_dropped=model.num_cols - presolved.num_cols,
        ):
            return _stop_now()
        if pinfo.status in (ProblemStatus.PRIMAL_INFEASIBLE, ProblemStatus.DUAL_INFEASIBLE):
            _fire(model, Event.PRESOLVE_INFEASIBLE, status=pinfo.status)
            sol = Solution(
                status=pinfo.status,
                secondary_status=SecondaryStatus.INFEAS_OR_UNBOUNDED_IN_PRESOLVE,
            )
            sol.solve_time = time.time() - t0
            model.solution = sol
            return sol
        work = presolved
        if _fire(model, Event.PRESOLVE_BEFORE_SOLVE):
            return _stop_now()

    if presolved is None:
        timings = {}
    method = options.method
    auto_idiot_dual = False
    if pending_warm is not None:
        # a loaded basis pins the engine: specialized routings (network/
        # GUB/sprint/PDLP) cannot consume it; a PRIMAL_IDIOT request keeps
        # the primal engine (the basis replaces the idiot point — the
        # dispatch below only runs the idiot crash when warm is None)
        method = (SolveMethod.PRIMAL_SIMPLEX
                  if method in (SolveMethod.PRIMAL_SIMPLEX,
                                SolveMethod.PRIMAL_IDIOT)
                  else SolveMethod.DUAL_SIMPLEX)
    elif method == SolveMethod.AUTOMATIC:
        ai = _auto_idiot(work)
        method = _auto_method(work, options, idiot_hint=ai)
        auto_idiot_dual = method == SolveMethod.DUAL_SIMPLEX and ai

    t_phase = time.time()
    # --- scaling (reference: ClpModel::scaling modes, applied pre-solve) ---
    factors = None
    from .constants import ScalingMode

    if (options.scaling != ScalingMode.OFF and work.num_cols and work.num_rows
            # scaling destroys +-1 / unit-coefficient structure
            and method not in (SolveMethod.NETWORK, SolveMethod.GUB)):
        from .scaling import compute_scaling, scale_model_arrays

        mode = options.scaling
        factors = compute_scaling(work.matrix, mode)
        if np.allclose(factors.row, 1.0) and np.allclose(factors.col, 1.0):
            factors = None
        else:
            A, cl, cu, obj, rl, ru = scale_model_arrays(work, factors)
            scaled = work.copy()
            scaled.load_problem(A, cl, cu, obj, rl, ru)
            scaled.objective_offset = work.objective_offset
            scaled.optimization_direction = work.optimization_direction
            if work.quadratic_objective is not None:
                import scipy.sparse as _sp

                C = _sp.diags(factors.col)
                scaled.quadratic_objective = (C @ work.quadratic_objective @ C).tocsc()
            unscaled_work = work
            work = scaled

    timings["scaling"] = time.time() - t_phase
    t_phase = time.time()
    if work.num_cols == 0 or work.num_rows == 0:
        sol = _empty_solution(work)
    elif method in (SolveMethod.BARRIER, SolveMethod.BARRIER_NO_CROSS):
        sol = _solve_barrier(work, options)
        if (
            method == SolveMethod.BARRIER
            and options.crossover
            and sol.status in (ProblemStatus.OPTIMAL, ProblemStatus.STOPPED)
        ):
            # crossover: finish with a simplex from the interior solution
            # (reference: ClpSolve.cpp:3585-3786 values-pass cleanup);
            # dual finish — the IPM's duals are near-feasible
            sol = _solve_simplex(work, options, dual=True, warm=sol)
        elif (
            sol.status == ProblemStatus.STOPPED
            and sol.secondary_status == SecondaryStatus.FAILED_TO_CONVERGE
            and work.quadratic_objective is None
        ):
            # the raw IPM cannot certify infeasible/unbounded; when it
            # fails to converge, adjudicate the STATUS with the simplex
            # (reference: initialSolve falls back to a cleanup solve on
            # barrier failure regardless of crossover settings)
            adj = _solve_simplex(work, options, dual=True)
            if adj.status in (
                ProblemStatus.OPTIMAL,
                ProblemStatus.PRIMAL_INFEASIBLE,
                ProblemStatus.DUAL_INFEASIBLE,
            ):
                sol = adj
    elif (
        work.quadratic_objective is not None
        and method in (SolveMethod.DUAL_SIMPLEX, SolveMethod.PRIMAL_SIMPLEX,
                       SolveMethod.PRIMAL_IDIOT)
    ):
        # QP by simplex: reduced-gradient active-set primal
        # (ClpSimplexNonlinear::primal analogue)
        from .simplex.qp import qp_simplex_solve

        sol = qp_simplex_solve(work, options)
    elif method == SolveMethod.DUAL_SIMPLEX:
        warm = pending_warm
        if warm is None and (auto_idiot_dual or options.crash == "idiot"):
            # idiot point -> values-pass dual (doIdiot auto-invocation;
            # see _auto_idiot for the measured primal-vs-dual deviation)
            from .crash import idiot_crash

            warm = idiot_crash(work, options)
        elif warm is None and options.crash == "triangular":
            from .crash import triangular_crash

            warm = triangular_crash(work, options)
        sol = _solve_simplex(work, options, dual=True, warm=warm)
    elif method in (SolveMethod.PRIMAL_SIMPLEX, SolveMethod.PRIMAL_IDIOT):
        warm = pending_warm
        if warm is None and (method == SolveMethod.PRIMAL_IDIOT
                             or options.crash == "idiot"):
            from .crash import idiot_crash

            warm = idiot_crash(work, options)
        elif warm is None and options.crash == "triangular":
            from .crash import triangular_crash

            warm = triangular_crash(work, options)
        sol = _solve_simplex(work, options, dual=False, warm=warm)
    elif method == SolveMethod.SPRINT:
        from .sprint import sprint_solve

        sol = sprint_solve(work, options, max_passes=options.sprint_passes)
    elif method == SolveMethod.PDLP:
        from .pdlp import pdlp_solve

        sol = pdlp_solve(work, options)
        # first-order solutions are moderate-accuracy by design (they carry
        # SecondaryStatus.REDUCED_ACCURACY); polish to simplex accuracy:
        #   * dense-engine scale: values-pass dual solve on the whole LP
        #   * beyond that: crunch_polish — row+column working-set finish
        #     against the full sparse data (bigsolve.py), the reference's
        #     sparse-LU accuracy class reached the working-set way
        if options.crossover and sol.status == ProblemStatus.OPTIMAL:
            polished = None
            dense_fits = (
                4 * work.num_rows * (work.num_rows + work.num_cols) <= 4 << 30
            )
            if work.num_rows >= 2048 or not dense_fits:
                # the working-set finish is strictly cheaper than a full
                # dense values pass at scale; try it first
                from .bigsolve import crunch_polish

                polished = crunch_polish(work, options, sol)
                if polished is not None:
                    sol = polished
            if polished is None and dense_fits:
                polish = _solve_simplex(
                    work, options, dual=True,
                    warm=Solution(primal=sol.primal.copy(),
                                  row_activity=None if sol.row_activity is None
                                  else np.asarray(sol.row_activity).copy()),
                )
                if polish.status == ProblemStatus.OPTIMAL:
                    sol = polish
        if (
            sol.status == ProblemStatus.STOPPED
            and sol.secondary_status == SecondaryStatus.FAILED_TO_CONVERGE
            and 4 * work.num_rows * (work.num_rows + work.num_cols) <= 4 << 30
        ):
            # PDHG cannot certify infeasible/unbounded: adjudicate the
            # status with the simplex when the dense engine fits
            adj = _solve_simplex(work, options, dual=True)
            if adj.status in (
                ProblemStatus.OPTIMAL,
                ProblemStatus.PRIMAL_INFEASIBLE,
                ProblemStatus.DUAL_INFEASIBLE,
            ):
                sol = adj
    elif method == SolveMethod.NETWORK:
        from .network import network_form, solve_network

        if network_form(work) is not None:
            sol = solve_network(work, options)
        else:
            # presolve/user edits broke the +-1 structure: general dual path
            sol = _solve_simplex(work, options, dual=True)
    elif method == SolveMethod.DECOMPOSE:
        from .structure import auto_decompose_solve

        sol = auto_decompose_solve(work, options)
        if sol is None:
            # detection mis-fire / decomposition failure: standard route
            # (decomposeType == 0 -> dual(), ClpSolve.cpp:4914-4916)
            sol = _solve_simplex(work, options, dual=True)
    elif method == SolveMethod.GUB:
        from .gub import solve_gub

        try:
            sol = solve_gub(work, options)
        except ValueError:
            sol = None  # no GUB rows / unverifiable claim: dense path
        # ERRORS falls back to the dense engine; STOPPED does NOT — it
        # means a user limit was hit, and a from-scratch dense re-solve
        # would double the spent budget
        if sol is None or sol.status == ProblemStatus.ERRORS:
            sol = _solve_simplex(work, options, dual=True)
    else:
        raise NotImplementedError(f"method {method}")

    timings["solve"] = time.time() - t_phase
    t_phase = time.time()
    # --- unscale ---
    if factors is not None:
        from .scaling import unscale_solution

        x, y, dj = unscale_solution(
            factors, sol.primal, sol.duals, sol.reduced_costs
        )
        sol.primal, sol.duals, sol.reduced_costs = x, y, dj
        work = unscaled_work
        if x is not None:
            sol.row_activity = work.matrix @ x
            sol.objective_value = (
                float(work.objective @ x) + work.objective_offset
            )
            if work.quadratic_objective is not None:
                sol.objective_value += 0.5 * float(x @ (work.quadratic_objective @ x))

    work.solution = sol

    # --- postsolve ---
    if presolved is not None:
        from .presolve import postsolve as run_postsolve

        _fire(model, Event.PRESOLVE_AFTER_FIRST_SOLVE, status=sol.status)
        sol = run_postsolve(model, pinfo, sol)
        # cleanup solve on the original model if needed (reference:
        # ClpSolve.cpp cleanup semantics, secondaryStatus 2/3/4)
        if options.cleanup and sol.status == ProblemStatus.OPTIMAL and not is_qp:
            from .validate import check_kkt

            rep = check_kkt(model, x=sol.primal, y=sol.duals, tol=1e-6)
            if not rep.ok:
                _fire(model, Event.SLIGHTLY_INFEASIBLE,
                      pinf=rep.primal_infeasibility,
                      dinf=rep.dual_infeasibility)
                sol2 = _solve_simplex(model, options, dual=True, warm=sol)
                if sol2.status == ProblemStatus.OPTIMAL:
                    sol = sol2
        _fire(model, Event.PRESOLVE_AFTER_SOLVE, status=sol.status)

    timings["postsolve"] = time.time() - t_phase
    sol.solve_time = time.time() - t0
    # keep engine-attached statistics (factorization counts) alongside the
    # per-phase wall timings
    timings.update(sol.timings or {})
    sol.timings = timings
    from .events import get_handler

    mh = get_handler(model, options)
    if mh is not None:
        mh.message(6, rows=model.num_rows, cols=model.num_cols, elems=model.num_elements)
        if "presolve" in timings and presolved is not None:
            mh.message(14, drows=model.num_rows - presolved.num_rows,
                       dcols=model.num_cols - presolved.num_cols)
        for phase, secs in timings.items():
            mh.message("CLP_INTERVAL_TIMING", phase=phase, time=secs,
                       total=sol.solve_time)
        mh.message("CLP_TIMING", phase=method.name, obj=sol.objective_value,
                   it=sol.iterations, time=sol.solve_time)
        mh.message(29, status=sol.status.name, time=sol.solve_time)
    model.solution = sol
    if sol.status == ProblemStatus.OPTIMAL:
        _fire(model, Event.SOLUTION, objective=sol.objective_value)
    _fire(model, Event.END_SOLVE, status=sol.status, time=sol.solve_time)
    return sol


def solve_batch(
    models: Sequence[Model],
    options: Optional[SolveOptions] = None,
    mesh: Optional[jax.sharding.Mesh] = None,
) -> list[Solution]:
    """Solve many same-shape LPs in one batched device program.

    The headline TPU capability (SURVEY.md §2: "scenario batching — absent
    in reference"). All models must share (m, n); they are stacked on a
    leading scenario axis, vmapped through the IPM, and sharded over `mesh`
    (axis "scenario") when given.
    """
    from .parallel.batch import solve_batch_ipm

    options = options or SolveOptions()
    return solve_batch_ipm(models, options, mesh)
