"""Jitted dense revised-simplex engines (dual + primal).

Everything here is shape-static and jit/vmap-safe. The iteration protocol
mirrors the reference's status codes (ClpSimplexDual.cpp:462-470):

    CONTINUE(-1) -> keep iterating;  OPTIMAL(0);  PRIMAL_INFEASIBLE(1);
    DUAL_INFEASIBLE(2) (= unbounded);  ITER_LIMIT(3);  NUMERICAL(4)
    REFACTOR(5) -> internal: chunk ended, refactorize and resume.

Structure per solve (gutsOfDual / gutsOfPrimal equivalent):

    outer lax.while_loop:                 # statusOfProblemInDual :4996
        refactorize basis (dense LU -> explicit inverse)
        recompute x_B, duals y, reduced costs dj   # gutsOfSolution
        inner lax.while_loop (<= chunk pivots):    # whileIterating :973
            price -> BTRAN row -> ratio test -> FTRAN -> rank-1 updates

Variable status codes (cf. ClpSimplex::Status, ClpSimplex.hpp:119-126):
    0 = nonbasic at lower, 1 = nonbasic at upper, 2 = basic,
    3 = nonbasic free (primal only; dual folds free vars into fake bounds).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..forms import StandardLP
from ..ops.linalg import lu_refactor, lu_refactor32

# status codes (match ProblemStatus where >= 0)
CONTINUE = -1
OPTIMAL = 0
PRIMAL_INFEASIBLE = 1
DUAL_INFEASIBLE = 2
ITER_LIMIT = 3
NUMERICAL = 4

AT_LOWER = 0
AT_UPPER = 1
BASIC = 2
FREE = 3


@dataclasses.dataclass(frozen=True)
class SimplexOptions:
    primal_tolerance: float = 1e-7
    dual_tolerance: float = 1e-7
    pivot_tolerance: float = 1e-9
    harris_tolerance_frac: float = 0.5  # fraction of tolerance used in pass 1
    dual_bound: float = 1e10  # fake bound magnitude (ClpSimplexDual dualBound_)
    refactor_frequency: int = 100
    max_iterations: int = 200000
    # perturbation magnitude applied by the driver (0 = off)
    perturbation: float = 0.0
    # pivot rules (reference: pluggable strategy classes ClpDualRowSteepest /
    # ClpPrimalColumnSteepest / ClpPESimplex — here a static branch in the
    # kernel). "pe" = Positive Edge (ClpPESimplex.hpp:45): random-projection
    # compatibility bias against degenerate pivots, psi = 0.5 selection.
    # Primal modes mirror ClpPrimalColumnSteepest's mode family: devex,
    # dantzig, exact steepest edge (Forrest-Goldfarb update), partial
    # (rotating-window candidate selection with full-pricing fallback).
    dual_pivot: str = "steepest"  # "steepest" | "dantzig" | "pe"
    primal_pivot: str = "devex"  # "devex" | "dantzig" | "steepest" | "pe" | "partial"
    partial_window: int = 0  # 0 = auto (max(64, nt // 8))
    pe_psi: float = 0.5  # Positive Edge bias threshold
    # fused Pallas PRICE kernel (f32 MXU pricing + f64 pivot verification;
    # reference hot path: ClpPackedMatrix::transposeTimesByRow,
    # ClpPackedMatrix.cpp:706-1307). Off by default: it pays off on TPU at
    # netlib scale; the CPU/test path uses the plain f64 contraction.
    use_pallas_price: bool = False
    price_block_n: int = 512
    # fused FTRAN + rank-1 inverse update Pallas kernel (mixed engine only):
    # one read + one write of binv per pivot instead of three passes
    # (ops/pallas_pivot.py). Off by default; the driver turns it on on TPU.
    use_pallas_pivot: bool = False
    # basis-inverse storage/update dtype for the pivot loop. "float32" turns
    # on the mixed-precision engine: refactorization, x_B/y/dj recomputation
    # and claim verification stay f64 (every refactor_frequency pivots), but
    # the O(m^2)-per-pivot work — FTRAN/BTRAN against binv and the rank-1
    # product-form update — runs in f32. On TPUs f64 is emulated (~12x
    # slower), so this is the difference between VPU-emulated and native
    # arithmetic in the hot loop; the verified-optimality protocol already
    # re-derives every claim on fresh f64 factors, so drift costs at most
    # extra pivots, never a wrong answer.
    inverse_dtype: str = "float64"  # "float64" | "float32"
    # multiply-free kernels for +-1 matrices with <= 2 entries per column
    # (networks + their slacks). PRICE becomes two gathers (O(n) vs O(mn))
    # and the FTRAN column two binv column reads (reference:
    # ClpPlusMinusOneMatrix.hpp, ClpNetworkMatrix.hpp:12-16). The caller must
    # have verified the structure (Model.detect_structure / pm1_indexable).
    price_mode: str = "dense"  # "dense" | "pm1" | "ell" | "block"
    # sparse ELL pricing ("ell" mode): PRICE/flip-flow/PE matvecs run as
    # gather + multiply + row-sum over row-padded sparse forms of G instead
    # of dense contractions — HBM traffic O(nnz) instead of O(m*nt), the
    # dominant per-pivot cost on sparse LPs (reference analogue: the CSC
    # kernels of ClpPackedMatrix::transposeTimesByRow). The pad widths are
    # static (chosen by the driver from the host matrix: max nnz per column
    # / per row, tile-rounded); correctness is unaffected — every nonzero
    # is represented, padding entries carry value 0 at index 0.
    price_ell_kc: int = 0  # max nnz per column (0 = mode unavailable)
    price_ell_kr: int = 0  # max nnz per row
    # "block" geometry (block-banded LPs: staircase/multi-period): nb
    # column groups, each covered by an H-row window — PRICE/FTRAN/matvec
    # become batched dense-tile ops (block_forms). Chosen by the driver
    # from the host matrix so every column's support fits its window.
    price_block_nb: int = 0  # 0 = mode unavailable
    price_block_h: int = 0
    price_block_cb: int = 0  # columns per block (multiple of 128)
    # dual ratio test. "harris" = two-pass Harris stopping at the first
    # breakpoint window. "bfrt" = long-step bound-flipping ratio test
    # (reference: dualColumn's candidate/flip accounting,
    # ClpSimplexDual.cpp:2216+): walk PAST boxed breakpoints while the
    # leaving row's infeasibility slope stays positive — each passed boxed
    # variable flips to its opposite bound — and enter at the breakpoint
    # that exhausts the slope. One pivot then does the work of many
    # degenerate short steps on problems rich in finite-width columns.
    dual_ratio: str = "harris"  # "harris" | "bfrt"
    # BFRT breakpoint-selection budget: only the K smallest dual ratios
    # can be walked in one long step; truncation is a valid shorter step.
    # K trades top_k wall cost (measured 141 us/pivot at nt=6656, K=256)
    # against long-step length.
    bfrt_topk: int = 256
    # "approx" uses jax.lax.approx_min_k (TPU PartialReduce — several x
    # faster than exact top_k). Approximation can only mis-ESTIMATE the
    # walk: a missed small breakpoint inflates `remain`, but the exact
    # f32 slope-validity check below rejects any overshoot and falls
    # back to the short step, so correctness is unaffected.
    bfrt_select: str = "topk"  # "topk" | "approx"
    # TIMING-ONLY component gates for tools/microbench_pivot.py: pieces
    # of the pivot body replaced by cheap aliases so the wall-cost of
    # each component is measurable on hardware. NEVER set in real solves
    # (results are numerically meaningless). Members: "price", "bfrt",
    # "ftran", "update", "book", "rowchoice".
    ablate: tuple = ()
    # pivots per inner-loop step: the inner pivot loop runs lax.scan blocks
    # of this length inside the while_loop, amortizing the per-iteration
    # while overhead (measured 39 us/pivot on the v5e tunnel, round 5).
    # The pivot body is no-op-safe — once a terminal status, the accuracy
    # flag, or the iteration limit is reached, do_pivot gates every state
    # write — so over-running a block past the stopping condition wastes
    # at most unroll-1 gated body evaluations per chunk. 1 = exact
    # round-4 behavior (every caller that doesn't opt in).
    inner_unroll: int = 1


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SimplexState:
    basis: jnp.ndarray  # int32[m] variable index basic in row i
    vstat: jnp.ndarray  # int32[nt]
    binv: jnp.ndarray  # f64[m, m]
    xb: jnp.ndarray  # f64[m] values of basic variables
    dj: jnp.ndarray  # f64[nt] reduced costs (0 at basic)
    y: jnp.ndarray  # f64[m] simplex multipliers
    weights: jnp.ndarray  # f64[m] DSE weights (dual) — primal keeps devex in wcol
    wcol: jnp.ndarray  # f64[nt] devex reference weights (primal)
    iterations: jnp.ndarray  # int32
    status: jnp.ndarray  # int32, CONTINUE while running
    refactor_now: jnp.ndarray  # bool — accuracy trigger
    refactors: jnp.ndarray  # int32 — factorization count (statistics mode)


def nonbasic_values(lp: StandardLP, vstat, dual_bound):
    """Values taken by nonbasic variables (with fake bounds where infinite).

    Fake-bound semantics per ClpSimplexDual.cpp:143-158: a nonbasic variable
    whose relevant bound is infinite sits at +-dual_bound instead.
    """
    vlo = jnp.where(jnp.isfinite(lp.l), lp.l, -dual_bound)
    vup = jnp.where(jnp.isfinite(lp.u), lp.u, dual_bound)
    val = jnp.where(vstat == AT_LOWER, vlo, jnp.where(vstat == AT_UPPER, vup, 0.0))
    return jnp.where(vstat == BASIC, 0.0, val)


def recompute(lp: StandardLP, state: SimplexState, dual_bound) -> SimplexState:
    """Refactorize + recompute primals/duals (gutsOfSolution equivalent).

    f64 state: factor and recompute everything in f64 (unchanged).
    Mixed-precision state (f32 binv): factor with the backend's NATIVE f32
    LuDecomposition (much faster than the f64 blocked panel loop on TPU)
    and recover full f64 accuracy for x_B/y/dj by iterative refinement —
    each step does one f64 residual matvec against B and one f32
    preconditioner application, converging to ~1e-13 in 3 steps for any
    basis the f32 factor can represent; a basis it cannot (refinement
    residual stays large) is flagged NUMERICAL exactly like a singular f64
    factorization would be.
    """
    G, b, c = lp.G, lp.b, lp.c
    B = jnp.take(G, state.basis, axis=1)
    xn = nonbasic_values(lp, state.vstat, dual_bound)
    rhs = b - G @ xn
    cb = jnp.take(c, state.basis)
    if state.binv.dtype != G.dtype:
        binv32, ok = lu_refactor32(B)
        HI = jax.lax.Precision.HIGHEST

        def prec(v):  # f32 preconditioner application, f64 in/out
            return jnp.matmul(
                binv32, v.astype(binv32.dtype), precision=HI
            ).astype(G.dtype)

        def prec_t(v):
            return jnp.matmul(
                v.astype(binv32.dtype), binv32, precision=HI
            ).astype(G.dtype)

        xb = prec(rhs)
        y = prec_t(cb)
        for _ in range(3):
            xb = xb + prec(rhs - B @ xb)
            y = y + prec_t(cb - y @ B)
        resid = jnp.max(jnp.abs(rhs - B @ xb)) / (
            1.0 + jnp.max(jnp.abs(rhs), initial=0.0)
        )
        ok = ok & jnp.isfinite(resid) & (resid < 1e-9)
        binv_store = binv32
        # devex reference-framework restart (primal weights): bounded drift
        # under the f32 pivot loop, same lesson as the DSE reset below
        wcol = jnp.ones_like(state.wcol)
    else:
        binv, ok = lu_refactor(B)
        xb = binv @ rhs
        y = cb @ binv
        binv_store = binv
        wcol = state.wcol
    dj = c - y @ G
    dj = jnp.where(state.vstat == BASIC, 0.0, dj)
    status = jnp.where(ok, state.status, NUMERICAL).astype(state.status.dtype)
    # reset DSE weights to exact steepest-edge norms ||e_r'B^-1||^2 on the
    # fresh factors (ClpDualRowSteepest full-mode reset). The incremental
    # Forrest-Goldfarb update drifts — harmlessly in f64 over one solve,
    # but under the f32 pivot loop unbounded drift was observed to starve
    # the most-infeasible rows of selection and stall convergence.
    weights = jnp.maximum(
        jnp.sum(
            binv_store.astype(G.dtype) * binv_store.astype(G.dtype), axis=1
        ),
        1e-8,
    )
    return dataclasses.replace(
        state,
        binv=binv_store,
        xb=xb,
        y=y,
        dj=dj,
        weights=weights,
        wcol=wcol,
        status=status,
        refactor_now=jnp.asarray(False),
        refactors=state.refactors + 1,
    )


def _basic_bounds(lp: StandardLP, basis):
    lb = jnp.take(lp.l, basis)
    ub = jnp.take(lp.u, basis)
    return lb, ub


# --------------------------------------------------------------------------
# +-1 multiply-free kernels (ClpPlusMinusOneMatrix / ClpNetworkMatrix)
# --------------------------------------------------------------------------


def ell_forms(G, kc: int, kr: int, dtype=jnp.float32):
    """Row-padded sparse forms of G for gather-based matvecs.

    Returns (col_val (nt,kc), col_idx, row_val (m,kr), row_idx): per-COLUMN
    top-kc entries by |value| (covers every nonzero when kc >= max column
    nnz — the driver guarantees this from the host matrix) and the same
    per row. Padding slots carry value 0 at index 0, contributing nothing.
    Built once per solve with lax.top_k — traced-shape-safe because the
    pad widths are static.
    """
    m, nt = G.shape
    Gt32 = G.T.astype(dtype)
    _, cidx = jax.lax.top_k(jnp.abs(Gt32), kc)           # (nt, kc)
    cval = jnp.take_along_axis(Gt32, cidx, axis=1)
    cval = jnp.where(cval != 0, cval, 0.0)
    cidx = jnp.where(cval != 0, cidx, 0).astype(jnp.int32)
    G32 = G.astype(dtype)
    _, ridx = jax.lax.top_k(jnp.abs(G32), kr)            # (m, kr)
    rval = jnp.take_along_axis(G32, ridx, axis=1)
    rval = jnp.where(rval != 0, rval, 0.0)
    ridx = jnp.where(rval != 0, ridx, 0).astype(jnp.int32)
    return cval, cidx, rval, ridx


def _ell_price(rho, ell):
    """alpha = rho @ G: per-column gather of rho + weighted row-sum."""
    cval, cidx, _, _ = ell
    return jnp.sum(cval * rho.astype(cval.dtype)[cidx], axis=1)


def _ell_col(q, ell, m):
    """Dense column G[:, q] scattered from the column form."""
    cval, cidx, _, _ = ell
    return jnp.zeros((m,), cval.dtype).at[cidx[q]].add(cval[q])


def _ell_matvec(x, ell):
    """G @ x: per-row gather of x + weighted row-sum."""
    _, _, rval, ridx = ell
    return jnp.sum(rval * x.astype(rval.dtype)[ridx], axis=1)


def block_forms(G, nb: int, H: int, CB: int = 0):
    """Column-window block forms over a PRE-SORTED G: contiguous runs of
    CB columns share one (H, CB) dense tile covering their row window.

    The TPU-idiomatic sparse PRICE for block-banded LPs (staircase /
    multi-period structure): alpha = rho @ G becomes ONE batched matmul
    over (nb, H, CB) tiles — MXU work and HBM traffic proportional to the
    covered windows, not m*nt. The DRIVER permutes the standard form's
    columns by window position once per solve (and un-permutes the final
    state), so block results land contiguously: no per-pivot nt-gather,
    which is what sank the round-3 un-permuted variant (0.76x dense).
    The caller chooses nb/H so every column's support fits its block
    window: starts_b = min(min_lo_b, m-H) covers [min_lo_b, max_hi_b)
    whenever the block span <= H.
    """
    m, nt = G.shape
    if CB <= 0:
        CB = -(-nt // nb)
    # the caller's CB (a multiple of 128 for the Pallas kernel) defines
    # the column grouping; it must MATCH the driver's span computation
    pad = nb * CB - nt
    if pad:
        G = jnp.concatenate([G, jnp.zeros((m, pad), G.dtype)], axis=1)
    # rows pad to a multiple of 8 and window starts round DOWN to
    # multiples of 8: the fused Pallas kernel slices rho on the sublane
    # dimension, which wants 8-aligned starts (f32 tiling); the driver's
    # H carries +8 slack so flooring never uncovers a column's support
    m8 = -(-m // 8) * 8
    if m8 > m:
        G = jnp.concatenate([G, jnp.zeros((m8 - m, G.shape[1]), G.dtype)])
    nz = jnp.abs(G) > 0
    anyc = jnp.any(nz, axis=0)
    # pad / empty columns must not drag a block's window start to 0
    lo = jnp.where(anyc, jnp.argmax(nz, axis=0), m)
    lo_s = lo.reshape(nb, CB)
    starts = jnp.minimum(jnp.min(lo_s, axis=1), m8 - H)
    starts = ((starts // 8) * 8).astype(jnp.int32)
    rowidx = starts[:, None, None] + jnp.arange(H)[None, :, None]
    cols = jnp.arange(nb * CB).reshape(nb, CB)
    W = G[rowidx, cols[:, None, :]]
    return starts, W, m8


def _blk_price(rho, blk, dtype, nt):
    """alpha = rho @ G over block tiles: one (nb,H)x(nb,H,CB) batched
    matmul; output is already in (sorted) column order."""
    starts, W, m8 = blk
    H = W.shape[1]
    rho_p = jnp.concatenate([rho, jnp.zeros(m8 - rho.shape[0], rho.dtype)])
    rho_w = rho_p[starts[:, None] + jnp.arange(H)[None, :]]
    out = jnp.einsum("bh,bhc->bc", rho_w.astype(W.dtype), W,
                     precision=jax.lax.Precision.HIGHEST)
    return out.reshape(-1)[:nt].astype(dtype)


def _blk_col(q, blk, m):
    """Dense G[:, q] scattered from its block window."""
    starts, W, m8 = blk
    nb, H, CB = W.shape
    b, c = q // CB, q % CB
    win = W[b, :, c]
    return jnp.zeros((m8,), W.dtype).at[
        starts[b] + jnp.arange(H)].set(win)[:m]


def _blk_matvec(x, blk, m):
    """G @ x: per-block (H, CB) @ (CB,) then overlapping scatter-add."""
    starts, W, m8 = blk
    nb, H, CB = W.shape
    nt = x.shape[0]
    xp = jnp.concatenate(
        [x, jnp.zeros(nb * CB - nt, x.dtype)]).reshape(nb, CB)
    contrib = jnp.einsum("bhc,bc->bh", W, xp.astype(W.dtype),
                         precision=jax.lax.Precision.HIGHEST)
    return jnp.zeros((m8,), W.dtype).at[
        starts[:, None] + jnp.arange(H)[None, :]].add(contrib)[:m]


def pm1_indices(G):
    """Per-column (+1-row, -1-row) indices; m encodes "no such entry".

    Valid for matrices whose columns each hold at most one +1 and one -1
    (networks and their [A | -I] slacks). The caller verifies structure
    (Model.detect_structure); here we only extract indices.
    """
    m = G.shape[0]
    pos = jnp.where(jnp.any(G > 0.5, axis=0), jnp.argmax(G, axis=0), m)
    neg = jnp.where(jnp.any(G < -0.5, axis=0), jnp.argmin(G, axis=0), m)
    return pos.astype(jnp.int32), neg.astype(jnp.int32)


def _pm1_price(rho, pm1):
    """alpha = rho @ G as two gathers — O(n), no multiplies."""
    pos, neg = pm1
    rho_pad = jnp.concatenate([rho, jnp.zeros((1,), rho.dtype)])
    return rho_pad[pos] - rho_pad[neg]


def _pm1_ftran_col(binv, q, pm1):
    """binv @ G[:, q] = binv[:, pos_q] - binv[:, neg_q]."""
    pos, neg = pm1
    m = binv.shape[0]
    binvpad = jnp.concatenate([binv, jnp.zeros((m, 1), binv.dtype)], axis=1)
    return binvpad[:, pos[q]] - binvpad[:, neg[q]]


def _pm1_matvec(delta, pm1, m):
    """G @ delta as a scatter-add — O(n)."""
    pos, neg = pm1
    out = jnp.zeros((m + 1,), delta.dtype).at[pos].add(delta).at[neg].add(-delta)
    return out[:m]


# --------------------------------------------------------------------------
# Dual simplex
# --------------------------------------------------------------------------


def pivot_invariants(lp: StandardLP, opts: SimplexOptions):
    """Loop-invariant vectors of the dual pivot body.

    Computed once per solve in the iteration closure (_dual_iteration_fn)
    so XLA hoists them out of the pivot while_loop — recomputing them per
    pivot measured ~30-50 us of the 397 us body on the v5e (round 5; the
    f64 elementwise ops are VPU-emulated and each small op carries fixed
    overhead). Recomputed inline when the caller passes pre=None (direct
    single-iteration callers, tests)."""
    fixed = lp.l == lp.u
    width = lp.u - lp.l
    width32 = width.astype(jnp.float32)
    finl = jnp.isfinite(lp.l)
    finu = jnp.isfinite(lp.u)
    both_fin = finl & finu & ~fixed
    boxed = jnp.isfinite(width32) & ~fixed
    vlo = jnp.where(finl, lp.l, -opts.dual_bound)
    vup = jnp.where(finu, lp.u, opts.dual_bound)
    return {
        "fixed": fixed, "width": width, "width32": width32,
        "both_fin": both_fin, "boxed": boxed, "vlo": vlo, "vup": vup,
    }


def dual_iteration(lp: StandardLP, state: SimplexState, opts: SimplexOptions,
                   G32=None, pm1=None, ell=None, blk=None, pre=None):
    """One dual pivot: price row -> BTRAN -> ratio test -> FTRAN -> update.

    When opts.use_pallas_price, PRICE + the Harris pass-1 scan run fused in
    f32 on the MXU (ops/pallas_price.py) against a loop-invariant f32 copy
    of G (`G32`); the chosen pivot is verified against the f64 FTRAN value
    so pricing precision never affects correctness — only, at worst, the
    pivot choice (an extra iteration). This is the TPU-native counterpart
    of the reference's ABOCA_LITE data-parallel PRICE
    (ClpPackedMatrix.cpp:337-406).

    When opts.inverse_dtype == "float32", binv arrives in f32 and all
    O(m^2) work against it (PRICE source row, FTRAN pair, rank-1 update)
    stays f32; scalars feeding the f64 solution updates are upcast.
    """
    G = lp.G
    m, nt = G.shape
    ptol = opts.primal_tolerance
    dtol = opts.dual_tolerance
    mixed = opts.inverse_dtype == "float32"
    if pre is None:
        pre = pivot_invariants(lp, opts)

    lb, ub = _basic_bounds(lp, state.basis)
    below = lb - state.xb
    above = state.xb - ub
    infeas = jnp.maximum(jnp.maximum(below, above), 0.0)
    cand = infeas > ptol

    # --- row choice: steepest edge (ClpDualRowSteepest), Dantzig, or
    # Positive Edge biased steepest (ClpPESimplex.hpp:45) ---
    if opts.dual_pivot == "dantzig":
        score = jnp.where(cand, infeas, -jnp.inf)
    else:
        score = jnp.where(
            cand, infeas * infeas / jnp.maximum(state.weights, 1e-50), -jnp.inf
        )
    if opts.dual_pivot == "pe":
        # compatible rows: a random combination z of dual-degenerate
        # nonbasic columns FTRANs to ~0 in row r, so the ratio test there
        # is unlikely to return a zero-dj entering column (degenerate dual
        # step). One extra matvec pair per pivot — same price the
        # reference's PE variants pay.
        key = jax.random.fold_in(jax.random.PRNGKey(20210), state.iterations)
        deg = (state.vstat != BASIC) & (jnp.abs(state.dj) <= dtol) & (lp.l != lp.u)
        z = jnp.where(deg, jax.random.rademacher(key, (nt,), G.dtype), 0.0)
        if pm1 is not None:
            gz = _pm1_matvec(z, pm1, m)
        elif ell is not None:
            gz = _ell_matvec(z, ell)
        elif blk is not None:
            gz = _blk_matvec(z, blk, m).astype(G.dtype)
        else:
            gz = G @ z
        v = jnp.matmul(
            state.binv, gz.astype(state.binv.dtype),
            precision=jax.lax.Precision.HIGHEST,
        ).astype(G.dtype)
        nrm = jnp.sqrt(jnp.maximum(jnp.sum(z * z), 1.0))
        compat = jnp.abs(v) <= 1e-8 * nrm
        best_all = jnp.max(score, initial=-jnp.inf)
        score_c = jnp.where(compat, score, -jnp.inf)
        best_c = jnp.max(score_c, initial=-jnp.inf)
        score = jnp.where(best_c >= opts.pe_psi * best_all, score_c, score)
    if "rowchoice" in opts.ablate:  # timing-only: skip the DSE argmax
        r = jnp.mod(state.iterations, m)
    else:
        r = jnp.argmax(score)
    # ONE gather for every row-r scalar this pivot needs: each separate
    # x[r] read is its own dynamic-slice kernel on TPU (~5 us apiece,
    # measured round 5); the (7, m) stack is a single fused pass
    row_stack = jnp.stack([above, below, infeas, state.weights,
                           state.xb, lb, ub])
    row_r = jax.lax.dynamic_slice_in_dim(row_stack, r, 1, axis=1)[:, 0]
    above_r, below_r, infeas_r, w_r, xb_r, lb_r, ub_r = (
        row_r[0], row_r[1], row_r[2], row_r[3], row_r[4], row_r[5],
        row_r[6])
    sigma = jnp.where(above_r > below_r, 1.0, -1.0)  # +1: leaves at upper
    # argmax r maximizes score, which is -inf only where ~cand: the
    # gathered row decides any_infeas without a second m-reduction
    any_infeas = infeas_r > ptol

    # --- BTRAN row + PRICE (+ fused Harris pass 1 when on the MXU) ---
    rho = state.binv[r, :]
    at_lo = state.vstat == AT_LOWER
    at_up = state.vstat == AT_UPPER
    # fixed variables (l == u) can never usefully enter
    fixed = pre["fixed"]
    sgn = jnp.where(at_lo, 1.0, -1.0)
    rel = opts.harris_tolerance_frac * dtol

    if "price" in opts.ablate:  # timing-only: alias instead of the m*nt pass
        alpha = state.dj.astype(G.dtype)
        a = sigma * alpha
        elig = (at_lo & (a > opts.pivot_tolerance)) | (
            at_up & (a < -opts.pivot_tolerance)
        )
        elig = elig & ~fixed
        safe_a0 = jnp.where(elig, a, 1.0)
        theta_relaxed = jnp.where(elig, (state.dj + sgn * rel) / safe_a0, jnp.inf)
    elif opts.use_pallas_price and blk is not None:
        # fused BLOCK PRICE + Harris pass-1: reads the window-compacted
        # (nb, H, CB) tiles instead of the full (m, nt) G — HBM traffic
        # drops to the covered windows (~5x less on the bench staircase)
        from ..ops.pallas_price import price_and_ratios_block

        starts_b, W_b, m8_b = blk
        nbW, HW, CBW = W_b.shape
        ntp = nbW * CBW
        cand_dir = (at_lo | at_up) & ~fixed
        rho_p = (
            jnp.concatenate([rho, jnp.zeros(m8_b - m, rho.dtype)])
            if m8_b > m else rho
        )
        padc = ntp - nt

        def _padv(v, fill=0.0):
            return (jnp.concatenate(
                [v, jnp.full(padc, fill, v.dtype)]) if padc else v)

        al_b, th_b = price_and_ratios_block(
            rho_p, starts_b, W_b,
            _padv(state.dj), _padv(cand_dir.astype(jnp.int32)),
            _padv(sgn, 1.0), sigma, rel, opts.pivot_tolerance,
            interpret=jax.default_backend() != "tpu",
        )
        alpha = al_b[:nt].astype(G.dtype)
        a = sigma * alpha
        elig = (at_lo & (a > opts.pivot_tolerance)) | (
            at_up & (a < -opts.pivot_tolerance)
        )
        elig = elig & ~fixed
        theta_relaxed = jnp.where(elig, th_b[:nt].astype(G.dtype), jnp.inf)
    elif opts.use_pallas_price and ell is None:
        from ..ops.pallas_price import price_and_ratios

        cand_dir = (at_lo | at_up) & ~fixed
        alpha, theta_relaxed = price_and_ratios(
            rho, lp.G if G32 is None else G32, state.dj, cand_dir, sgn,
            sigma, rel, opts.pivot_tolerance,
            block_n=opts.price_block_n,
            interpret=jax.default_backend() != "tpu",
        )
        alpha = alpha.astype(G.dtype)
        a = sigma * alpha
        elig = (at_lo & (a > opts.pivot_tolerance)) | (
            at_up & (a < -opts.pivot_tolerance)
        )
        elig = elig & ~fixed
        theta_relaxed = jnp.where(elig, theta_relaxed.astype(G.dtype), jnp.inf)
    else:
        if pm1 is not None:
            alpha = _pm1_price(rho, pm1).astype(G.dtype)  # gathers only
        elif ell is not None:
            # sparse PRICE: HBM traffic O(nnz) instead of O(m*nt)
            alpha = _ell_price(rho, ell).astype(G.dtype)
        elif blk is not None:
            # block-banded PRICE: batched (nb,H)x(nb,H,CB) MXU tiles
            alpha = _blk_price(rho, blk, G.dtype, nt)
        elif G32 is not None and mixed:
            # HIGHEST: TPU f32 matmuls default to one bf16 MXU pass
            # (~1e-3 error) which would trip the accuracy check every pivot
            alpha = jnp.matmul(
                rho, G32, precision=jax.lax.Precision.HIGHEST
            ).astype(G.dtype)
        else:
            alpha = rho.astype(G.dtype) @ G  # tableau row r, full precision
        a = sigma * alpha
        elig = (at_lo & (a > opts.pivot_tolerance)) | (
            at_up & (a < -opts.pivot_tolerance)
        )
        elig = elig & ~fixed
        safe_a0 = jnp.where(elig, a, 1.0)
        theta_relaxed = jnp.where(elig, (state.dj + sgn * rel) / safe_a0, jnp.inf)

    # --- Harris two-pass dual ratio test (dualColumn0 equivalent) ---
    safe_a = jnp.where(elig, a, 1.0)
    theta_true = jnp.where(elig, state.dj / safe_a, jnp.inf)
    # ONE reduction kernel for both minima; the relaxed minimum is
    # clamped by the true minimum because under f32 pricing it can
    # undershoot and empty the window (exact-mode no-op)
    mins2 = jnp.min(jnp.stack([theta_relaxed, theta_true]), axis=1)
    theta_max = jnp.maximum(mins2[0], mins2[1])
    in_window = elig & (theta_true <= theta_max)
    pivot_mag = jnp.where(in_window, jnp.abs(a), -jnp.inf)
    # theta_true is +inf exactly where ~elig, so the (already-computed)
    # min over it decides any_elig without another nt-reduction
    any_elig = jnp.isfinite(mins2[1])
    if not (opts.dual_ratio == "bfrt" and "bfrt" not in opts.ablate):
        q = jnp.argmax(pivot_mag)

    if opts.dual_ratio == "bfrt" and "bfrt" not in opts.ablate:
        # long-step BFRT: sort breakpoints by dual ratio and walk past the
        # boxed ones while the leaving row's infeasibility slope stays
        # positive. Passing boxed j (it will flip by width_j) reduces the
        # slope by |a_j| * width_j; a breakpoint with an infinite-width
        # column is impassable. The entering column comes from the Harris
        # window around the slope-exhausting breakpoint; every breakpoint
        # strictly below it is handled by the existing flip machinery.
        # the whole breakpoint walk runs in f32 (f64 elementwise is
        # VPU-emulated ~12x slower) and divide-free; only the SELECTION
        # depends on it — the pivot element itself is still f64-verified.
        # A slightly conservative threshold is always valid: passing fewer
        # breakpoints is still a correct (shorter) long step.
        width32 = pre["width32"]
        boxed = pre["boxed"]
        a32 = jnp.abs(a).astype(jnp.float32)
        t32 = jnp.where(elig, theta_true, jnp.inf).astype(jnp.float32)
        gain = jnp.where(elig & boxed, a32 * width32, jnp.inf)
        # only the K smallest breakpoints can be walked in one pivot; top_k
        # is far cheaper than a full nt sort on TPU, and truncating at K is
        # a valid (shorter) long step — the walk just stops at breakpoint K.
        # (A sort-free log-histogram walk was tried here — 141 us of top_k
        # measured per pivot at nt=6656 — but degenerate ratio TIES get
        # treated atomically per bin, which shortened the long steps enough
        # to inflate iteration counts ~2.6x on the bench classes; top_k
        # passes ties individually and its wall cost is the cheaper side
        # of that trade. See round-4 log.)
        K = min(opts.bfrt_topk, nt)
        if opts.bfrt_select == "approx":
            neg_t, idxK = jax.lax.approx_max_k(-t32, K)
        else:
            neg_t, idxK = jax.lax.top_k(-t32, K)
        tK = -neg_t  # ascending K smallest ratios
        remain = infeas_r.astype(jnp.float32) - jnp.cumsum(
            jnp.where(elig, gain, 0.0)[idxK]
        )
        canpass = (remain > 0.0) & jnp.isfinite(tK)
        k_star = jnp.sum(jnp.cumprod(canpass.astype(jnp.int32)))
        theta_stop = tK[jnp.minimum(k_star, K - 1)]
        # threshold semantics (strict <) instead of ranks: no scatter, and
        # breakpoints tied with theta_stop stay unpassed (still eligible)
        passed = elig & boxed & (t32 < theta_stop)
        # Harris window around the stop, multiplied through by |a| to
        # avoid the f64 divide: theta <= stop + rel/|a|  <=>
        # theta*|a| <= stop*|a| + rel
        window_ls = (
            elig
            & ~passed
            & (t32 * a32 <= theta_stop * a32 + jnp.float32(rel))
        )
        # degenerate guard: if the long step passes every breakpoint
        # (slope never exhausted — a dual ray through flips alone), fall
        # back to the short-step Harris window above
        pivot_mag_ls = jnp.where(window_ls, a32, -jnp.inf)
        # ONE argmax kernel for both the short-step and long-step picks
        # (each argmax over nt is its own ~26 us reduction, round-5
        # microbench) — stacked (2, nt) reduce
        qq = jnp.argmax(
            jnp.stack([pivot_mag.astype(jnp.float32), pivot_mag_ls]),
            axis=1,
        )
        q, q_ls = qq[0], qq[1]
        # slope-validity check on the candidate (one f32 reduce over the
        # SAME predicate the flip set uses downstream): the walk is only
        # valid if the gain of exactly that set stays below the leaving
        # row's infeasibility — guards against truncation/rounding noise
        # in the cumsum selection (an overshoot here corrupted the basis
        # at 1536+ rows before this check existed). Gains in f32: the
        # f64 variant measured ~300 us/pivot of VPU-emulated work.
        # the long-step argmax lands on -inf only when window_ls is
        # empty: one gather replaces the jnp.any reduction
        use_ls = pivot_mag_ls[q_ls] > -jnp.inf
        tq_ls = theta_true[q_ls]
        would_flip = elig & pre["both_fin"] & (theta_true < tq_ls - 1e-12)
        gain_flip = jnp.sum(jnp.where(would_flip, a32 * width32, 0.0))
        use_ls = use_ls & (gain_flip < infeas_r.astype(jnp.float32))
        q = jnp.where(use_ls, q_ls, q)

    # --- bound flips decided FIRST (ClpSimplexDual flipBounds :6345):
    # candidates whose ratio falls strictly below the chosen pivot's ratio
    # would go dual infeasible after the price update — but having BOTH
    # bounds finite they can jump to the opposite bound instead. Deciding
    # them before the FTRAN lets their flow share its binv contraction.
    vlo = pre["vlo"]
    vup = pre["vup"]
    # ONE gather for every column-q scalar (same batching as row_stack)
    col_stack = jnp.stack([
        theta_true, state.dj, vlo, vup,
        state.vstat.astype(theta_true.dtype),
        alpha.astype(theta_true.dtype),
    ])
    col_q = jax.lax.dynamic_slice_in_dim(col_stack, q, 1, axis=1)[:, 0]
    theta_q, dj_q, vlo_q, vup_q, vstat_q_f, alpha_rq = (
        col_q[0], col_q[1], col_q[2], col_q[3], col_q[4], col_q[5])
    both_fin = pre["both_fin"]
    idx = jnp.arange(nt)
    if "flip" in opts.ablate:  # timing-only: no flips -> no flow matvec
        flip = jnp.zeros_like(elig) & elig
    else:
        flip = elig & both_fin & (theta_true < theta_q - 1e-12) & (idx != q)
    width = pre["width"]
    flip_delta = jnp.where(flip, jnp.where(at_lo, width, -width), 0.0)
    flip_any = jnp.any(flip)
    if "forceflow" in opts.ablate:  # timing-only: always pay the flow matvec
        flip_any = jnp.asarray(True)

    # --- FTRAN entering column + DSE tau (+ flip flow), fused: ONE read
    # of binv for all three m^2 contractions ---
    binv_fused = None  # set when the fused Pallas pivot kernel ran
    if "ftran" in opts.ablate:  # timing-only: skip the binv contractions
        abar = rho.astype(G.dtype)
        tau = abar
        flow = jnp.zeros_like(abar)
    elif pm1 is not None:
        abar = _pm1_ftran_col(state.binv, q, pm1).astype(G.dtype)
        tau = jnp.matmul(
            state.binv, rho, precision=jax.lax.Precision.HIGHEST
        ).astype(G.dtype)
        flow = jax.lax.cond(
            flip_any,
            lambda: jnp.matmul(
                state.binv,
                _pm1_matvec(flip_delta, pm1, m).astype(state.binv.dtype),
                precision=jax.lax.Precision.HIGHEST,
            ).astype(G.dtype),
            lambda: jnp.zeros_like(state.xb),
        )
    else:
        if ell is not None:
            # sparse forms: Gq scattered from the column pad, flip flow as
            # a row-gather matvec — O(nnz) instead of O(m*nt)
            Gq = _ell_col(q, ell, m)
            fdelta = jax.lax.cond(
                flip_any,
                lambda: _ell_matvec(flip_delta, ell),
                lambda: jnp.zeros_like(Gq),
            )
        elif blk is not None:
            Gq = _blk_col(q, blk, m).astype(G.dtype)
            fdelta = jax.lax.cond(
                flip_any,
                lambda: _blk_matvec(flip_delta, blk, m).astype(G.dtype),
                lambda: jnp.zeros_like(Gq),
            )
        else:
            Gf = G32 if (G32 is not None and mixed) else G
            Gq = Gf[:, q]
            # mixed engine: the m x nt contraction runs against the f32 G
            # copy (f64 matvecs are VPU-emulated ~12x slower, and BFRT long
            # steps flip on most pivots); drift is covered by the f64
            # recompute at refactorization like every other f32 quantity
            fdelta = jax.lax.cond(
                flip_any,
                lambda: jnp.matmul(
                    Gf, flip_delta.astype(Gf.dtype),
                    precision=jax.lax.Precision.HIGHEST,
                ),
                lambda: jnp.zeros_like(Gq),
            )
        triple = jnp.stack([
            Gq.astype(state.binv.dtype),
            rho.astype(state.binv.dtype),
            fdelta.astype(state.binv.dtype),
        ], axis=1)
        if (
            opts.use_pallas_pivot
            and mixed
            and state.binv.dtype == jnp.float32
        ):
            # fused kernel: the 3-column FTRAN AND the rank-1 update in a
            # single pass over binv. The pivot element comes from the
            # consistent scalar rho . g_q (arithmetically row r of the same
            # contraction); the pivot gate is decided BEFORE the kernel so
            # a rejected pivot writes binv back unchanged.
            from ..ops.pallas_pivot import fused_pivot_update

            rho32 = rho.astype(jnp.float32)
            abar_r32 = jnp.dot(
                rho32, triple[:, 0], precision=jax.lax.Precision.HIGHEST
            )
            abar_r_f = abar_r32.astype(G.dtype)
            acc_bad_f = jnp.abs(alpha_rq - abar_r_f) > 2e-4 * (
                1.0 + jnp.abs(abar_r_f)
            )
            piv_small_f = jnp.abs(abar_r_f) < max(opts.pivot_tolerance, 1e-6)
            gate = (
                any_infeas & any_elig & ~acc_bad_f & ~piv_small_f
                & ~state.refactor_now
                & (state.iterations < opts.max_iterations)
            ).astype(jnp.float32)
            binv_fused, res = fused_pivot_update(
                state.binv, triple, rho32, abar_r32, gate,
                r.astype(jnp.int32),
                interpret=jax.default_backend() != "tpu",
            )
            abar = res[:, 0].astype(G.dtype)
            tau = res[:, 1]  # stays f32: only feeds the weight update
            flow = res[:, 2].astype(G.dtype)
        else:
            ftran3 = jnp.matmul(
                state.binv, triple, precision=jax.lax.Precision.HIGHEST
            )
            abar = ftran3[:, 0].astype(G.dtype)
            tau = ftran3[:, 1]  # inverse dtype: only feeds the weight update
            flow = ftran3[:, 2].astype(G.dtype)
    abar_r = abar[r] if binv_fused is None else abar_r_f
    # accuracy cross-check (reference: dual checks alpha vs ftran value).
    # f32 pricing widens the acceptable discrepancy; the f64 abar_r is the
    # value actually used for the pivot either way.
    acc_tol = (
        2e-4 if (opts.use_pallas_price or mixed or ell is not None) else 1e-8
    )
    acc_bad = jnp.abs(alpha_rq - abar_r) > acc_tol * (1.0 + jnp.abs(abar_r))
    # f32 FTRAN values below ~1e-6 relative are noise: treat them as
    # too-small pivots (forces a fresh f64 factorization instead)
    piv_floor = max(opts.pivot_tolerance, 1e-6) if mixed else opts.pivot_tolerance
    piv_small = jnp.abs(abar_r) < piv_floor

    # pivot gate, decided as soon as the pivot element is known so the
    # rank-1 update can fold it into `factor` (a gated no-op subtracts an
    # exact zero outer product) instead of paying an m x m select on binv
    # afterwards. The ~refactor_now / iteration-limit terms freeze the
    # state exactly where the inner while_loop would have stopped, which
    # makes the body safe to over-run in lax.scan blocks (inner_unroll).
    do_pivot = (
        any_infeas & any_elig & ~acc_bad & ~piv_small
        & ~state.refactor_now
        & (state.iterations < opts.max_iterations)
    )

    # --- primal step: leaving variable lands on its violated bound,
    # after accounting for the flip flow ---
    target = jnp.where(sigma > 0, ub_r, lb_r)
    delta_q = (xb_r - flow[r] - target) / abar_r
    xq_old = jnp.where(vstat_q_f == AT_LOWER, vlo_q, vup_q)
    xq_new = xq_old + delta_q

    # --- dual step + dj update ---
    # the f64 FTRAN value abar_r is the authoritative pivot element
    # (alpha[q] may be f32-precision when Pallas pricing is on).
    # Point updates are full-vector selects, not scatters: tiny .at[]
    # scatters serialize on the TPU (measured ~125 us/pivot of pure
    # bookkeeping at nt=6656); a select fuses with the neighboring
    # elementwise work.
    im = jnp.arange(m)
    theta_d = dj_q / abar_r
    p_leave = state.basis[r]
    # scalar where-gates, not *0 products: abar_r can be exactly 0 on a
    # gated iteration (piv_small), making theta_d/inv_piv inf — inf*0
    # would poison the vectors with NaN where a select stays exact.
    # (A fuller restructure — folding the gate into every point update and
    # keeping DSE weights in f32 — was measured at par on the v5e slope
    # microbench (300.2 vs 298.4 us: XLA already fuses the selects) and
    # the f32 weight RECURRENCE stalled the 2048-row staircase via
    # cancellation, so only binv's gate-fold is kept. Round 5.)
    inv_piv = 1.0 / abar_r
    s_piv = jnp.where(do_pivot, inv_piv, 0.0)
    if "book" in opts.ablate:  # timing-only: skip point updates
        dj_new = state.dj
        w_new = state.weights
    else:
        dj_new = state.dj - theta_d * alpha
        dj_new = jnp.where(idx == q, 0.0, dj_new)
        dj_new = jnp.where(idx == p_leave, -theta_d, dj_new)

        # --- DSE weight update (Forrest-Goldfarb) ---
        wr = jnp.maximum(w_r, 1e-50)
        ratio = abar / abar_r
        w_new = state.weights - 2.0 * ratio * tau.astype(
            state.weights.dtype) + ratio * ratio * wr
        w_new = jnp.maximum(w_new, 1e-8)
        w_new = jnp.where(
            im == r, jnp.maximum(wr / (abar_r * abar_r), 1e-8), w_new
        )

    # --- basis inverse product-form update (binv's own dtype); the fused
    # Pallas kernel already wrote it (gated) in the same pass as the FTRAN
    if "update" in opts.ablate:  # timing-only: skip the rank-1 update
        binv_new = state.binv
    elif binv_fused is None:
        # pivot-gated factor (s_piv above): one f64 divide per pivot
        # instead of m, and a gated no-op subtracts an exact zero outer
        # product — binv - 0*row == binv, so no m x m select is needed
        factor = abar * s_piv
        factor = jnp.where(
            im == r, jnp.where(do_pivot, 1.0 - inv_piv, 0.0), factor
        )
        binv_new = state.binv - jnp.outer(
            factor.astype(state.binv.dtype), state.binv[r, :]
        )
    else:
        binv_new = binv_fused

    # --- basic solution update ---
    if "book" in opts.ablate:  # timing-only
        xb_new = state.xb
        basis_new = state.basis
        vstat_new = state.vstat
    else:
        xb_new = jnp.where(im == r, xq_new, state.xb - delta_q * abar - flow)

        basis_new = jnp.where(
            im == r, q.astype(state.basis.dtype), state.basis
        ).astype(state.basis.dtype)
        # apply bound flips first, then the pivot's status changes
        vstat_flipped = jnp.where(
            flip, jnp.where(at_lo, AT_UPPER, AT_LOWER), state.vstat
        )
        vstat_new = jnp.where(
            idx == p_leave, jnp.where(sigma > 0, AT_UPPER, AT_LOWER),
            vstat_flipped,
        )
        vstat_new = jnp.where(idx == q, BASIC, vstat_new).astype(
            state.vstat.dtype)

    # --- dispatch on special cases (do_pivot decided above, pre-update) ---
    status = jnp.where(
        ~any_infeas,
        OPTIMAL,
        jnp.where(~any_elig, PRIMAL_INFEASIBLE, state.status),
    ).astype(state.status.dtype)
    # accuracy problems: ask for refactorization instead of pivoting.
    # (A DSE-weight soft-flag for tiny pivots was tried here and
    # destabilized the f32 engine — pressing past the floor lets binv
    # blow up; the driver's warm f64 continuation is the safe policy.)
    refactor_now = state.refactor_now | (any_infeas & any_elig & (acc_bad | piv_small))

    new_state = SimplexState(
        basis=jnp.where(do_pivot, basis_new, state.basis),
        vstat=jnp.where(do_pivot, vstat_new, state.vstat),
        binv=binv_new,  # pivot-gated in place: the fused kernel gates its
        # write, the XLA path folds the gate into `factor` (exact no-op)
        xb=jnp.where(do_pivot, xb_new, state.xb),
        dj=jnp.where(do_pivot, dj_new, state.dj),
        y=state.y,  # refreshed at refactorization
        weights=jnp.where(do_pivot, w_new, state.weights),
        wcol=state.wcol,
        iterations=state.iterations + do_pivot.astype(state.iterations.dtype),
        status=status,
        refactor_now=refactor_now,
        refactors=state.refactors,
    )
    return new_state


# --------------------------------------------------------------------------
# Primal simplex
# --------------------------------------------------------------------------


def primal_iteration(lp: StandardLP, state: SimplexState, opts: SimplexOptions,
                     pm1=None, G32=None):
    """One primal pivot with composite phase-1 handling.

    Phase 1 uses the infeasibility-gradient objective (the vectorized
    equivalent of ClpNonLinearCost's composite costs, ClpNonLinearCost.hpp:
    8-28): basic variables outside their bounds contribute +-1 costs.

    When opts.inverse_dtype == "float32", binv arrives in f32 and the
    O(m^2)/O(m*nt) work against it (BTRAN, PRICE, FTRAN, rank-1 update)
    stays f32 at HIGHEST precision; scalars feeding the f64 solution
    updates are upcast (same contract as dual_iteration).
    """
    G = lp.G
    m, nt = G.shape
    ptol = opts.primal_tolerance
    dtol = opts.dual_tolerance
    mixed = opts.inverse_dtype == "float32"
    HI = jax.lax.Precision.HIGHEST
    Gp_ = G32 if (G32 is not None and mixed) else G  # PRICE/FTRAN source

    def _bmm(a, b):  # matmul in binv's own dtype at full f32 accuracy
        return jnp.matmul(
            a.astype(state.binv.dtype), b.astype(state.binv.dtype),
            precision=HI,
        ).astype(G.dtype)

    lb, ub = _basic_bounds(lp, state.basis)
    below = lb - state.xb
    above = state.xb - ub
    sig = jnp.where(above > ptol, 1.0, jnp.where(below > ptol, -1.0, 0.0))
    in_phase1 = jnp.any(sig != 0.0)

    # phase-1 reduced costs: d1_j = -(sig' Binv G)_j
    y1 = _bmm(sig, state.binv)
    d1 = -_pm1_price(y1, pm1).astype(G.dtype) if pm1 is not None else -_bmm(y1, Gp_)
    dj_used = jnp.where(in_phase1, d1, state.dj)

    at_lo = state.vstat == AT_LOWER
    at_up = state.vstat == AT_UPPER
    at_fr = state.vstat == FREE
    fixed = lp.l == lp.u
    elig = (
        ((at_lo & (dj_used < -dtol)) | (at_up & (dj_used > dtol)))
        | (at_fr & (jnp.abs(dj_used) > dtol))
    ) & ~fixed

    # --- column choice (ClpPrimalColumnSteepest mode family + PE) ---
    if opts.primal_pivot == "dantzig":
        score = jnp.where(elig, jnp.abs(dj_used), -jnp.inf)
    else:
        # devex / exact steepest edge share the dj^2/weight form; they
        # differ in how wcol is maintained after the pivot below
        score = jnp.where(
            elig, dj_used * dj_used / jnp.maximum(state.wcol, 1e-50), -jnp.inf
        )
    if opts.primal_pivot == "partial":
        # rotating candidate window (partial pricing). Selection-only on
        # TPU: the dense dj update is one fused vector op either way, so the
        # win is the reference-matching pivot trajectory, not FLOPs.
        W = opts.partial_window if opts.partial_window > 0 else max(64, nt // 8)
        W = min(W, nt)
        start = (state.iterations.astype(jnp.int32) * W) % nt
        in_window = ((jnp.arange(nt) - start) % nt) < W
        score_w = jnp.where(in_window, score, -jnp.inf)
        score = jnp.where(jnp.any(score_w > -jnp.inf), score_w, score)
    elif opts.primal_pivot == "pe":
        # Positive Edge (ClpPESimplex.hpp:45): a column is compatible when
        # its FTRAN has ~zero overlap with the degenerate basic rows, so
        # entering it moves the objective. Random projection test.
        key = jax.random.fold_in(jax.random.PRNGKey(777), state.iterations)
        deg_rows = (jnp.abs(below) <= ptol) | (jnp.abs(above) <= ptol)
        z = jnp.where(deg_rows, jax.random.rademacher(key, (m,), G.dtype), 0.0)
        w = _bmm(z, state.binv)
        wg = _pm1_price(w, pm1).astype(G.dtype) if pm1 is not None else _bmm(w, Gp_)
        nrm = jnp.sqrt(jnp.maximum(jnp.sum(z * z), 1.0))
        compat = jnp.abs(wg) <= 1e-8 * nrm
        best_all = jnp.max(score, initial=-jnp.inf)
        score_c = jnp.where(compat, score, -jnp.inf)
        best_c = jnp.max(score_c, initial=-jnp.inf)
        score = jnp.where(best_c >= opts.pe_psi * best_all, score_c, score)
    q = jnp.argmax(score)
    any_elig = jnp.any(elig)

    direction = jnp.where(at_up[q], -1.0, jnp.where(at_fr[q], -jnp.sign(dj_used[q]), 1.0))

    # --- FTRAN ---
    if pm1 is not None:
        abar = _pm1_ftran_col(state.binv, q, pm1).astype(G.dtype)
    else:
        abar = _bmm(state.binv, Gp_[:, q])
    d = direction * abar  # xb changes by -t * d for entering step t >= 0

    # --- Harris two-pass primal ratio test (primalRow equivalent) ---
    # Block at the FIRST kink in the direction of travel: an infeasible-above
    # basic moving down hits its upper bound first (it lands there feasible);
    # a basic already below its lower bound moving further down has no kink
    # in that direction (phase-1 gradient already accounts for it).
    dec = d > opts.pivot_tolerance  # basic value decreasing
    inc = d < -opts.pivot_tolerance
    lb_f = jnp.isfinite(lb)
    ub_f = jnp.isfinite(ub)
    is_above = above > ptol
    is_below = below > ptol
    # bound each moving basic blocks at (value), +-inf if none
    dec_bnd = jnp.where(is_above, ub, jnp.where(is_below, -jnp.inf, jnp.where(lb_f, lb, -jnp.inf)))
    inc_bnd = jnp.where(is_below, lb, jnp.where(is_above, jnp.inf, jnp.where(ub_f, ub, jnp.inf)))
    block_dec = dec & jnp.isfinite(dec_bnd)
    block_inc = inc & jnp.isfinite(inc_bnd)
    blocking = block_dec | block_inc
    safe_d = jnp.where(dec | inc, d, 1.0)
    bnd = jnp.where(block_dec, dec_bnd, inc_bnd)
    # relaxed ratios (pass 1): allow ptol overshoot past the bound
    t_rel = jnp.where(blocking, (state.xb - bnd) / safe_d + ptol / jnp.abs(safe_d), jnp.inf)
    theta_max = jnp.min(t_rel, initial=jnp.inf)
    # true ratios (pass 2): pick largest pivot within window
    t_true = jnp.where(blocking, jnp.maximum((state.xb - bnd) / safe_d, 0.0), jnp.inf)
    in_window = blocking & (t_true <= theta_max)
    pivot_mag = jnp.where(in_window, jnp.abs(d), -jnp.inf)
    r = jnp.argmax(pivot_mag)
    has_block = jnp.any(in_window)
    theta_basic = jnp.where(has_block, t_true[r], jnp.inf)

    # entering variable's own opposite bound (bound flip)
    width_q = lp.u[q] - lp.l[q]
    theta_own = jnp.where(jnp.isfinite(width_q), width_q, jnp.inf)
    theta = jnp.minimum(theta_basic, theta_own)

    unbounded = ~jnp.isfinite(theta) & any_elig
    flip = (theta_own <= theta_basic) & jnp.isfinite(theta_own)
    theta = jnp.maximum(theta, 0.0)

    # --- updates ---
    xb_step = state.xb - theta * d

    # dual updates need the BTRAN row of the leaving basic (pivot row)
    rho = state.binv[r, :]
    alpha = _pm1_price(rho, pm1).astype(G.dtype) if pm1 is not None else _bmm(rho, Gp_)
    alpha_rq = alpha[q]
    abar_r = abar[r]
    acc_tol = 2e-4 if mixed else 1e-8
    acc_bad = jnp.abs(alpha_rq - abar_r) > acc_tol * (1.0 + jnp.abs(abar_r))
    piv_floor = max(opts.pivot_tolerance, 1e-6) if mixed else opts.pivot_tolerance
    piv_small = jnp.abs(abar_r) < piv_floor

    theta_d = state.dj[q] / alpha_rq
    dj_piv = state.dj - theta_d * alpha
    dj_piv = dj_piv.at[q].set(0.0)
    p_leave = state.basis[r]
    dj_piv = dj_piv.at[p_leave].set(-theta_d)

    wq = jnp.maximum(state.wcol[q], 1e-50)
    if opts.primal_pivot == "steepest":
        # exact steepest edge, Forrest-Goldfarb primal update:
        # gamma_j' = max(gamma_j - 2 eta_j (a_j . w) + eta_j^2 gamma_q,
        #                1 + eta_j^2),  eta_j = alpha_j / alpha_rq,
        # w = B^-T abar. Costs one extra BTRAN + PRICE per pivot — the
        # same trade the reference's exact mode makes.
        w_se = _bmm(state.binv.T, abar)
        ag = _pm1_price(w_se, pm1).astype(G.dtype) if pm1 is not None else _bmm(w_se, Gp_)
        eta = alpha / abar_r
        w_piv = jnp.maximum(
            state.wcol - 2.0 * eta * ag + eta * eta * wq, 1.0 + eta * eta
        )
        w_piv = w_piv.at[p_leave].set(
            jnp.maximum(wq / (abar_r * abar_r), 1.0 + 1.0 / (abar_r * abar_r))
        )
        w_piv = w_piv.at[q].set(1.0)
    else:
        # devex reference-framework update (ClpPrimalColumnSteepest mode 3-ish)
        alpha_sq = alpha * alpha
        w_piv = jnp.maximum(state.wcol, alpha_sq * (wq / (alpha_rq * alpha_rq)))
        w_piv = w_piv.at[q].set(jnp.maximum(wq / (alpha_rq * alpha_rq), 1.0))

    factor = abar / abar_r
    factor = factor.at[r].set(1.0 - 1.0 / abar_r)
    binv_piv = state.binv - jnp.outer(
        factor.astype(state.binv.dtype), state.binv[r, :]
    )

    xq_old = jnp.where(
        at_lo[q], lp.l[q], jnp.where(at_up[q], lp.u[q], 0.0)
    )
    xq_new = xq_old + direction * theta
    xb_piv = xb_step.at[r].set(xq_new)

    # leaving variable status: lands on the bound it hit
    hit_lower = jnp.where(block_dec[r], ~is_above[r], is_below[r])
    leave_stat = jnp.where(hit_lower, AT_LOWER, AT_UPPER)
    basis_piv = state.basis.at[r].set(q.astype(state.basis.dtype))
    vstat_piv = state.vstat.at[p_leave].set(leave_stat.astype(state.vstat.dtype))
    vstat_piv = vstat_piv.at[q].set(BASIC)

    # bound-flip variant: no basis change
    flip_stat = jnp.where(at_lo[q], AT_UPPER, AT_LOWER)
    vstat_flip = state.vstat.at[q].set(flip_stat.astype(state.vstat.dtype))

    # ~refactor_now / iteration-limit freeze the body exactly where the
    # inner while_loop stops, so it is safe to over-run in inner_unroll
    # scan blocks (same contract as dual_iteration's do_pivot gate)
    do_any = (
        any_elig & ~unbounded & ~state.refactor_now
        & (state.iterations < opts.max_iterations)
    )
    do_flip = do_any & flip
    do_pivot = do_any & ~flip & has_block & ~acc_bad & ~piv_small
    bad = do_any & ~flip & has_block & (acc_bad | piv_small)

    status = jnp.where(
        ~any_elig,
        jnp.where(in_phase1, PRIMAL_INFEASIBLE, OPTIMAL),
        jnp.where(unbounded, jnp.where(in_phase1, NUMERICAL, DUAL_INFEASIBLE), state.status),
    ).astype(state.status.dtype)
    refactor_now = state.refactor_now | bad

    new_state = SimplexState(
        basis=jnp.where(do_pivot, basis_piv, state.basis),
        vstat=jnp.where(do_pivot, vstat_piv, jnp.where(do_flip, vstat_flip, state.vstat)),
        binv=jnp.where(do_pivot, binv_piv, state.binv),
        xb=jnp.where(do_pivot, xb_piv, jnp.where(do_flip, xb_step, state.xb)),
        dj=jnp.where(do_pivot, dj_piv, state.dj),
        y=state.y,
        weights=state.weights,
        wcol=jnp.where(do_pivot, w_piv, state.wcol),
        iterations=state.iterations + (do_pivot | do_flip).astype(state.iterations.dtype),
        status=status,
        refactor_now=refactor_now,
        refactors=state.refactors,
    )
    return new_state


# --------------------------------------------------------------------------
# Chunked solve loops
# --------------------------------------------------------------------------


def _primal_feasible(lp: StandardLP, state: SimplexState, opts: SimplexOptions):
    lb, ub = _basic_bounds(lp, state.basis)
    infeas = jnp.maximum(jnp.maximum(lb - state.xb, state.xb - ub), 0.0)
    return jnp.max(infeas, initial=0.0) <= opts.primal_tolerance


def _dual_feasible(lp: StandardLP, state: SimplexState, opts: SimplexOptions):
    at_lo = state.vstat == AT_LOWER
    at_up = state.vstat == AT_UPPER
    fixed = lp.l == lp.u
    viol = jnp.where(
        at_lo & ~fixed,
        jnp.maximum(-state.dj, 0.0),
        jnp.where(at_up & ~fixed, jnp.maximum(state.dj, 0.0), 0.0),
    )
    return jnp.max(viol, initial=0.0) <= opts.dual_tolerance * 10.0


def _verify_dual_claim(lp, state, opts):
    # dual simplex optimality = primal feasibility on fresh factors
    return _primal_feasible(lp, state, opts)


def _verify_primal_claim(lp, state, opts):
    # primal simplex optimality = feasible AND no attractive entering column
    return _primal_feasible(lp, state, opts) & _dual_feasible(lp, state, opts)


def _run_loop(lp: StandardLP, state: SimplexState, opts: SimplexOptions, iteration_fn,
              verify_fn, max_chunks: int = 0):
    """outer refactorize loop + inner pivot loop (gutsOfDual structure).

    An OPTIMAL claim from the inner loop is only accepted after a fresh
    refactorization confirms it (`verify_fn`) — incremental state drifts,
    and the reference re-verifies the same way before finishing
    (statusOfProblemInDual, ClpSimplexDual.cpp:4996).

    max_chunks > 0 bounds the OUTER loop: the solve returns after that
    many refactor-chunks even if unfinished (status CONTINUE, claims
    unverified). Used by the batched compacting loop to run several
    chunk+verify rounds per device dispatch (vmapped while_loops mask
    finished lanes, so early finishers cost ~nothing while the batch
    drains) instead of paying one host round trip per chunk.
    """

    chunk = opts.refactor_frequency
    U = max(1, int(opts.inner_unroll))

    def inner_cond(carry):
        st, k = carry
        return (
            (st.status == CONTINUE)
            & (k < chunk)
            & ~st.refactor_now
            & (st.iterations < opts.max_iterations)
        )

    def inner_body(carry):
        # U pivots per while iteration: the while_loop boundary costs
        # ~39 us/pivot on the v5e tunnel (round-5 slope microbench); scan
        # blocks amortize it. The pivot body freezes itself (do_pivot
        # gate) once a stop condition holds, so over-running a block is
        # a gated no-op, never a semantic change.
        st, k = carry
        if U == 1:
            return iteration_fn(lp, st, opts), k + 1
        st, _ = jax.lax.scan(
            lambda s, _: (iteration_fn(lp, s, opts), None), st, None,
            length=U)
        return st, k + U

    def outer_cond(carry):
        st, stalls, verified, rounds = carry
        claim = (
            (st.status == OPTIMAL)
            | (st.status == PRIMAL_INFEASIBLE)
            | (st.status == DUAL_INFEASIBLE)
        )
        running = (st.status == CONTINUE) | (claim & ~verified)
        ok = running & (st.iterations < opts.max_iterations) & (stalls < 3)
        if max_chunks > 0:
            ok = ok & (rounds < max_chunks)
        return ok

    def outer_body(carry):
        st, stalls, _, rounds = carry
        iters_before = st.iterations
        claimed_optimal = st.status == OPTIMAL
        claimed_terminal = (st.status == PRIMAL_INFEASIBLE) | (
            st.status == DUAL_INFEASIBLE
        )
        claimed_status = st.status
        st = recompute(lp, st, opts.dual_bound)
        verified = claimed_optimal & verify_fn(lp, st, opts) & (st.status != NUMERICAL)
        # re-open EVERY claim on fresh factors: an optimality claim is
        # checked directly (verify_fn); an infeasible/unbounded claim from
        # drifted incremental state is only accepted if the re-run
        # re-derives it without managing a single pivot (reference:
        # statusOfProblemInDual re-checks before finishing)
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
        reclaimed = (
            claimed_terminal
            & (st.status == claimed_status)
            & (st.iterations == iters_before)
        )
        verified = verified | reclaimed
        # stall: a chunk that made no pivots right after a fresh factorization
        # means a persistent numerical block (tiny pivot) -> escalate
        # (reference analogue: saferTolerances / flagging,
        # ClpFactorization.hpp:227, ClpSimplex flagged variables)
        made_progress = (st.iterations > iters_before) | verified
        stalls = jnp.where(made_progress, 0, stalls + 1).astype(stalls.dtype)
        return st, stalls, verified, rounds + 1

    state, stalls, verified, _rounds = jax.lax.while_loop(
        outer_cond, outer_body,
        (state, jnp.asarray(0, jnp.int32), jnp.asarray(False),
         jnp.asarray(0, jnp.int32)),
    )
    state = dataclasses.replace(
        state,
        status=jnp.where(
            (state.status == CONTINUE) & (stalls >= 3), NUMERICAL, state.status
        ).astype(state.status.dtype),
    )
    if max_chunks > 0:
        # bounded mode: report verification to the caller; an unfinished
        # solve keeps CONTINUE (the ITER_LIMIT stamp below still applies)
        state = jax.lax.cond(
            verified, lambda s: s, lambda s: recompute(lp, s, opts.dual_bound),
            state,
        )
        state = dataclasses.replace(
            state,
            status=jnp.where(
                (state.status == CONTINUE)
                & (state.iterations >= opts.max_iterations),
                ITER_LIMIT,
                state.status,
            ).astype(state.status.dtype),
        )
        return state, verified
    # final consistency pass (already on fresh factors if the claim verified)
    state = jax.lax.cond(
        verified, lambda s: s, lambda s: recompute(lp, s, opts.dual_bound), state
    )
    state = dataclasses.replace(
        state,
        status=jnp.where(
            (state.status == CONTINUE) & (state.iterations >= opts.max_iterations),
            ITER_LIMIT,
            state.status,
        ).astype(state.status.dtype),
    )
    return state


def _dual_iteration_fn(lp: StandardLP, opts: SimplexOptions):
    """Dual iteration closure; hoists loop-invariant matrix forms out of
    the pivot loop (the f32 G copy for Pallas/mixed-precision pricing, or
    the +-1 index arrays for multiply-free pricing)."""
    pre = pivot_invariants(lp, opts)
    if opts.price_mode == "pm1" and not opts.use_pallas_price:
        return partial(dual_iteration, pm1=pm1_indices(lp.G), pre=pre)
    if opts.price_mode == "ell" and opts.price_ell_kc > 0:
        return partial(
            dual_iteration,
            ell=ell_forms(lp.G, opts.price_ell_kc, opts.price_ell_kr),
            pre=pre,
        )
    if opts.price_mode == "block" and opts.price_block_nb > 0:
        Gb = (lp.G.astype(jnp.float32)
              if (opts.inverse_dtype == "float32" or opts.use_pallas_price)
              else lp.G)
        return partial(
            dual_iteration,
            blk=block_forms(Gb, opts.price_block_nb, opts.price_block_h,
                            opts.price_block_cb),
            pre=pre,
        )
    if opts.use_pallas_price or opts.inverse_dtype == "float32":
        G32 = lp.G.astype(jnp.float32)
        return partial(dual_iteration, G32=G32, pre=pre)
    return partial(dual_iteration, pre=pre)


def _primal_iteration_fn(lp: StandardLP, opts: SimplexOptions):
    if opts.price_mode == "pm1":
        return partial(primal_iteration, pm1=pm1_indices(lp.G))
    if opts.inverse_dtype == "float32":
        return partial(primal_iteration, G32=lp.G.astype(jnp.float32))
    return primal_iteration


@partial(jax.jit, static_argnames=("opts",))
def dual_solve(lp: StandardLP, state: SimplexState, opts: SimplexOptions) -> SimplexState:
    return _run_loop(lp, state, opts, _dual_iteration_fn(lp, opts), _verify_dual_claim)


def dual_solve_rounds(lp: StandardLP, state: SimplexState, opts: SimplexOptions,
                      rounds: int):
    """Bounded dual solve: at most `rounds` refactor-chunks, full claim
    protocol inside. Returns (state, verified). Not jitted here — the
    batched loop vmaps + jits it per bucket shape."""
    return _run_loop(lp, state, opts, _dual_iteration_fn(lp, opts),
                     _verify_dual_claim, max_chunks=rounds)


@partial(jax.jit, static_argnames=("opts",))
def primal_solve(lp: StandardLP, state: SimplexState, opts: SimplexOptions) -> SimplexState:
    return _run_loop(lp, state, opts, _primal_iteration_fn(lp, opts), _verify_primal_claim)


def _one_chunk(lp, state, opts, iteration_fn, verify_fn):
    """Refactorize + verify any OPTIMAL claim + up to `chunk` pivots.

    The host-chunked execution mode: the outer statusOfProblem loop runs in
    Python (enabling wall-clock limits and per-chunk progress callbacks)
    while each chunk stays one compiled program. Returns
    (state, verified, objective) — objective of the current iterate for
    progress display.
    """
    chunk = opts.refactor_frequency
    claimed_optimal = state.status == OPTIMAL
    state = recompute(lp, state, opts.dual_bound)
    verified = claimed_optimal & verify_fn(lp, state, opts) & (state.status != NUMERICAL)
    state = dataclasses.replace(
        state,
        status=jnp.where(
            state.status == NUMERICAL,
            NUMERICAL,
            jnp.where(verified, OPTIMAL, CONTINUE),
        ).astype(state.status.dtype),
    )

    def inner_cond(carry):
        st, k = carry
        return (
            (st.status == CONTINUE)
            & (k < chunk)
            & ~st.refactor_now
            & (st.iterations < opts.max_iterations)
        )

    U = max(1, int(opts.inner_unroll))

    def inner_body(carry):
        st, k = carry
        if U == 1:
            return iteration_fn(lp, st, opts), k + 1
        st, _ = jax.lax.scan(
            lambda s, _: (iteration_fn(lp, s, opts), None), st, None,
            length=U)
        return st, k + U

    def run(st):
        st, _ = jax.lax.while_loop(inner_cond, inner_body, (st, 0))
        return st

    state = jax.lax.cond(verified, lambda s: s, run, state)
    xn = nonbasic_values(lp, state.vstat, opts.dual_bound)
    obj = jnp.take(lp.c, state.basis) @ state.xb + lp.c @ xn
    return state, verified, obj


@partial(jax.jit, static_argnames=("opts",))
def dual_chunk(lp: StandardLP, state: SimplexState, opts: SimplexOptions):
    return _one_chunk(lp, state, opts, _dual_iteration_fn(lp, opts), _verify_dual_claim)


@partial(jax.jit, static_argnames=("opts",))
def primal_chunk(lp: StandardLP, state: SimplexState, opts: SimplexOptions):
    return _one_chunk(lp, state, opts, _primal_iteration_fn(lp, opts), _verify_primal_claim)


def _pack_info(state: SimplexState, verified, obj):
    return jnp.stack([
        state.status.astype(jnp.float64),
        state.iterations.astype(jnp.float64),
        verified.astype(jnp.float64),
        obj.astype(jnp.float64),
    ])


@partial(jax.jit, static_argnames=("opts",))
def dual_chunk_packed(lp: StandardLP, state: SimplexState,
                      opts: SimplexOptions):
    """dual_chunk + ONE packed f64[4] = [status, iterations, verified,
    objective] so host chunk loops pay a single device fetch per chunk.
    Through a tunnel-attached chip each scalar fetch is its own ~20-30 ms
    RPC; the round-4 bench protocol paid 4 of them per 800-pivot chunk —
    ~150 us/pivot of pure fetch latency (round-5 finding)."""
    state, verified, obj = _one_chunk(
        lp, state, opts, _dual_iteration_fn(lp, opts), _verify_dual_claim)
    return state, _pack_info(state, verified, obj)


@partial(jax.jit, static_argnames=("opts",))
def primal_chunk_packed(lp: StandardLP, state: SimplexState,
                        opts: SimplexOptions):
    state, verified, obj = _one_chunk(
        lp, state, opts, _primal_iteration_fn(lp, opts),
        _verify_primal_claim)
    return state, _pack_info(state, verified, obj)


def initial_state(lp: StandardLP, opts: SimplexOptions, vstat=None, basis=None) -> SimplexState:
    """All-slack starting basis (or caller-provided warm start arrays)."""
    m, nt = lp.G.shape
    n = nt - m
    if basis is None:
        basis = jnp.arange(n, n + m, dtype=jnp.int32)
    if vstat is None:
        lf = jnp.isfinite(lp.l[:n])
        uf = jnp.isfinite(lp.u[:n])
        closer_upper = uf & (~lf | (jnp.abs(lp.u[:n]) < jnp.abs(lp.l[:n])))
        col_stat = jnp.where(
            lf & ~closer_upper, AT_LOWER, jnp.where(uf, AT_UPPER, FREE)
        )
        vstat = jnp.concatenate([col_stat, jnp.full(m, BASIC)]).astype(jnp.int32)
    inv_dtype = jnp.float32 if opts.inverse_dtype == "float32" else lp.G.dtype
    return SimplexState(
        basis=jnp.asarray(basis, jnp.int32),
        vstat=jnp.asarray(vstat, jnp.int32),
        binv=jnp.zeros((m, m), inv_dtype),
        xb=jnp.zeros(m, lp.G.dtype),
        dj=jnp.zeros(nt, lp.G.dtype),
        y=jnp.zeros(m, lp.G.dtype),
        weights=jnp.ones(m, lp.G.dtype),
        wcol=jnp.ones(nt, lp.G.dtype),
        iterations=jnp.asarray(0, jnp.int32),
        status=jnp.asarray(CONTINUE, jnp.int32),
        refactor_now=jnp.asarray(False),
        refactors=jnp.asarray(0, jnp.int32),
    )


def make_dual_feasible(lp: StandardLP, state: SimplexState, opts: SimplexOptions) -> SimplexState:
    """Flip nonbasic statuses so dj is sign-feasible (changeBounds :3148).

    Free nonbasics are folded to a fake bound on the side their dj prefers.
    Must be called after an initial `recompute`.
    """
    dj = state.dj
    at_nb = state.vstat != BASIC
    want_upper = at_nb & (dj < -opts.dual_tolerance)
    want_lower = at_nb & (dj > opts.dual_tolerance)
    vstat = jnp.where(
        want_upper,
        AT_UPPER,
        jnp.where(want_lower, AT_LOWER, state.vstat),
    ).astype(state.vstat.dtype)
    # any remaining FREE nonbasic with tiny dj: park at fake lower bound
    vstat = jnp.where(at_nb & (vstat == FREE), AT_LOWER, vstat).astype(state.vstat.dtype)
    return dataclasses.replace(state, vstat=vstat)
