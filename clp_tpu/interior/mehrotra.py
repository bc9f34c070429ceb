"""Mehrotra predictor-corrector interior-point method, dense, jittable.

Behavioral model: ClpPredictorCorrector::solve (ClpPredictorCorrector.cpp:75)
— per-iteration flow complementarityGap -> affine direction -> step length ->
corrector -> update (cpp:227+,:1016,:1564,:2366,:3070) — re-derived as a
fixed-shape JAX program:

  * the Newton solve uses dense normal equations M = G D G' + delta_d I with
    Cholesky on the MXU (the reference's ClpCholeskyDense path,
    ClpCholeskyDense.hpp:42-52, is the analogous default);
  * primal-dual regularization replaces the reference's dropped-row handling
    (ClpCholeskyBase::factorize rowsDropped) so shapes stay static;
  * all bound handling (lower/upper/free) is mask-based, no data-dependent
    shapes, so the whole solve jits once and vmaps over scenario batches.

Problem form: min c'x  s.t.  G x = b,  l <= x <= u  (StandardLP; fixed
variables must already be substituted out, see forms.to_ipm_form).

KKT system (z = duals of x-l >= 0, w = duals of u-x >= 0):
    G x = b;   G'y + z - w = c;   (x-l) o z = mu e;   (u-x) o w = mu e.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..forms import StandardLP
from ..ops.linalg import (
    block_tridiag_cholesky,
    block_tridiag_solve,
    chol_factor_reg,
    chol_solve,
)


@dataclasses.dataclass(frozen=True)
class IPMOptions:
    tol: float = 1e-8
    max_iter: int = 100
    step_factor: float = 0.9995  # Mehrotra step-to-boundary factor
    reg_primal: float = 1e-9  # relative primal regularization (on D^-1)
    reg_dual: float = 1e-10  # relative dual regularization (on M diagonal)
    free_var_cap: float = 1e10  # cap on D entries for free variables
    refine_steps: int = 1  # iterative refinement on each Newton solve
    # "cholesky" (dense, default), "cg", or "lsqr" — the latter two solve
    # the normal equations WITHOUT materializing G D G'. "cg" is Jacobi-
    # (or user-) preconditioned conjugate gradient; "lsqr" runs damped
    # Golub-Kahan bidiagonalization directly on D^{1/2}G', avoiding the
    # squared conditioning of the normal matrix. Together these are the
    # PDCO/ClpLsqr capability (reference: ClpPdco + ClpLsqr, ClpLsqr.cpp:8,
    # ClpPdcoBase.hpp:28-40) rebuilt on jitted JAX kernels.
    linear_solver: str = "cholesky"
    cg_maxiter: int = 200
    # user preconditioner hook for the cg path (ClpPdcoBase::matPrecon
    # parity): callable r -> M^{-1} r replacing the Jacobi default. Must be
    # jit-traceable.
    precond: object = None
    # separable convex objective hooks (ClpPdcoBase::getObj/getGrad/
    # getHessian parity): phi(x) = sum_j phi_j(x_j) ADDED to c'x. obj_fn
    # x->scalar, grad_fn x->vector, hess_fn x->diagonal vector (phi_j'').
    # All three must be jit-traceable; supply together. Convergence then
    # checks residuals + complementarity (the Fenchel dual gap is not
    # computed for general phi).
    obj_fn: object = None
    grad_fn: object = None
    hess_fn: object = None
    # banded normal equations (the sparse-Cholesky capability,
    # ClpCholeskyBase.cpp:638 AMD ordering + :1982 numeric): when > 0, the
    # LP's rows must already be permuted (host-side RCM) so that the
    # pattern of G G' has bandwidth < band_nb; the Newton solve then runs
    # block-tridiagonal assembly + Cholesky in O(m*nb*nt) / O(m*nb^2)
    # instead of O(m^2*nt) / O(m^3). solve.py detects and permutes.
    band_nb: int = 0
    # separable (diagonal-Hessian) QP: the caller certifies lp.Q is
    # diagonal, so H = Q + D^-1 stays diagonal and every LP Newton branch
    # (dense, banded, cg, lsqr) applies unchanged with dinv += diag(Q) —
    # no (nt, nt) Cholesky. Host-side detection in solve.py.
    q_diag: bool = False
    # general sparse normal equations (the unstructured complement of the
    # banded plan — ClpCholeskyBase.cpp:792 orderAMD + :1982 symbolic):
    # a host callable (d, rhs) -> dy backed by ops/sparse_chol.py's
    # supernodal multifrontal factorization with a cached symbolic plan,
    # reached through jax.pure_callback. Set by solve.py when the
    # minimum-degree fill estimate beats the dense O(m^3) by a wide
    # margin. Single-instance only (not vmappable).
    sparse_chol: object = None
    # DEVICE-side multifrontal sparse Cholesky (round-4): a hashable
    # ops/sparse_chol_device.DeviceNormalSolver whose factor/solve are
    # jit-traceable batched POTRF/TRSM/SYRK tile ops on the MXU — the
    # whole IPM stays ONE compiled program (no per-iteration
    # pure_callback round trips). The factor dtype may be float32; the
    # Newton solve wraps it in f64 matvec refinement. Takes precedence
    # over sparse_chol when both are set.
    sparse_chol_device: object = None
    # mixed-precision dense normal equations: assemble + factor in f32
    # (native MXU) with symmetric Jacobi scaling and f64 matvec
    # refinement. Set by solve.py on the TPU backend, where f64 matmuls
    # are VPU-emulated (~25x) and dominate both per-iteration wall time
    # and XLA compile time.
    mixed32: bool = False


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class IPMResult:
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray
    w: jnp.ndarray
    iterations: jnp.ndarray
    converged: jnp.ndarray
    primal_infeas: jnp.ndarray  # relative ||Gx-b||_inf
    dual_infeas: jnp.ndarray  # relative ||c-G'y-z+w||_inf
    rel_gap: jnp.ndarray
    pobj: jnp.ndarray
    dobj: jnp.ndarray
    # divergence diagnostics for infeasibility heuristics
    blowup: jnp.ndarray


def _starting_point(lp: StandardLP, hl, hu, opts: IPMOptions,
                    G_blk=None, pad_eye=None):
    """Least-squares start (LIPSOL-flavored), clamped into the bounds.

    With a banded plan (G_blk/pad_eye from ipm_solve), the G G' solve runs
    block-tridiagonal instead of dense."""
    G, b = lp.G, lp.b
    m, nt = G.shape
    if G_blk is not None:
        nb = G_blk.shape[1]
        mpad = G_blk.shape[0] * nb
        A0 = (
            jnp.einsum("kin,kjn->kij", G_blk, G_blk)
            + pad_eye
            + 1e-12 * jnp.eye(nb, dtype=G.dtype)
        )
        E0 = jnp.einsum("kin,kjn->kij", G_blk[1:], G_blk[:-1])
        Lb, Cb, _ = block_tridiag_cholesky(A0, E0)
        bp = jnp.zeros(mpad, b.dtype).at[:m].set(b)
        yls = block_tridiag_solve(Lb, Cb, bp.reshape(-1, nb)).reshape(-1)[:m]
        x_ls = G.T @ yls
    else:
        M0 = G @ G.T
        L0, _ = chol_factor_reg(M0, base_reg=1e-12)
        x_ls = G.T @ chol_solve(L0, b)

    both = hl & hu
    width = jnp.where(both, lp.u - lp.l, jnp.inf)
    margin = jnp.minimum(1.0 + 0.1 * jnp.abs(x_ls), 0.25 * width)
    lo = jnp.where(hl, lp.l + jnp.where(both, margin, 1.0 + 0.1 * jnp.abs(lp.l)), -jnp.inf)
    hi = jnp.where(hu, lp.u - jnp.where(both, margin, 1.0 + 0.1 * jnp.abs(lp.u)), jnp.inf)
    # make sure lo <= hi even for narrow ranges
    mid = 0.5 * (jnp.where(jnp.isfinite(lo), lo, 0.0) + jnp.where(jnp.isfinite(hi), hi, 0.0))
    lo_ok = lo <= hi
    x0 = jnp.clip(x_ls, jnp.where(lo_ok, lo, mid), jnp.where(lo_ok, hi, mid))

    cscale = 1.0 + jnp.sqrt(jnp.sum(lp.c * lp.c) / nt)
    z0 = jnp.where(hl, cscale, 0.0)
    w0 = jnp.where(hu, cscale, 0.0)
    y0 = jnp.zeros(m, lp.G.dtype)
    return x0, y0, z0, w0


def _lsqr_damped(G, sqd, sqreg, rhs, maxiter: int):
    """Damped LSQR (Paige-Saunders) for (G D G' + reg) dy = rhs.

    Operates on the stacked operator A v = [sqd * (G'v); sqreg * v] with
    b = [0; rhs/sqreg] — never materializing G D G'. Golub-Kahan
    bidiagonalization with early exit, as a lax.while_loop (ClpLsqr.cpp:8
    rebuilt for jit). All vectors stay in two blocks (nt and m) to avoid a
    concatenated temporary.
    """

    def A_fwd(v):  # m -> (nt, m)
        return sqd * (G.T @ v), sqreg * v

    def A_adj(u1, u2):  # (nt, m) -> m
        return G @ (sqd * u1) + sqreg * u2

    bnorm = jnp.linalg.norm(rhs) / jnp.maximum(sqreg, 1e-300)
    # beta1 u1 = b; b's first block is zero
    beta = bnorm
    u1 = jnp.zeros(G.shape[1], rhs.dtype)
    u2 = (rhs / jnp.maximum(sqreg, 1e-300)) / jnp.maximum(beta, 1e-300)
    v = A_adj(u1, u2)
    alpha = jnp.linalg.norm(v)
    v = v / jnp.maximum(alpha, 1e-300)
    w = v
    x = jnp.zeros(G.shape[0], rhs.dtype)
    phibar = beta
    rhobar = alpha

    def cond(c):
        x, u1, u2, v, w, alpha, beta, phibar, rhobar, it = c
        return (it < maxiter) & (jnp.abs(phibar) > 1e-12 * jnp.maximum(bnorm, 1e-300))

    def body(c):
        x, u1, u2, v, w, alpha, beta, phibar, rhobar, it = c
        a1, a2 = A_fwd(v)
        u1n = a1 - alpha * u1
        u2n = a2 - alpha * u2
        beta_n = jnp.sqrt(jnp.sum(u1n * u1n) + jnp.sum(u2n * u2n))
        u1n = u1n / jnp.maximum(beta_n, 1e-300)
        u2n = u2n / jnp.maximum(beta_n, 1e-300)
        vn = A_adj(u1n, u2n) - beta_n * v
        alpha_n = jnp.linalg.norm(vn)
        vn = vn / jnp.maximum(alpha_n, 1e-300)
        rho = jnp.sqrt(rhobar * rhobar + beta_n * beta_n)
        cth = rhobar / jnp.maximum(rho, 1e-300)
        sth = beta_n / jnp.maximum(rho, 1e-300)
        theta = sth * alpha_n
        rhobar_n = -cth * alpha_n
        phi = cth * phibar
        phibar_n = sth * phibar
        xn = x + (phi / jnp.maximum(rho, 1e-300)) * w
        wn = vn - (theta / jnp.maximum(rho, 1e-300)) * w
        return xn, u1n, u2n, vn, wn, alpha_n, beta_n, phibar_n, rhobar_n, it + 1

    out = jax.lax.while_loop(
        cond, body,
        (x, u1, u2, v, w, alpha, beta, phibar, rhobar, jnp.asarray(0, jnp.int32)),
    )
    return out[0]


def _max_step(v, dv, mask):
    """max alpha in [0, 1/eps] with v + alpha*dv >= 0 over masked entries."""
    bad = mask & (dv < 0)
    ratios = jnp.where(bad, -v / jnp.where(bad, dv, -1.0), jnp.inf)
    return jnp.minimum(jnp.min(ratios, initial=jnp.inf), 1e20)


def ipm_solve(lp: StandardLP, opts: IPMOptions = IPMOptions()) -> IPMResult:
    """Single-instance Mehrotra IPM; jit/vmap over instances externally."""
    G, b, c, l, u = lp.G, lp.b, lp.c, lp.l, lp.u
    Q = lp.Q  # None for pure LP; (nt, nt) PSD for QP
    # separable QP (caller-certified diagonal Q): the Hessian joins the
    # D^-1 diagonal and every LP Newton branch applies unchanged
    qdiag = jnp.diagonal(Q) if (Q is not None and opts.q_diag) else None
    separable = Q is None or qdiag is not None
    m, nt = G.shape
    dtype = G.dtype
    hl = jnp.isfinite(l)
    hu = jnp.isfinite(u)
    n_active = jnp.maximum(jnp.sum(hl) + jnp.sum(hu), 1).astype(dtype)
    bnorm = 1.0 + jnp.max(jnp.abs(b), initial=0.0)
    cnorm = 1.0 + jnp.max(jnp.abs(c), initial=0.0)

    if opts.band_nb > 0 and separable:
        # loop-invariant blocked view of G for the banded Newton solve
        nb_ = opts.band_nb
        _k = -(-m // nb_)
        _mpad = _k * nb_
        Gp = jnp.zeros((_mpad, nt), dtype)
        Gp = Gp.at[:m, :].set(G)
        _G_blk = Gp.reshape(_k, nb_, nt)
        padm = (jnp.arange(_mpad) >= m).astype(dtype).reshape(_k, nb_)
        _pad_eye = jax.vmap(jnp.diag)(padm)
    else:
        _G_blk = _pad_eye = None
        _mpad = 0

    x0, y0, z0, w0 = _starting_point(lp, hl, hu, opts, _G_blk, _pad_eye)

    nonlinear = opts.grad_fn is not None  # PDCO separable-objective mode

    def grad(x):
        if Q is None:
            g0 = c
        elif qdiag is not None:
            g0 = c + qdiag * x
        else:
            g0 = c + Q @ x
        return g0 + opts.grad_fn(x) if nonlinear else g0

    def residuals(x, y, z, w):
        rb = b - G @ x
        rc = grad(x) - G.T @ y - z + w
        return rb, rc

    def mu_of(g, t, z, w):
        return (
            jnp.sum(jnp.where(hl, g * z, 0.0)) + jnp.sum(jnp.where(hu, t * w, 0.0))
        ) / n_active

    def metrics(x, y, z, w):
        rb, rc = residuals(x, y, z, w)
        pinf = jnp.max(jnp.abs(rb), initial=0.0) / bnorm
        dinf = jnp.max(jnp.abs(rc), initial=0.0) / cnorm
        if Q is None:
            quad = 0.0
        elif qdiag is not None:
            quad = 0.5 * jnp.sum(qdiag * x * x)
        else:
            quad = 0.5 * (x @ (Q @ x))
        pobj = c @ x + quad
        if nonlinear and opts.obj_fn is not None:
            pobj = pobj + opts.obj_fn(x)
        dobj = (
            b @ y
            + jnp.sum(jnp.where(hl, l * z, 0.0))
            - jnp.sum(jnp.where(hu, u * w, 0.0))
            - quad
        )
        relgap = jnp.abs(pobj - dobj) / (1.0 + jnp.abs(pobj))
        return pinf, dinf, relgap, pobj, dobj

    def converged(x, y, z, w):
        pinf, dinf, relgap, pobj, _ = metrics(x, y, z, w)
        if nonlinear:
            # the Fenchel dual value is not computed for general phi:
            # residuals + complementarity replace the gap (PDCO criterion)
            gg = jnp.where(hl, x - l, 1.0)
            tt = jnp.where(hu, u - x, 1.0)
            comp = (
                jnp.sum(jnp.where(hl, jnp.abs(gg * z), 0.0))
                + jnp.sum(jnp.where(hu, jnp.abs(tt * w), 0.0))
            ) / n_active
            gap_ok = comp <= opts.tol * (1.0 + jnp.abs(pobj))
        else:
            gap_ok = relgap <= opts.tol
        return (pinf <= opts.tol) & (dinf <= opts.tol) & gap_ok

    def cond(state):
        x, y, z, w, g, t, it, done = state
        return (~done) & (it < opts.max_iter)

    def body(state):
        # g and t are carried (updated by alpha*dx), NOT recomputed as x-l:
        # recomputation rounds to exactly zero once x converges onto a bound,
        # which poisons the z/g divisions — carrying slacks keeps them
        # strictly positive (standard primal-dual implementation practice)
        x, y, z, w, g, t, it, _ = state
        rb, rc = residuals(x, y, z, w)
        mu = mu_of(g, t, z, w)

        zg = jnp.where(hl, z / g, 0.0)
        wt = jnp.where(hu, w / t, 0.0)
        # regularization decays with mu: a static shift biases the optimum
        # by O(reg) and floors the attainable duality gap just above tol
        reg_p = jnp.minimum(opts.reg_primal, 1e-2 * mu + 1e-14)
        dinv = zg + wt + reg_p * (1.0 + jnp.abs(c))
        if nonlinear and opts.hess_fn is not None:
            # separable phi'' joins the diagonal of the Newton system
            # (getHessian parity): H = diag(phi'') + D^-1
            dinv = dinv + jnp.maximum(opts.hess_fn(x), 0.0)
        if qdiag is not None:
            # separable QP: H = Q + D^-1 stays diagonal
            dinv = dinv + jnp.maximum(qdiag, 0.0)

        if separable and opts.linear_solver == "cg":
            # matrix-free normal equations: Mv = G(d*(G'v)) + reg*v
            d = jnp.minimum(1.0 / dinv, opts.free_var_cap)
            reg = opts.reg_dual + 1e-12
            diag_m = (G * G) @ d + reg
            # matPrecon parity: user hook replaces the Jacobi default
            M_apply = opts.precond or (lambda r: r / diag_m)

            def matvec(v):
                return G @ (d * (G.T @ v)) + reg * v

            def nsolve(rhs):
                sol, _ = jax.scipy.sparse.linalg.cg(
                    matvec,
                    rhs,
                    M=M_apply,
                    tol=1e-12,
                    maxiter=opts.cg_maxiter,
                )
                return sol

            def hsolve(r):
                return d * r if r.ndim == 1 else d[:, None] * r

        elif separable and opts.band_nb > 0:
            # block-tridiagonal normal equations on the (host-permuted)
            # banded pattern: O(m*nb*nt) assembly via batched einsum +
            # O(m*nb^2) factorization, refined matrix-free in f64
            d = jnp.minimum(1.0 / dinv, opts.free_var_cap)
            reg = opts.reg_dual + 1e-12
            Gd_blk = _G_blk * d  # (k, nb, nt)
            A_blk = (
                jnp.einsum("kin,kjn->kij", Gd_blk, _G_blk)
                + _pad_eye  # identity on padded rows keeps blocks SPD
                + reg * jnp.eye(opts.band_nb, dtype=G.dtype)
            )
            E_blk = jnp.einsum("kin,kjn->kij", Gd_blk[1:], _G_blk[:-1])
            Lb, Cb, _ = block_tridiag_cholesky(A_blk, E_blk, base_reg=0.0)

            def matvec(v):
                return G @ (d * (G.T @ v)) + reg * v

            def nsolve(rhs):
                rp = jnp.zeros(_mpad, rhs.dtype).at[: rhs.size].set(rhs)
                x = block_tridiag_solve(
                    Lb, Cb, rp.reshape(-1, opts.band_nb)
                ).reshape(-1)[: rhs.size]
                for _ in range(opts.refine_steps + 1):
                    rp2 = jnp.zeros(_mpad, rhs.dtype).at[: rhs.size].set(
                        rhs - matvec(x)
                    )
                    x = x + block_tridiag_solve(
                        Lb, Cb, rp2.reshape(-1, opts.band_nb)
                    ).reshape(-1)[: rhs.size]
                return x

            def hsolve(r):
                return d * r if r.ndim == 1 else d[:, None] * r

        elif separable and opts.sparse_chol_device is not None:
            # general sparse G D G': DEVICE multifrontal Cholesky — the
            # same symbolic plan as the host path, but the numeric runs
            # as batched POTRF/TRSM/SYRK tiles on the MXU inside this
            # jitted program (ClpCholeskyBase.cpp:2767 factorize role).
            # Factor once per IPM iteration; f32 factors are wrapped in
            # f64 matvec refinement (mixed-precision contract).
            d = jnp.minimum(1.0 / dinv, opts.free_var_cap)
            reg = opts.reg_dual + 1e-12
            dev = opts.sparse_chol_device
            f32 = dev.dev.dtype == jnp.float32
            f_try, f_ok = dev.factor(d)
            # breakdown fallback: one diagonal-shifted refactor (the
            # host path's escalating-shift loop, single static step)
            fstate = jax.lax.cond(
                f_ok,
                lambda: f_try,
                lambda: dev.factor_shifted(d, 1e-6)[0],
            )

            def matvec(v):
                return G @ (d * (G.T @ v)) + reg * v

            def nsolve(rhs):
                x = dev.solve_with(fstate, rhs)
                n_ref = opts.refine_steps + (3 if f32 else 0)
                for _ in range(n_ref):
                    x = x + dev.solve_with(fstate, rhs - matvec(x))
                return x

            def hsolve(r):
                return d * r if r.ndim == 1 else d[:, None] * r

        elif separable and opts.sparse_chol is not None:
            # general sparse G D G': host supernodal multifrontal Cholesky
            # with a fixed symbolic plan (minimum degree + etree postorder
            # + relaxed supernodes), re-factored each iteration with the
            # new D through a pure_callback; device-side matvec refinement
            # restores any accuracy the host f64 factor left behind
            d = jnp.minimum(1.0 / dinv, opts.free_var_cap)
            reg = opts.reg_dual + 1e-12

            def matvec(v):
                return G @ (d * (G.T @ v)) + reg * v

            def _host(rhs):
                return jax.pure_callback(
                    opts.sparse_chol,
                    jax.ShapeDtypeStruct(rhs.shape, rhs.dtype),
                    d, rhs)

            def nsolve(rhs):
                dy = _host(rhs)
                for _ in range(opts.refine_steps):
                    dy = dy + _host(rhs - matvec(dy))
                return dy

            def hsolve(r):
                return d * r if r.ndim == 1 else d[:, None] * r

        elif separable and opts.linear_solver == "lsqr":
            # damped LSQR on A = [D^{1/2} G' ; sqrt(reg) I], b = [0;
            # rhs/sqrt(reg)]: the normal equations of this least-squares
            # problem are exactly (G D G' + reg) dy = rhs, but the Krylov
            # process sees A (condition sqrt(kappa(M))) — ClpLsqr's reason
            # for existing (ClpLsqr.cpp:8)
            d = jnp.minimum(1.0 / dinv, opts.free_var_cap)
            reg = opts.reg_dual + 1e-10
            sqd = jnp.sqrt(d)
            sqreg = jnp.sqrt(reg)

            def nsolve(rhs):
                return _lsqr_damped(G, sqd, sqreg, rhs, opts.cg_maxiter)

            def hsolve(r):
                return d * r if r.ndim == 1 else d[:, None] * r

        elif separable and opts.mixed32:
            # mixed-precision dense normal equations (TPU): assembly and
            # Cholesky run in f32 on the MXU (f64 matmuls are VPU-emulated
            # ~25x slower AND their expanded programs dominate the
            # server-side compile time — the round-3 "18-min barrier
            # compile" weakness). Symmetric Jacobi scaling tames the
            # IPM's late-iteration diagonal spread so the f32 factor +
            # f64 matvec refinement recovers f64-class Newton directions
            # (same contract as the f32 simplex inverse and the device
            # multifrontal path).
            d = jnp.minimum(1.0 / dinv, opts.free_var_cap)
            reg = opts.reg_dual + 1e-12
            G32 = G.astype(jnp.float32)
            d32 = d.astype(jnp.float32)
            M32 = jnp.matmul(G32 * d32, G32.T,
                             precision=jax.lax.Precision.HIGHEST)
            diag = jnp.diagonal(M32) + jnp.float32(reg)
            s32 = jax.lax.rsqrt(jnp.maximum(diag, 1e-30))
            Ms = M32 * s32[:, None] * s32[None, :]
            Ms = Ms + (jnp.float32(reg) * s32 * s32 + 1e-7) * jnp.eye(
                Ms.shape[0], dtype=jnp.float32)
            L32, _ = chol_factor_reg(Ms, base_reg=0.0)
            s64 = s32.astype(G.dtype)

            def matvec(v):
                return G @ (d * (G.T @ v)) + reg * v

            def nsolve(rhs):
                x = s64 * chol_solve(
                    L32, (s64 * rhs).astype(jnp.float32)).astype(rhs.dtype)
                for _ in range(opts.refine_steps + 3):
                    r = rhs - matvec(x)
                    x = x + s64 * chol_solve(
                        L32, (s64 * r).astype(jnp.float32)).astype(rhs.dtype)
                return x

            def hsolve(r):
                return d * r if r.ndim == 1 else d[:, None] * r

        elif separable:
            d = jnp.minimum(1.0 / dinv, opts.free_var_cap)
            Gd = G * d  # (m, nt) row-scaled by columns
            M = Gd @ G.T
            L, _ = chol_factor_reg(M, base_reg=opts.reg_dual)

            def nsolve(rhs):
                dy = chol_solve(L, rhs)
                for _ in range(opts.refine_steps):
                    dy = dy + chol_solve(L, rhs - M @ dy)
                return dy

            def hsolve(r):  # (Q + D^-1)^{-1} r for the LP case: just d * r
                return d * r if r.ndim == 1 else d[:, None] * r
        else:
            # QP: H = Q + D^-1 is SPD (Q PSD, D^-1 > 0); reduce through it
            # (the reference requires KKT mode for QP barriers,
            # ClpPredictorCorrector.cpp:114-124 — this is the same algebra
            # folded into two SPD solves)
            H = Q + jnp.diag(jnp.maximum(dinv, 1.0 / opts.free_var_cap))
            Lh, _ = chol_factor_reg(H, base_reg=opts.reg_dual)

            def hsolve(r):
                return chol_solve(Lh, r)

            W = hsolve(G.T)  # (nt, m)
            M = G @ W
            L, _ = chol_factor_reg(M, base_reg=opts.reg_dual)

            def nsolve(rhs):
                dy = chol_solve(L, rhs)
                for _ in range(opts.refine_steps):
                    dy = dy + chol_solve(L, rhs - M @ dy)
                return dy

        def newton(rgz, rtw):
            h = rc - jnp.where(hl, rgz / g, 0.0) + jnp.where(hu, rtw / t, 0.0)
            rhs = rb + G @ hsolve(h)
            dy = nsolve(rhs)
            dx = hsolve(G.T @ dy - h)
            dz = jnp.where(hl, (rgz - z * dx) / g, 0.0)
            dw = jnp.where(hu, (rtw + w * dx) / t, 0.0)
            return dx, dy, dz, dw

        # --- predictor (affine scaling) ---
        rgz_aff = -g * z
        rtw_aff = -t * w
        dxa, dya, dza, dwa = newton(rgz_aff, rtw_aff)
        ap_aff = jnp.minimum(
            jnp.minimum(_max_step(g, dxa, hl), _max_step(t, -dxa, hu)), 1.0
        )
        ad_aff = jnp.minimum(
            jnp.minimum(_max_step(z, dza, hl), _max_step(w, dwa, hu)), 1.0
        )
        mu_aff = (
            jnp.sum(jnp.where(hl, (g + ap_aff * dxa) * (z + ad_aff * dza), 0.0))
            + jnp.sum(jnp.where(hu, (t - ap_aff * dxa) * (w + ad_aff * dwa), 0.0))
        ) / n_active
        sigma = jnp.clip((mu_aff / jnp.maximum(mu, 1e-300)) ** 3, 1e-8, 1.0)

        # --- corrector ---
        rgz = sigma * mu - g * z - dxa * dza
        rtw = sigma * mu - t * w + dxa * dwa
        dx, dy, dz, dw = newton(rgz, rtw)

        ap_max = jnp.minimum(_max_step(g, dx, hl), _max_step(t, -dx, hu))
        ad_max = jnp.minimum(_max_step(z, dz, hl), _max_step(w, dw, hu))
        eta = jnp.maximum(opts.step_factor, 1.0 - 0.1 * mu)
        ap = jnp.minimum(1.0, eta * ap_max)
        ad = jnp.minimum(1.0, eta * ad_max)

        x1 = x + ap * dx
        # x and the carried slacks drift apart in float; x escaping its
        # bounds makes pobj undercut dobj and the duality gap unattainable.
        # Projecting back is absorbed by the infeasible-start Newton (rb).
        x1 = jnp.clip(x1, l, u)
        y1 = y + ad * dy
        z1 = jnp.where(hl, z + ad * dz, 0.0)
        w1 = jnp.where(hu, w + ad * dw, 0.0)
        g1 = jnp.where(hl, g + ap * dx, 1.0)
        t1 = jnp.where(hu, t - ap * dx, 1.0)
        # a step of at most eta*alpha_max guarantees g1 >= (1-eta)*g
        # mathematically; enforce it against floating-point cancellation
        slack_keep = 0.1 * (1.0 - opts.step_factor)
        g1 = jnp.where(hl, jnp.maximum(g1, slack_keep * g), 1.0)
        t1 = jnp.where(hu, jnp.maximum(t1, slack_keep * t), 1.0)

        # centrality safeguard (Gondzio-style): keep every complementarity
        # product within a band around mu so no multiplier collapses to zero
        # prematurely (the dual-residual perturbation this introduces is
        # absorbed by the infeasible-start Newton steps)
        mu1 = mu_of(g1, t1, z1, w1)
        lo_band = 1e-5
        z1 = jnp.where(hl & (g1 * z1 < lo_band * mu1), lo_band * mu1 / g1, z1)
        w1 = jnp.where(hu & (t1 * w1 < lo_band * mu1), lo_band * mu1 / t1, w1)

        # reject steps that produced non-finite values (keep previous iterate,
        # convergence check will stop us; mirrors the reference's disaster
        # handling, ClpSimplex.hpp:993)
        finite = (
            jnp.all(jnp.isfinite(x1))
            & jnp.all(jnp.isfinite(y1))
            & jnp.all(jnp.isfinite(z1))
            & jnp.all(jnp.isfinite(w1))
        )
        x1 = jnp.where(finite, x1, x)
        y1 = jnp.where(finite, y1, y)
        z1 = jnp.where(finite, z1, z)
        w1 = jnp.where(finite, w1, w)
        g1 = jnp.where(finite, g1, g)
        t1 = jnp.where(finite, t1, t)

        done = converged(x1, y1, z1, w1) | (~finite)
        return x1, y1, z1, w1, g1, t1, it + 1, done

    g0 = jnp.where(hl, x0 - l, 1.0)
    t0 = jnp.where(hu, u - x0, 1.0)
    init = (x0, y0, z0, w0, g0, t0, jnp.asarray(0), converged(x0, y0, z0, w0))
    x, y, z, w, g, t, it, done = jax.lax.while_loop(cond, body, init)

    pinf, dinf, relgap, pobj, dobj = metrics(x, y, z, w)
    conv = converged(x, y, z, w)
    blowup = jnp.maximum(jnp.max(jnp.abs(z), initial=0.0), jnp.max(jnp.abs(w), initial=0.0))
    return IPMResult(
        x=x,
        y=y,
        z=z,
        w=w,
        iterations=it,
        converged=conv,
        primal_infeas=pinf,
        dual_infeas=dinf,
        rel_gap=relgap,
        pobj=pobj,
        dobj=dobj,
        blowup=blowup,
    )


@partial(jax.jit, static_argnames=("opts",))
def ipm_solve_jit(lp: StandardLP, opts: IPMOptions = IPMOptions()) -> IPMResult:
    return ipm_solve(lp, opts)
