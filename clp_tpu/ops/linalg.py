"""Dense factorization helpers with regularization and refinement.

These wrap XLA's MXU-lowered dense kernels (cholesky, triangular_solve, lu)
with the numerical policies an LP solver needs:

  - `chol_factor_reg`: Cholesky with automatic diagonal-regularization
    escalation (replaces the reference's dropped-row handling in
    ClpCholeskyBase::factorize, ClpCholeskyBase.cpp:2767 — on a TPU we keep
    shapes fixed and regularize instead of dropping rows).
  - `solve_refined`: triangular solve + iterative refinement steps
    (reference uses the same pattern, ClpPredictorCorrector.cpp:1564).
  - `lu_refactor`: dense LU returning an explicit inverse for the simplex
    basis (replaces CoinFactorization / CoinAbc LU; SURVEY.md §7 stance:
    blocked-dense + rank-1 product-form updates between refactorizations).

All functions are jit/vmap-safe (fixed shapes, no Python control flow on
traced values).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def chol_factor_reg(M: jnp.ndarray, base_reg: float = 0.0, max_bumps: int = 6):
    """Cholesky of M + delta*I, escalating delta x100 until finite.

    `base_reg` is an ABSOLUTE first-attempt shift — IPM normal-equation
    diagonals grow without bound near convergence, so scaling the default
    shift by the diagonal would swamp the well-conditioned block and corrupt
    the Newton direction. Only the escalation fallback (after a failed
    factorization) is diagonal-scaled.

    Returns (L, delta_used). Staying inside jit means a batched solve can
    have some instances regularized without host round-trips.
    """
    scale = jnp.maximum(jnp.max(jnp.abs(jnp.diagonal(M, axis1=-2, axis2=-1))), 1.0)
    eye = jnp.eye(M.shape[-1], dtype=M.dtype)

    def attempt(delta):
        L = jnp.linalg.cholesky(M + delta * eye)
        ok = jnp.all(jnp.isfinite(L))
        return L, ok

    def cond(carry):
        _, ok, bumps, _ = carry
        return jnp.logical_and(~ok, bumps < max_bumps)

    def body(carry):
        _, _, bumps, delta = carry
        delta = jnp.maximum(1e-14 * scale, delta * 100.0)
        L, ok = attempt(delta)
        return L, ok, bumps + 1, delta

    delta0 = jnp.asarray(base_reg, M.dtype)
    L0, ok0 = attempt(delta0)
    L, ok, _, delta = jax.lax.while_loop(cond, body, (L0, ok0, 0, delta0))
    return L, delta


def chol_blocked(A: jnp.ndarray, nb: int = 256) -> jnp.ndarray:
    """Right-looking blocked Cholesky: POTRF on nb-diagonal blocks, panel
    columns via an explicit small triangular inverse (matmul instead of a
    wide TRSM — XLA's TriangularSolve underfills the MXU), trailing
    update as one SYRK matmul per block step.

    Exists because jnp.linalg.cholesky measures ~3% of the f32 matmul
    ceiling at m=2048 on the v5e (BENCH r5 mxu_efficiency) while the
    SYRK updates, which carry ~all of the m^3/3 FLOPs for nb << m, run
    near the ceiling. Static block loop (unrolled at trace); supports
    leading batch dims. Returns NaN entries exactly where
    jnp.linalg.cholesky would (non-SPD input), so the escalation logic
    in chol_factor_reg applies unchanged.
    """
    m = A.shape[-1]
    if m <= nb:
        return jnp.linalg.cholesky(A)
    L = jnp.zeros_like(A)
    for k in range(0, m, nb):
        e = min(k + nb, m)
        A11 = A[..., k:e, k:e]
        L11 = jnp.linalg.cholesky(A11)
        L = L.at[..., k:e, k:e].set(L11)
        if e < m:
            eye = jnp.eye(e - k, dtype=A.dtype)
            Li = jax.scipy.linalg.solve_triangular(L11, eye, lower=True)
            L21 = jnp.matmul(
                A[..., e:, k:e], jnp.swapaxes(Li, -1, -2),
                precision=jax.lax.Precision.HIGHEST,
            )
            L = L.at[..., e:, k:e].set(L21)
            A = A.at[..., e:, e:].add(
                -jnp.matmul(L21, jnp.swapaxes(L21, -1, -2),
                            precision=jax.lax.Precision.HIGHEST)
            )
    return L


def chol_solve(L: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Solve (L L') x = rhs given lower-triangular L. rhs: (..., m) or (..., m, k)."""
    vec = rhs.ndim == L.ndim - 1
    r = rhs[..., None] if vec else rhs
    z = jax.scipy.linalg.solve_triangular(L, r, lower=True)
    x = jax.scipy.linalg.solve_triangular(L, z, lower=True, trans=1)
    return x[..., 0] if vec else x


def solve_refined(
    M: jnp.ndarray, L: jnp.ndarray, rhs: jnp.ndarray, iters: int = 1
) -> jnp.ndarray:
    """chol_solve plus `iters` steps of iterative refinement against M."""
    x = chol_solve(L, rhs)
    for _ in range(iters):
        r = rhs - (M @ x[..., None])[..., 0] if rhs.ndim == M.ndim - 1 else rhs - M @ x
        x = x + chol_solve(L, r)
    return x


def gauss_jordan_inverse(B: jnp.ndarray) -> jnp.ndarray:
    """Explicit inverse via Gauss-Jordan with partial pivoting, pure jnp.

    Exists because the TPU XLA client implements LuDecomposition only for
    f32 and the solver needs f64 basis inverses. Row operations are rank-1
    outer-product updates (VPU/MXU friendly); the column loop is a
    `lax.fori_loop`. Used as the refactorization path on non-CPU backends.
    """
    m = B.shape[-1]
    dtype = B.dtype
    aug = jnp.concatenate([B, jnp.eye(m, dtype=dtype)], axis=-1)
    idx = jnp.arange(m)

    def step(k, aug):
        col = aug[:, k]
        mask = idx >= k
        p = jnp.argmax(jnp.where(mask, jnp.abs(col), -jnp.inf))
        # swap rows k and p
        rowk, rowp = aug[k], aug[p]
        aug = aug.at[k].set(rowp).at[p].set(rowk)
        piv = aug[k, k]
        newk = aug[k] / piv
        factors = aug[:, k].at[k].set(0.0)
        aug = aug - jnp.outer(factors, newk)
        aug = aug.at[k].set(newk)
        return aug

    aug = jax.lax.fori_loop(0, m, step, aug)
    return aug[:, m:]


def blocked_lu(A: jnp.ndarray, block: int = 128):
    """Right-looking blocked LU with partial pivoting, pure jnp.

    LAPACK getrf structure mapped to TPU constraints (static shapes, no f64
    LuDecomposition kernel on the device): the inner panel loop does b
    sequential steps of O(m*b) work each (vs the old Gauss-Jordan's m steps
    of O(m^2)), and everything outside the panel is b-wide TRSM + one
    (m,b)x(b,m) MXU matmul per panel — the CoinAbc family's blocked design
    (CoinAbcBaseFactorization.hpp:418-554) re-expressed as dense tiles.

    Returns (LU, perm) where LU packs unit-lower L below the diagonal and U
    on/above it, and perm is the row permutation such that A[perm] = L @ U.
    """
    m = A.shape[-1]
    b = min(block, m)
    nb = -(-m // b)  # ceil
    mpad = nb * b
    if mpad != m:
        # pad with identity so every panel has static width b
        Ap = jnp.zeros((mpad, mpad), A.dtype)
        Ap = Ap.at[:m, :m].set(A)
        Ap = Ap.at[jnp.arange(m, mpad), jnp.arange(m, mpad)].set(1.0)
        A = Ap
    M = A.shape[-1]
    rows = jnp.arange(M)
    perm = rows

    def panel_step(j, carry):
        A, perm, pb = carry
        r = pb + j
        col = A[:, pb + j]
        # partial pivot among rows >= r
        cand = jnp.where(rows >= r, jnp.abs(col), -jnp.inf)
        p = jnp.argmax(cand)
        # swap rows r and p (full width) + perm entries
        rowr = jax.lax.dynamic_slice(A, (r, 0), (1, M))
        rowp = jax.lax.dynamic_slice(A, (p, 0), (1, M))
        A = jax.lax.dynamic_update_slice(A, rowr, (p, 0))
        A = jax.lax.dynamic_update_slice(A, rowp, (r, 0))
        pr, pp = perm[r], perm[p]
        perm = perm.at[r].set(pp).at[p].set(pr)
        piv = A[r, pb + j]
        # multipliers below the diagonal, stored in place
        colv = A[:, pb + j]
        l = jnp.where(rows > r, colv / piv, colv)
        A = A.at[:, pb + j].set(l)
        # eliminate within the remaining panel columns only
        panel = jax.lax.dynamic_slice(A, (0, pb), (M, b))
        prow = jax.lax.dynamic_slice(A, (r, pb), (1, b))
        cmask = (jnp.arange(b) > j).astype(A.dtype)
        lmask = jnp.where(rows > r, l, 0.0)
        panel = panel - jnp.outer(lmask, prow[0] * cmask)
        A = jax.lax.dynamic_update_slice(A, panel, (0, pb))
        return A, perm, pb

    def block_step(k, carry):
        A, perm = carry
        pb = k * b
        A, perm, _ = jax.lax.fori_loop(0, b, panel_step, (A, perm, pb))
        # TRSM: U12 = L11^{-1} @ A[pb:pb+b, pb+b:]  (unit-lower L11)
        L11 = jax.lax.dynamic_slice(A, (pb, pb), (b, b))
        L11 = jnp.tril(L11, -1) + jnp.eye(b, dtype=A.dtype)
        rowblk = jax.lax.dynamic_slice(A, (pb, 0), (b, M))
        right = (jnp.arange(M) >= pb + b).astype(A.dtype)
        solved = jax.scipy.linalg.solve_triangular(
            L11, rowblk * right, lower=True, unit_diagonal=True
        )
        rowblk = rowblk * (1.0 - right) + solved * right
        A = jax.lax.dynamic_update_slice(A, rowblk, (pb, 0))
        # trailing update: A22 -= L21 @ U12 (masked full-shape MXU matmul)
        colblk = jax.lax.dynamic_slice(A, (0, pb), (M, b))
        below = (rows >= pb + b).astype(A.dtype)
        L21 = colblk * below[:, None]
        U12 = rowblk * right
        A = A - (L21 @ U12) * below[:, None] * right[None, :]
        return A, perm

    A, perm = jax.lax.fori_loop(0, nb, block_step, (A, perm))
    return A[:m, :m], perm[:m] if mpad == m else perm[:m]


def blocked_inverse(B: jnp.ndarray, block: int = 128) -> jnp.ndarray:
    """Explicit inverse via blocked LU + two triangular solves.

    B^{-1} = U^{-1} L^{-1} P: both solves are XLA TriangularSolve (blocked
    internally, f64-capable on TPU), so only the b-wide panel loop is
    sequential.
    """
    m = B.shape[-1]
    LU, perm = blocked_lu(B, block)
    L = jnp.tril(LU, -1) + jnp.eye(m, dtype=B.dtype)
    U = jnp.triu(LU)
    Pm = jnp.zeros((m, m), B.dtype).at[jnp.arange(m), perm].set(1.0)
    Y = jax.scipy.linalg.solve_triangular(L, Pm, lower=True, unit_diagonal=True)
    return jax.scipy.linalg.solve_triangular(U, Y, lower=False)


def lu_refactor32(B: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """f32 explicit inverse via the backend's NATIVE LuDecomposition.

    XLA implements LuDecomposition on TPU for f32 only — but natively
    (blocked, compiled), unlike the Python-level blocked panel loop that
    the f64 path needs. Used by the mixed-precision simplex: the f32
    inverse drives the pivot loop and preconditions f64
    iterative-refinement solves at refactorization time (~2.6x faster than
    the f64 blocked inverse at m=1024 on the bench TPU).
    """
    m = B.shape[-1]
    # power-of-2 row/col equilibration (exact in fp): shrinks the condition
    # number the f32 factor sees; binv = Dc X Dr undoes it exactly
    absB = jnp.abs(B)
    r_max = jnp.max(absB, axis=1, keepdims=True)
    dr = jnp.exp2(-jnp.round(jnp.log2(jnp.where(r_max > 0, r_max, 1.0))))
    absB = absB * dr
    c_max = jnp.max(absB, axis=0, keepdims=True)
    dc = jnp.exp2(-jnp.round(jnp.log2(jnp.where(c_max > 0, c_max, 1.0))))
    B32 = (B * dr * dc).astype(jnp.float32)
    lu, _, perm = jax.lax.linalg.lu(B32)
    L = jnp.tril(lu, -1) + jnp.eye(m, dtype=jnp.float32)
    U = jnp.triu(lu)
    Pm = jnp.zeros((m, m), jnp.float32).at[jnp.arange(m), perm].set(1.0)
    Y = jax.scipy.linalg.solve_triangular(L, Pm, lower=True, unit_diagonal=True)
    X = jax.scipy.linalg.solve_triangular(U, Y, lower=False)
    X = X * dc.reshape(-1, 1).astype(jnp.float32) * dr.reshape(1, -1).astype(jnp.float32)
    ok = jnp.all(jnp.isfinite(X))
    return X, ok


def lu_refactor(B: jnp.ndarray, block: int = 128) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Dense factorization of a basis matrix, returning (Binv, ok_flag).

    The simplex engine maintains an explicit inverse updated by rank-1
    product-form transforms each pivot; this is the periodic from-scratch
    refactorization (reference cadence: ClpFactorization::timeToRefactorize,
    ClpFactorization.cpp:1524). On CPU, XLA's f64 LU is used; on TPU
    backends (no f64 LuDecomposition kernel) the blocked-panel LU runs.
    """
    if jax.devices()[0].platform == "cpu":
        lu, piv = jax.scipy.linalg.lu_factor(B)
        n = B.shape[-1]
        eye = jnp.eye(n, dtype=B.dtype)
        Binv = jax.scipy.linalg.lu_solve((lu, piv), eye)
    else:
        Binv = blocked_inverse(B, block)
    ok = jnp.all(jnp.isfinite(Binv))
    return Binv, ok


# --------------------------------------------------------------------------
# Block-tridiagonal (banded) Cholesky — the TPU answer to sparse Cholesky
# --------------------------------------------------------------------------


def block_tridiag_cholesky(A, E, base_reg: float = 0.0, max_bumps: int = 6):
    """Cholesky of a block-tridiagonal SPD matrix, k sequential MXU steps.

    A: (k, nb, nb) diagonal blocks; E: (k-1, nb, nb) sub-diagonal blocks
    (E[i] = M[block i+1, block i]). Returns (L, C, delta): L (k, nb, nb)
    lower-triangular diagonal factors, C (k-1, nb, nb) sub-diagonal factors
    with M = LL' in block form, and the diagonal shift used.

    This is the numeric phase of the reference's sparse Cholesky
    (ClpCholeskyBase.cpp:638 AMD ordering + :1982 numeric) re-expressed for
    the MXU: a host-side RCM ordering makes the normal matrix banded, and
    the band factors as k = m/nb dense block steps under lax.scan —
    O(m*nb^2) work instead of O(m^3), with every step a dense kernel.
    Regularization escalates like chol_factor_reg (row-dropping replaced by
    diagonal shifts, fixed shapes).
    """
    k, nb, _ = A.shape
    eye = jnp.eye(nb, dtype=A.dtype)
    scale = jnp.maximum(
        jnp.max(jnp.abs(jnp.diagonal(A, axis1=-2, axis2=-1))), 1.0
    )
    Epad = jnp.concatenate([jnp.zeros((1, nb, nb), A.dtype), E], axis=0)

    def attempt(delta):
        def step(carry, inp):
            prevL = carry  # L_{i-1}
            A_i, E_i = inp  # E_i = M[i, i-1] (zero block for i = 0)
            # C_i = E_i L_{i-1}^{-T}
            C_i = jax.scipy.linalg.solve_triangular(
                prevL, E_i.T, lower=True
            ).T
            S_i = A_i + delta * eye - C_i @ C_i.T
            L_i = jnp.linalg.cholesky(S_i)
            L_safe = jnp.where(jnp.isfinite(L_i), L_i, eye)
            return L_safe, (L_i, C_i)

        _, (L, C) = jax.lax.scan(step, eye, (A, Epad))
        ok = jnp.all(jnp.isfinite(L))
        return L, C[1:], ok

    def cond(carry):
        _, _, ok, bumps, _ = carry
        return jnp.logical_and(~ok, bumps < max_bumps)

    def body(carry):
        _, _, _, bumps, delta = carry
        delta = jnp.maximum(1e-14 * scale, delta * 100.0)
        L, C, ok = attempt(delta)
        return L, C, ok, bumps + 1, delta

    delta0 = jnp.asarray(base_reg, A.dtype)
    L0, C0, ok0 = attempt(delta0)
    L, C, ok, _, delta = jax.lax.while_loop(
        cond, body, (L0, C0, ok0, 0, delta0)
    )
    return L, C, delta


def block_tridiag_solve(L, C, rhs):
    """Solve (LL') x = rhs for the block-tridiagonal factors above.

    rhs: (k, nb) blocked right-hand side. Forward then backward block
    substitution, each a lax.scan of dense triangular solves.
    """
    k, nb, _ = L.shape
    Cpad = jnp.concatenate([jnp.zeros((1, nb, nb), L.dtype), C], axis=0)

    def fwd(carry, inp):
        y_prev = carry
        L_i, C_i, b_i = inp
        y_i = jax.scipy.linalg.solve_triangular(
            L_i, b_i - C_i @ y_prev, lower=True
        )
        return y_i, y_i

    _, y = jax.lax.scan(fwd, jnp.zeros(nb, L.dtype), (L, Cpad, rhs))

    Cnext = jnp.concatenate([C, jnp.zeros((1, nb, nb), L.dtype)], axis=0)

    def bwd(carry, inp):
        x_next = carry
        L_i, Cn_i, y_i = inp
        x_i = jax.scipy.linalg.solve_triangular(
            L_i, y_i - Cn_i.T @ x_next, lower=True, trans=1
        )
        return x_i, x_i

    _, xr = jax.lax.scan(
        bwd, jnp.zeros(nb, L.dtype), (L, Cnext, y), reverse=True
    )
    return xr
