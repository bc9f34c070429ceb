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


def lu_refactor(B: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Dense factorization of a basis matrix, returning (Binv, ok_flag).

    The simplex engine maintains an explicit inverse updated by rank-1
    product-form transforms each pivot; this is the periodic from-scratch
    refactorization (reference cadence: ClpFactorization::timeToRefactorize,
    ClpFactorization.cpp:1524). On CPU, XLA's f64 LU is used; on TPU
    backends (no f64 LuDecomposition kernel) the Gauss-Jordan path runs.
    """
    if jax.devices()[0].platform == "cpu":
        lu, piv = jax.scipy.linalg.lu_factor(B)
        n = B.shape[-1]
        eye = jnp.eye(n, dtype=B.dtype)
        Binv = jax.scipy.linalg.lu_solve((lu, piv), eye)
    else:
        Binv = gauss_jordan_inverse(B)
    ok = jnp.all(jnp.isfinite(Binv))
    return Binv, ok
