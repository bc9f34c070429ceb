"""Calibrate TPU costs of Cholesky-building primitives (slope-timed).

jnp.linalg.cholesky f32 at m=2048 measures 5 TFLOP/s = 3.1% of this
chip's f32 matmul ceiling (BENCH r5 mxu_efficiency) — the mixed32
barrier's hot kernel. Before designing a blocked replacement, measure
what each candidate building block actually costs at each size:
  - jnp.linalg.cholesky (POTRF)
  - solve_triangular vs identity (explicit L^-1)
  - solve_triangular vs a wide RHS (TRSM)
  - the SYRK-shaped matmul
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def slope(make_run, x0, K1, K2, reps=3):
    t = {}
    for K in (K1, K2):
        run = make_run(K)
        float(run(x0))
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(x0))
            best = min(best, time.perf_counter() - t0)
        t[K] = best
    return (t[K2] - t[K1]) / (K2 - K1)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)

    # f32 matmul ceiling at HIGHEST precision (true-f32 accumulation via
    # bf16 passes) — the precision class accuracy-critical kernels use
    mh = 2048
    A0 = jnp.asarray(rng.standard_normal((mh, mh)), jnp.float32)

    def chainh(step):
        def make_run(K):
            def run(x):
                c, _ = lax.scan(lambda c, _: (step(c), None), x, None,
                                length=K)
                return jnp.sum(c[..., :1, :1]).astype(jnp.float32)

            return jax.jit(run)

        return make_run

    def mm_hi(x):
        y = jnp.matmul(x, A0, precision=jax.lax.Precision.HIGHEST)
        return y / (jnp.max(jnp.abs(y)) + 1e-6)

    t_hi = slope(chainh(mm_hi), A0, 8, 40)
    print(f"f32 HIGHEST matmul 2048^3: {t_hi*1e6:9.1f} us "
          f"({2*mh**3/t_hi/1e12:6.1f} TF/s)", flush=True)

    def chain(step):
        def make_run(K):
            def run(x):
                c, _ = lax.scan(lambda c, _: (step(c), None), x, None,
                                length=K)
                return jnp.sum(c[..., :1, :1]).astype(jnp.float32)

            return jax.jit(run)

        return make_run

    for m in (64, 128, 256, 512, 1024, 2048):
        G = rng.standard_normal((m, 2 * m))
        H = jnp.asarray(G @ G.T + m * np.eye(m), jnp.float32)
        eye = jnp.eye(m, dtype=jnp.float32)

        def potrf(Hc):
            L = jnp.linalg.cholesky(Hc)
            return Hc.at[0, 0].add((L[0, 0] * 1e-30).astype(Hc.dtype))

        def inv_tri(Hc):
            L = jnp.linalg.cholesky(Hc)
            Li = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
            return Hc.at[0, 0].add((Li[0, 0] * 1e-30).astype(Hc.dtype))

        t_po = slope(chain(potrf), H, 4, 20)
        t_inv = slope(chain(inv_tri), H, 4, 20)
        fl = m ** 3 / 3
        print(f"m={m:5d}: potrf {t_po*1e6:9.1f} us ({fl/t_po/1e12:6.2f} "
              f"TF/s)   potrf+inv(I) {t_inv*1e6:9.1f} us", flush=True)

    # TRSM wide: L(256) vs RHS (256, 1792) — the panel shape at nb=256,
    # m=2048; and the same job done as matmul by explicit inverse
    m, w = 256, 1792
    G = rng.standard_normal((m, 2 * m))
    H = jnp.asarray(G @ G.T + m * np.eye(m), jnp.float32)
    L = jnp.linalg.cholesky(H)
    R = jnp.asarray(rng.standard_normal((m, w)), jnp.float32)

    def trsm(Rc):
        Y = jax.scipy.linalg.solve_triangular(L, Rc, lower=True)
        return Y / (jnp.max(jnp.abs(Y)) + 1e-6)

    t_tr = slope(chain(trsm), R, 4, 20)
    Li = jax.scipy.linalg.solve_triangular(L, jnp.eye(m, dtype=jnp.float32),
                                           lower=True)

    def mm(Rc):
        Y = Li @ Rc
        return Y / (jnp.max(jnp.abs(Y)) + 1e-6)

    t_mm = slope(chain(mm), R, 8, 40)
    print(f"TRSM  L256 x (256,{w}): {t_tr*1e6:9.1f} us;  as matmul with "
          f"explicit Linv: {t_mm*1e6:9.1f} us", flush=True)

    # SYRK-shaped matmul (1792, 256) @ (256, 1792)
    A = jnp.asarray(rng.standard_normal((w, m)), jnp.float32)

    def syrk(Ac):
        S = Ac @ Ac.T  # (w, w)
        return Ac / (jnp.max(jnp.abs(S[:1, :1])) * 1e-30 + 1.0)

    t_sy = slope(chain(syrk), A, 4, 20)
    print(f"SYRK (1792,256)x(256,1792): {t_sy*1e6:9.1f} us "
          f"({2*w*w*m/t_sy/1e12:6.1f} TF/s)", flush=True)


if __name__ == "__main__":
    main()
