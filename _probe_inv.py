import numpy as np, time, jax, jax.numpy as jnp
from clp_tpu.ops.linalg import blocked_inverse

m = 1024
rng = np.random.default_rng(0)
B = np.asarray(rng.standard_normal((m, m))) + 3*np.eye(m)
B64 = jnp.asarray(B)
B32 = B64.astype(jnp.float32)

f64inv = jax.jit(lambda X: blocked_inverse(X))
f32inv = jax.jit(lambda X: blocked_inverse(X))
HI = jax.lax.Precision.HIGHEST

@jax.jit
def f32inv_newton(X):
    Xi = blocked_inverse(X)
    R = jnp.eye(m, dtype=jnp.float32) - jnp.matmul(X, Xi, precision=HI)
    return Xi + jnp.matmul(Xi, R, precision=HI)

def bench(f, X, name):
    Y = np.asarray(f(X))  # compile+run
    t0 = time.time()
    for _ in range(3):
        Y = np.asarray(f(X))
    dt = (time.time()-t0)/3
    err = np.abs(np.eye(m) - B @ Y.astype(np.float64)).max()
    print(f"{name}: {dt*1e3:.1f} ms, ||I-BX||_max = {err:.2e}")

bench(f64inv, B64, "f64 blocked_inverse")
bench(f32inv, B32, "f32 blocked_inverse (default prec)")
bench(f32inv_newton, B32, "f32 + 1 Newton HIGHEST")
