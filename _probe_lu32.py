import numpy as np, time, jax, jax.numpy as jnp

m = 1024
rng = np.random.default_rng(0)
B = np.asarray(rng.standard_normal((m, m))) + 3*np.eye(m)
B64 = jnp.asarray(B)
B32 = B64.astype(jnp.float32)

@jax.jit
def native_inv32(X):
    lu, piv, perm = jax.lax.linalg.lu(X)
    L = jnp.tril(lu, -1) + jnp.eye(m, dtype=X.dtype)
    U = jnp.triu(lu)
    Pm = jnp.zeros((m, m), X.dtype).at[jnp.arange(m), perm].set(1.0)
    Y = jax.scipy.linalg.solve_triangular(L, Pm, lower=True, unit_diagonal=True)
    return jax.scipy.linalg.solve_triangular(U, Y, lower=False)

Y = np.asarray(native_inv32(B32))
t0 = time.time()
for _ in range(5):
    Y = np.asarray(native_inv32(B32))
dt = (time.time()-t0)/5
err = np.abs(np.eye(m) - B @ Y.astype(np.float64)).max()
print(f"native f32 lu+trisolve inverse: {dt*1e3:.1f} ms, ||I-BX||_max = {err:.2e}")

# refined f64 solve accuracy via f32 inverse
rhs = rng.standard_normal(m)
x = Y.astype(np.float64) @ rhs
for k in range(3):
    r = rhs - B @ x
    x = x + Y.astype(np.float64) @ r
    print(f"  refine {k}: rel resid = {np.abs(B@x - rhs).max()/np.abs(rhs).max():.2e}")
