import numpy as np, time, jax, jax.numpy as jnp

m = 1024
rng = np.random.default_rng(0)
B = np.asarray(rng.standard_normal((m, m))) + 3*np.eye(m)
B32 = jnp.asarray(B).astype(jnp.float32)
HI = jax.lax.Precision.HIGHEST

lu_only = jax.jit(lambda X: jax.lax.linalg.lu(X)[0])
@jax.jit
def tri_only(lu, perm):
    L = jnp.tril(lu, -1) + jnp.eye(m, dtype=lu.dtype)
    U = jnp.triu(lu)
    Pm = jnp.zeros((m, m), lu.dtype).at[jnp.arange(m), perm].set(1.0)
    Y = jax.scipy.linalg.solve_triangular(L, Pm, lower=True, unit_diagonal=True)
    return jax.scipy.linalg.solve_triangular(U, Y, lower=False)

@jax.jit
def mm(X, Y):
    return jnp.matmul(X, Y, precision=HI)

lu, piv, perm = jax.lax.linalg.lu(B32)
def t(f, *a):
    np.asarray(f(*a)); t0=time.time()
    for _ in range(5): r = np.asarray(f(*a))
    return (time.time()-t0)/5*1e3

print(f"lu only: {t(lu_only, B32):.1f} ms")
print(f"trisolves: {t(tri_only, lu, perm):.1f} ms")
print(f"one HIGHEST matmul 1024^3: {t(mm, B32, B32):.1f} ms")
