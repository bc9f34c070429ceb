"""Sequential LP for nonlinear objectives vs the QP barrier oracle."""

import numpy as np
import pytest
import scipy.sparse as sp

import clp_tpu
from clp_tpu import Model, INF, ProblemStatus
from clp_tpu.slp import nonlinear_slp


def test_slp_quadratic_matches_qp_barrier():
    """Same convex quadratic solved by SLP and by the QP barrier."""
    rng = np.random.default_rng(2)
    n, m = 5, 3
    A = rng.uniform(0, 1, (m, n))
    Q = np.diag(rng.uniform(1.0, 2.0, n))
    c = rng.uniform(-3, -1, n)

    def build():
        mod = Model()
        mod.load_problem(
            sp.csc_matrix(A),
            col_lower=np.zeros(n),
            col_upper=np.full(n, 2.0),
            objective=c,  # ignored by SLP; used by QP path via Q+c
            row_lower=np.full(m, -INF),
            row_upper=rng.uniform(2.0, 4.0, m),
        )
        return mod

    rng2 = np.random.default_rng(2)  # rebuild with identical rows
    mod_qp = build()
    mod_qp.load_quadratic_objective(sp.csc_matrix(Q))
    sqp = mod_qp.barrier(crossover=False)
    assert sqp.status == ProblemStatus.OPTIMAL

    mod_slp = mod_qp.copy()
    mod_slp.quadratic_objective = None

    def f(x):
        return float(c @ x + 0.5 * x @ (Q @ x))

    def g(x):
        return c + Q @ x

    s = nonlinear_slp(mod_slp, f, g, max_passes=80)
    assert s.status == ProblemStatus.OPTIMAL
    assert abs(s.objective_value - sqp.objective_value) < 1e-4 * (
        1 + abs(sqp.objective_value)
    )
    np.testing.assert_allclose(s.primal, sqp.primal, atol=1e-3)


def test_slp_jax_autograd():
    """Gradient omitted: jax.grad drives a nonquadratic smooth objective."""
    import jax.numpy as jnp

    mod = Model()
    mod.load_problem(
        sp.csc_matrix(np.array([[1.0, 1.0]])),
        col_lower=[0.1, 0.1],
        col_upper=[5.0, 5.0],
        objective=[0.0, 0.0],
        row_lower=[-INF],
        row_upper=[4.0],
    )

    def f(x):
        # convex: -log(x1) - log(x2) + x1 + x2; unconstrained min at (1,1)
        return -jnp.log(x[0]) - jnp.log(x[1]) + x[0] + x[1]

    s = nonlinear_slp(mod, f, max_passes=60)
    assert s.status == ProblemStatus.OPTIMAL
    np.testing.assert_allclose(s.primal, [1.0, 1.0], atol=5e-3)


def test_slp_nonlinear_constraint_circle():
    """min -x-y s.t. x^2+y^2 <= 1 (plus vacuous linear row): (r2/2, r2/2)."""
    import jax.numpy as jnp
    import scipy.sparse as sp

    from clp_tpu.slp import Constraint, nonlinear_slp_constrained

    m = Model()
    m.load_problem(
        sp.csc_matrix(np.array([[1.0, 1.0]])),
        col_lower=[-2.0, -2.0],
        col_upper=[2.0, 2.0],
        objective=[-1.0, -1.0],
        row_lower=[-10.0],
        row_upper=[10.0],
    )
    con = Constraint(lambda x: jnp.sum(x * x), lower=-np.inf, upper=1.0)
    sol = nonlinear_slp_constrained(m, [con], max_passes=100)
    assert sol.status == ProblemStatus.OPTIMAL
    r2 = np.sqrt(2) / 2
    np.testing.assert_allclose(sol.primal, [r2, r2], atol=1e-4)
    assert abs(sol.objective_value - (-np.sqrt(2))) < 1e-4


def test_slp_nonlinear_objective_and_constraint():
    """min (x-2)^2+(y-2)^2 s.t. x+y<=2 (linear) and xy >= 0.5 (nonlinear)."""
    import jax.numpy as jnp
    import scipy.sparse as sp

    from clp_tpu.slp import Constraint, nonlinear_slp_constrained

    m = Model()
    m.load_problem(
        sp.csc_matrix(np.array([[1.0, 1.0]])),
        col_lower=[0.0, 0.0],
        col_upper=[5.0, 5.0],
        objective=[0.0, 0.0],
        row_lower=[-INF],
        row_upper=[2.0],
    )
    obj = lambda x: jnp.sum((x - 2.0) ** 2)  # noqa: E731
    con = Constraint(lambda x: x[0] * x[1], lower=0.5, upper=np.inf)
    sol = nonlinear_slp_constrained(m, [con], objective=obj, max_passes=150)
    assert sol.status == ProblemStatus.OPTIMAL
    # symmetric optimum on x+y=2: x=y=1 (xy=1 >= 0.5 satisfied)
    np.testing.assert_allclose(sol.primal, [1.0, 1.0], atol=1e-3)
