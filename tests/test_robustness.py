"""Mixed-precision failure paths + batched hard-case fuzz (PLAN_R3 #7).

Reference analogues: ClpSimplex's NUMERICAL-difficulties protocol
(singular factorization -> retry/perturb/switch) and the batched engine's
hard-case handling.
"""

import numpy as np
import pytest

import clp_tpu
from clp_tpu import Model, ProblemStatus, SolveOptions, SolveMethod, check_kkt, INF
from clp_tpu.utils.generators import random_lp
from tests.test_mps import _linprog

import jax.numpy as jnp


def test_f32_refinement_residual_gate_flags_numerical():
    """recompute() in mixed mode must flag a basis the f32 factorization
    cannot represent (refinement residual stays large) as NUMERICAL
    instead of silently using a bad inverse."""
    from clp_tpu.forms import to_standard_form
    from clp_tpu.simplex import engine

    n = 12
    model = random_lp(n, 2 * n, seed=0)
    lp, _ = to_standard_form(model)
    # poison the structural block: a Hilbert-like column cluster whose
    # condition number (~1e17) exceeds any f32 factorization's reach
    G = np.array(lp.G)  # writable copy
    H = np.array([[1.0 / (i + j + 1) for j in range(n)] for i in range(n)])
    G[:, :n] = H
    lp = lp.__class__(
        G=jnp.asarray(G), b=lp.b, c=lp.c, l=lp.l, u=lp.u
    )
    opts = engine.SimplexOptions(inverse_dtype="float32")
    # force the Hilbert columns in as the basis
    st = engine.initial_state(
        lp, opts,
        vstat=jnp.asarray(
            [engine.BASIC] * n + [engine.AT_LOWER] * (lp.G.shape[1] - n),
            jnp.int32,
        ),
        basis=jnp.arange(n, dtype=jnp.int32),
    )
    st = engine.recompute(lp, st, opts.dual_bound)
    assert int(st.status) == engine.NUMERICAL


def test_f32_refinement_accepts_good_basis():
    """The same gate must PASS a well-conditioned basis and deliver f64
    accuracy (refined x_B residual ~1e-12)."""
    from clp_tpu.forms import to_standard_form
    from clp_tpu.simplex import engine

    model = random_lp(20, 35, seed=1)
    lp, _ = to_standard_form(model)
    opts = engine.SimplexOptions(inverse_dtype="float32")
    st = engine.initial_state(lp, opts)
    st = engine.recompute(lp, st, opts.dual_bound)
    assert int(st.status) == engine.CONTINUE
    B = np.asarray(lp.G)[:, np.asarray(st.basis)]
    xn = engine.nonbasic_values(lp, st.vstat, opts.dual_bound)
    rhs = np.asarray(lp.b) - np.asarray(lp.G) @ np.asarray(xn)
    resid = np.max(np.abs(B @ np.asarray(st.xb) - rhs))
    assert resid < 1e-10 * (1 + np.max(np.abs(rhs)))


def test_mixed_mode_escalates_to_f64_on_hard_lp():
    """End-to-end: a mixed-precision solve on an ill-conditioned LP must
    end OPTIMAL (driver escalation: refactor -> perturb -> algorithm
    switch), agreeing with the f64 reference answer."""
    rng = np.random.default_rng(7)
    n = 24
    # graded columns spanning 9 orders of magnitude: f32 factors struggle
    scales = np.logspace(0, -9, n)
    model = random_lp(n, n + 16, seed=7)
    A = np.asarray(model.matrix.todense())
    A[:, :n] = A[:, :n] * scales
    import scipy.sparse as sp

    cu = np.array(model.col_upper)
    cu[:n] = cu[:n] / scales  # keep the original feasible point reachable
    model.load_problem(
        sp.csc_matrix(A),
        col_lower=model.col_lower,
        col_upper=cu,
        objective=model.objective,
        row_lower=model.row_lower,
        row_upper=model.row_upper,
    )
    ref = _linprog(model)
    o = SolveOptions(method=SolveMethod.DUAL_SIMPLEX)
    o.presolve.enabled = False
    o.scaling = clp_tpu.ScalingMode.OFF
    o.inverse_dtype = "float32"
    sol = model.initial_solve(o)
    assert sol.status == ProblemStatus.OPTIMAL
    # escalation really fired: the final factorization ran in f64
    assert sol.timings["factorization_stats"]["inverse_dtype"] == "float64"
    assert check_kkt(model).ok
    if ref.status == 0:
        # on this deliberately vile scaling HiGHS itself is loose: require
        # our KKT-verified answer to be at least as good as its optimum
        assert sol.objective_value <= ref.fun + 1e-5 * (1 + abs(ref.fun))


def test_batched_hard_case_fuzz():
    """A batch where MANY instances need the hard-case path (free
    variables -> fake bounds; degenerate equalities) must come back
    per-instance correct vs scipy."""
    from clp_tpu.parallel.batch import solve_batch_dual_simplex

    rng = np.random.default_rng(3)
    base = random_lp(14, 22, seed=3, equality_frac=0.6)
    models = []
    for k in range(12):
        mod = base.copy()
        if k % 2 == 0:
            # free variables: dual folds them into fake bounds
            cl = np.array(mod.col_lower)
            cu = np.array(mod.col_upper)
            cl[k % mod.num_cols] = -INF
            cu[k % mod.num_cols] = INF
            mod.col_lower, mod.col_upper = cl, cu
        if k % 3 == 0:
            # degenerate: duplicate RHS rows pin activities
            rl = np.array(mod.row_lower)
            ru = np.array(mod.row_upper)
            rl[: k % mod.num_rows] = ru[: k % mod.num_rows]
            mod.row_lower = rl
        mod.objective = mod.objective + rng.normal(0, 0.01, mod.num_cols)
        models.append(mod)
    sols = solve_batch_dual_simplex(models)
    n_ok = 0
    for mod, sol in zip(models, sols):
        ref = _linprog(mod)
        if ref.status == 0:
            assert sol.status == ProblemStatus.OPTIMAL, ref.status
            assert abs(sol.objective_value - ref.fun) < 1e-6 * (1 + abs(ref.fun))
            n_ok += 1
        elif ref.status == 2:
            assert sol.status == ProblemStatus.PRIMAL_INFEASIBLE
    assert n_ok >= 6  # the battery must actually exercise optimal cases
