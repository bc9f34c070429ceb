"""Interior-point solver tests: KKT oracle + scipy cross-checks."""

import numpy as np
import pytest

import clp_tpu
from clp_tpu import Model, SolveOptions, SolveMethod, check_kkt, INF
from clp_tpu.utils.generators import random_lp, nqueens_lp, transport_lp
from tests.test_mps import _linprog


def _solve_barrier(model, crossover=False):
    return model.barrier(crossover=crossover)


def test_tiny_lp():
    """min -x1-2x2 s.t. x1+x2<=4, x1<=2, x2<=3, x>=0 -> opt at (1,3), obj -7."""
    import scipy.sparse as sp

    model = Model()
    model.load_problem(
        sp.csc_matrix(np.array([[1.0, 1.0]])),
        col_lower=[0, 0],
        col_upper=[2, 3],
        objective=[-1.0, -2.0],
        row_lower=[-INF],
        row_upper=[4.0],
    )
    sol = _solve_barrier(model)
    assert sol.status == clp_tpu.ProblemStatus.OPTIMAL
    assert abs(sol.objective_value - (-7.0)) < 1e-6
    rep = check_kkt(model)
    assert rep.ok, str(rep)


def test_equality_lp():
    """min x1+x2 s.t. x1+x2=1, x>=0 -> obj 1."""
    import scipy.sparse as sp

    model = Model()
    model.load_problem(
        sp.csc_matrix(np.array([[1.0, 1.0]])),
        col_lower=[0, 0],
        col_upper=[INF, INF],
        objective=[1.0, 1.0],
        row_lower=[1.0],
        row_upper=[1.0],
    )
    sol = _solve_barrier(model)
    assert sol.status == clp_tpu.ProblemStatus.OPTIMAL
    assert abs(sol.objective_value - 1.0) < 1e-6


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_lps_vs_scipy(seed):
    model = random_lp(15, 25, seed=seed)
    ref = _linprog(model)
    sol = _solve_barrier(model)
    assert sol.status == clp_tpu.ProblemStatus.OPTIMAL
    assert ref.status == 0
    assert abs(sol.objective_value - ref.fun) < 1e-6 * (1 + abs(ref.fun))
    rep = check_kkt(model)
    assert rep.ok, str(rep)


def test_nqueens():
    model = nqueens_lp(6)
    sol = _solve_barrier(model)
    assert sol.status == clp_tpu.ProblemStatus.OPTIMAL
    # LP relaxation of 6-queens places 6 fractional queens
    assert abs(sol.objective_value - 6.0) < 1e-5


def test_transport():
    model = transport_lp(5, 7, seed=1)
    ref = _linprog(model)
    sol = _solve_barrier(model)
    assert sol.status == clp_tpu.ProblemStatus.OPTIMAL
    assert abs(sol.objective_value - ref.fun) < 1e-6 * (1 + abs(ref.fun))


def test_free_variables():
    """Free variable LP: min x + y, x + y >= 2, x free in effect."""
    import scipy.sparse as sp

    model = Model()
    model.load_problem(
        sp.csc_matrix(np.array([[1.0, 1.0], [1.0, -1.0]])),
        col_lower=[-INF, 0],
        col_upper=[INF, INF],
        objective=[1.0, 1.0],
        row_lower=[2.0, -INF],
        row_upper=[INF, 1.0],
    )
    ref = _linprog(model)
    sol = _solve_barrier(model)
    assert sol.status == clp_tpu.ProblemStatus.OPTIMAL
    assert abs(sol.objective_value - ref.fun) < 1e-6


def test_afiro_mps(afiro_path):
    model = Model()
    model.read_mps(afiro_path)
    ref = _linprog(model)
    sol = _solve_barrier(model)
    assert sol.status == clp_tpu.ProblemStatus.OPTIMAL
    assert abs(sol.objective_value - ref.fun) < 1e-6 * (1 + abs(ref.fun))
    rep = check_kkt(model)
    assert rep.ok, str(rep)


def test_maximize():
    model = nqueens_lp(4)  # a maximize model
    sol = _solve_barrier(model)
    assert sol.status == clp_tpu.ProblemStatus.OPTIMAL
    assert abs(sol.objective_value - 4.0) < 1e-5
    rep = check_kkt(model)
    assert rep.ok, str(rep)


def test_cg_mode_matches_cholesky():
    """Matrix-free CG normal equations (PDCO capability) == dense path."""
    from clp_tpu.forms import to_ipm_form
    from clp_tpu.interior.mehrotra import IPMOptions, ipm_solve_jit

    model = random_lp(20, 35, seed=8)
    lp, _ = to_ipm_form(model)
    r1 = ipm_solve_jit(lp, IPMOptions())
    r2 = ipm_solve_jit(lp, IPMOptions(linear_solver="cg"))
    assert bool(r1.converged) and bool(r2.converged)
    assert abs(float(r1.pobj) - float(r2.pobj)) < 1e-7 * (1 + abs(float(r1.pobj)))


def test_pdlp_solver():
    """First-order PDHG with restarts reaches moderate accuracy."""
    from clp_tpu import SolveOptions, SolveMethod

    model = random_lp(12, 20, seed=17)
    ref = _linprog(model)
    o = SolveOptions(method=SolveMethod.PDLP)
    o.presolve.enabled = False
    sol = model.initial_solve(o)
    assert sol.status == clp_tpu.ProblemStatus.OPTIMAL
    # first-order accuracy target is moderate by design
    assert abs(sol.objective_value - ref.fun) < 1e-2 * (1 + abs(ref.fun))


def test_lsqr_kernel_matches_direct():
    """Damped LSQR solves (G D G' + reg) dy = rhs to machine precision."""
    import jax.numpy as jnp
    from clp_tpu.interior.mehrotra import _lsqr_damped

    rng = np.random.default_rng(0)
    G = jnp.asarray(rng.standard_normal((30, 50)))
    d = jnp.asarray(rng.uniform(0.5, 2.0, 50))
    reg = 1e-8
    rhs = jnp.asarray(rng.standard_normal(30))
    M = np.asarray(G) * np.asarray(d) @ np.asarray(G).T + reg * np.eye(30)
    ref = np.linalg.solve(M, np.asarray(rhs))
    got = np.asarray(
        _lsqr_damped(G, jnp.sqrt(d), jnp.sqrt(jnp.asarray(reg)), rhs, 500)
    )
    assert np.abs(got - ref).max() < 1e-10 * (1 + np.abs(ref).max())


@pytest.mark.parametrize("solver", ["lsqr", "cg"])
def test_ipm_matrix_free_solvers(solver):
    """LSQR / user-preconditioned CG paths reach the cholesky optimum
    (ClpPdco + ClpLsqr + matPrecon parity)."""
    from clp_tpu.forms import to_ipm_form
    from clp_tpu.interior.mehrotra import IPMOptions, ipm_solve

    m = random_lp(40, 70, seed=0)
    lp, _ = to_ipm_form(m)
    ref = ipm_solve(lp, IPMOptions(linear_solver="cholesky"))
    kw = dict(linear_solver=solver, cg_maxiter=400)
    if solver == "cg":
        kw["precond"] = lambda r: r  # identity user preconditioner hook
    res = ipm_solve(lp, IPMOptions(**kw))
    assert bool(res.converged)
    assert abs(float(res.pobj) - float(ref.pobj)) < 1e-6 * (
        1 + abs(float(ref.pobj))
    )


def test_pdco_separable_objective_hooks():
    """obj/grad/hess hooks (ClpPdcoBase::getObj/getGrad/getHessian parity):
    a separable quadratic through the hooks matches the explicit-Q barrier,
    and a genuinely nonlinear exp objective converges with clean KKT."""
    import jax.numpy as jnp
    import scipy.sparse as sp
    from clp_tpu.forms import to_ipm_form
    from clp_tpu.interior.mehrotra import IPMOptions, ipm_solve

    m = random_lp(30, 50, seed=1)
    q = np.abs(np.random.default_rng(0).uniform(0.5, 2.0, m.num_cols))
    mq = m.copy()
    mq.quadratic_objective = sp.diags(q).tocsc()
    lpq, _ = to_ipm_form(mq)
    ref = ipm_solve(lpq, IPMOptions())

    lp, _ = to_ipm_form(m)
    nt = lp.G.shape[1]
    n = m.num_cols
    qfull = jnp.asarray(np.concatenate([q, np.zeros(nt - n)]))
    res = ipm_solve(lp, IPMOptions(
        obj_fn=lambda x: 0.5 * jnp.sum(qfull * x * x),
        grad_fn=lambda x: qfull * x,
        hess_fn=lambda x: qfull,
    ))
    assert bool(ref.converged) and bool(res.converged)
    assert abs(float(ref.pobj) - float(res.pobj)) < 1e-8 * (
        1 + abs(float(ref.pobj))
    )

    pad = jnp.zeros(nt - n)
    r3 = ipm_solve(lp, IPMOptions(
        obj_fn=lambda x: jnp.sum(jnp.exp(0.2 * x[:n])),
        grad_fn=lambda x: jnp.concatenate([0.2 * jnp.exp(0.2 * x[:n]), pad]),
        hess_fn=lambda x: jnp.concatenate([0.04 * jnp.exp(0.2 * x[:n]), pad]),
        max_iter=200,
    ))
    assert bool(r3.converged)
    x = np.asarray(r3.x)
    gradphi = np.concatenate([0.2 * np.exp(0.2 * x[:n]), np.zeros(nt - n)])
    rc = (np.asarray(lp.c) + gradphi - np.asarray(lp.G).T @ np.asarray(r3.y)
          - np.asarray(r3.z) + np.asarray(r3.w))
    assert np.abs(rc).max() < 1e-6


def test_pdlp_sparse_backend_agrees():
    """Sparse BCOO matvecs return the same answer as dense (memory O(nnz)
    path for beyond-dense-scale LPs)."""
    from clp_tpu import SolveOptions, SolveMethod

    model = random_lp(40, 64, seed=18, density=0.1)
    ref = _linprog(model)
    sols = {}
    for sparse in (False, True):
        o = SolveOptions(method=SolveMethod.PDLP, pdlp_sparse=sparse)
        o.presolve.enabled = False
        sols[sparse] = model.copy().initial_solve(o)
    for s in sols.values():
        assert s.status == clp_tpu.ProblemStatus.OPTIMAL
        assert abs(s.objective_value - ref.fun) < 1e-2 * (1 + abs(ref.fun))
    assert abs(sols[0].objective_value - sols[1].objective_value) < 1e-3 * (
        1 + abs(ref.fun)
    )


def test_pdlp_badly_scaled_lp():
    """Ruiz equilibration: convergence survives 1e4 coefficient spread."""
    import scipy.sparse as sp
    from clp_tpu import SolveOptions, SolveMethod, Model, INF

    rng = np.random.default_rng(2)
    m, n = 16, 24
    base = random_lp(m, n, seed=19)
    # blow up row/col scales
    R = 10.0 ** rng.uniform(-2, 2, m)
    C = 10.0 ** rng.uniform(-2, 2, n)
    A = sp.csc_matrix(np.asarray(base.matrix.todense()) * R[:, None] * C[None, :])
    model = Model()
    model.load_problem(
        A,
        col_lower=base.col_lower / C, col_upper=base.col_upper / C,
        objective=base.objective * C,
        row_lower=np.where(base.row_lower <= -INF, -INF, base.row_lower * R),
        row_upper=np.where(base.row_upper >= INF, INF, base.row_upper * R),
    )
    ref = _linprog(model)
    o = SolveOptions(method=SolveMethod.PDLP)
    o.presolve.enabled = False
    sol = model.initial_solve(o)
    assert sol.status == clp_tpu.ProblemStatus.OPTIMAL
    assert ref.status == 0
    assert abs(sol.objective_value - ref.fun) < 1e-2 * (1 + abs(ref.fun))


def test_pdlp_polish_to_simplex_accuracy():
    """PDLP + values-pass dual polish reaches 1e-8 agreement (the
    barrier+crossover analogue for the first-order path)."""
    from clp_tpu import SolveOptions, SolveMethod

    model = random_lp(30, 50, seed=21)
    ref = _linprog(model)
    o = SolveOptions(method=SolveMethod.PDLP, crossover=True)
    o.presolve.enabled = False
    sol = model.initial_solve(o)
    assert sol.status == clp_tpu.ProblemStatus.OPTIMAL
    assert abs(sol.objective_value - ref.fun) < 1e-8 * (1 + abs(ref.fun))
    # without polish: moderate accuracy only is promised
    o2 = SolveOptions(method=SolveMethod.PDLP, crossover=False)
    o2.presolve.enabled = False
    s2 = model.copy().initial_solve(o2)
    assert abs(s2.objective_value - ref.fun) < 1e-2 * (1 + abs(ref.fun))


def test_pdlp_classifies_infeasible_and_unbounded():
    """PDHG cannot certify infeasibility/unboundedness; the simplex
    adjudication on FAILED_TO_CONVERGE must classify both."""
    import scipy.sparse as sp
    from clp_tpu import SolveOptions, SolveMethod, INF
    from clp_tpu.utils.generators import infeasible_lp

    o = SolveOptions(method=SolveMethod.PDLP)
    o.presolve.enabled = False
    s = infeasible_lp().initial_solve(o)
    assert s.status == clp_tpu.ProblemStatus.PRIMAL_INFEASIBLE

    m = random_lp(15, 12, seed=203, density=0.4)
    a0 = np.asarray(m.matrix.todense())[:, 0:1]
    m.col_upper = m.col_upper.copy(); m.col_upper[0] = INF
    m.add_columns(sp.csc_matrix(-a0), lower=[0.0], upper=[INF],
                  objective=[-float(m.objective[0]) - 1.0])
    s2 = m.initial_solve(o)
    assert s2.status == clp_tpu.ProblemStatus.DUAL_INFEASIBLE


def test_ipm_shape_bucketing_shares_programs():
    """SolveOptions.shape_bucket on the BARRIER path pads the IPM
    standard form to bucket multiples with strictly-interior padding
    (pad rows read x_pad = 0 through a singleton column; fixed padding
    would be stripped by to_ipm_form) so nearby shapes share ONE
    compiled barrier program; results match the unbucketed solve."""
    import time

    from clp_tpu.solve import _pad_ipm_lp, _solve_barrier
    from clp_tpu.forms import to_ipm_form

    # padding invariants on a model with a FIXED column (the tricky case)
    mfix = random_lp(13, 21, seed=9)
    mfix.col_lower = mfix.col_lower.copy()
    mfix.col_upper = mfix.col_upper.copy()
    mfix.col_lower[3] = mfix.col_upper[3] = 0.5
    lp, _ = to_ipm_form(mfix)
    lp2, dims = _pad_ipm_lp(lp, 64)
    assert dims == (lp.G.shape[0], lp.G.shape[1])
    assert lp2.G.shape[0] % 64 == 0 and lp2.G.shape[1] % 64 == 0
    # pad rows are satisfied strictly interior at x_pad = 0
    assert np.all(np.asarray(lp2.l)[lp.G.shape[1]:] < 0)
    assert np.all(np.asarray(lp2.u)[lp.G.shape[1]:] > 0)

    walls = []
    for m_, n_ in [(37, 61), (41, 59)]:
        mod = random_lp(m_, n_, seed=5)
        ref = _solve_barrier(random_lp(m_, n_, seed=5),
                             SolveOptions(method=SolveMethod.BARRIER))
        o = SolveOptions(method=SolveMethod.BARRIER, shape_bucket=64)
        t0 = time.time()
        sol = _solve_barrier(mod, o)
        walls.append(time.time() - t0)
        assert sol.status == ref.status == clp_tpu.ProblemStatus.OPTIMAL
        assert abs(sol.objective_value - ref.objective_value) < 1e-6 * (
            1 + abs(ref.objective_value))
        assert sol.primal.shape == (n_,)
        assert sol.duals.shape == (m_,)
        rep = check_kkt(mod, x=sol.primal, y=sol.duals, tol=1e-5)
        assert rep.ok, rep
    # the second odd shape lands in the same bucket: no recompile
    assert walls[1] < walls[0] / 2, walls


def test_ipm_shape_bucketing_qp():
    """Bucketed barrier on a separable QP: padded diagonal Q stays
    diagonal so the q_diag fast branches still apply."""
    import scipy.sparse as sp

    m = random_lp(11, 17, seed=31)
    m.load_quadratic_objective(sp.diags(np.linspace(0.5, 2.0, 17)).tocsc())
    ref = _solve_barrier(m)
    o = SolveOptions(method=SolveMethod.BARRIER, shape_bucket=32)
    from clp_tpu.solve import _solve_barrier as sb
    sol = sb(m, o)
    assert sol.status == clp_tpu.ProblemStatus.OPTIMAL
    assert abs(sol.objective_value - ref.objective_value) < 1e-6 * (
        1 + abs(ref.objective_value))


def test_mixed32_dense_barrier_matches_f64():
    """mixed32 (f32 MXU assembly/factor + Jacobi scaling + f64 matvec
    refinement) reaches the same optimum as the f64 normal equations —
    the TPU path's accuracy contract."""
    from clp_tpu.forms import to_ipm_form
    from clp_tpu.interior.mehrotra import IPMOptions, ipm_solve_jit
    from clp_tpu.utils.generators import random_lp
    from tests.test_mps import _linprog

    for seed in (0, 5):
        model = random_lp(96, 160, seed=seed)
        ref = _linprog(model)
        assert ref.status == 0
        lp, info = to_ipm_form(model)
        res = ipm_solve_jit(lp, IPMOptions(tol=1e-8, mixed32=True))
        assert bool(res.converged)
        obj = float(res.pobj) * info.sense + model.objective_offset
        assert abs(obj - ref.fun) < 1e-6 * (1 + abs(ref.fun))
