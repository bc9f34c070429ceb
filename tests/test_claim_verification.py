"""Terminal-claim verification protocol.

An infeasible/unbounded claim made from drifted incremental state must be
re-derived on fresh factors before it is accepted (the reference re-checks
in statusOfProblemInDual before finishing). Round-2 regression: feasible
LPs with free variables drew spurious PRIMAL_INFEASIBLE from the dual."""

import numpy as np
import scipy.optimize as so
import scipy.sparse as sp

from clp_tpu.constants import ProblemStatus
from clp_tpu.model import Model
from clp_tpu.options import SolveOptions
from clp_tpu.simplex import driver as drv


def _free_var_lp(i, rng):
    m_, n_ = 12, 20
    A = rng.normal(size=(m_, n_))
    c = rng.normal(size=n_)
    lo = np.zeros(n_)
    hi = np.full(n_, 10.0)
    lo[0], hi[0], c[0] = -np.inf, np.inf, 0.0  # zero-cost free var
    lo[1], hi[1] = -np.inf, np.inf
    x0 = rng.uniform(0, 2, n_)
    bu = A @ x0 + rng.uniform(0.5, 2.0, m_)
    mdl = Model()
    mdl.load_problem(sp.csc_matrix(A), lo, hi, c,
                     row_lower=-np.full(m_, 1e30), row_upper=bu)
    return mdl, A, c, lo, hi, bu


def test_dual_no_spurious_infeasible_with_free_vars():
    rng = np.random.default_rng(0)
    for i in range(8):
        mdl, A, c, lo, hi, bu = _free_var_lp(i, rng)
        sol = drv.simplex_solve(mdl, SolveOptions(), dual=True)
        ref = so.linprog(c, A_ub=A, b_ub=bu, bounds=list(zip(lo, hi)),
                         method="highs")
        assert ref.status == 0  # feasible by construction
        assert sol.status == ProblemStatus.OPTIMAL, (i, sol.status)
        assert abs(sol.objective_value - ref.fun) < 1e-6 * (1 + abs(ref.fun))


def test_dual_chunked_no_spurious_infeasible():
    """Host-chunked mode uses the same re-derivation protocol."""
    rng = np.random.default_rng(0)
    mdl, A, c, lo, hi, bu = _free_var_lp(2, rng)
    for i in range(2):  # instance 2 of the original repro triggered it
        mdl, A, c, lo, hi, bu = _free_var_lp(i, rng)
    sol = drv.simplex_solve(mdl, SolveOptions(max_seconds=120.0), dual=True)
    ref = so.linprog(c, A_ub=A, b_ub=bu, bounds=list(zip(lo, hi)),
                     method="highs")
    assert sol.status == ProblemStatus.OPTIMAL
    assert abs(sol.objective_value - ref.fun) < 1e-6 * (1 + abs(ref.fun))


def test_genuinely_infeasible_still_detected():
    A = np.array([[1.0, 1.0], [1.0, 1.0]])
    mdl = Model()
    mdl.load_problem(
        sp.csc_matrix(A),
        np.array([-np.inf, 0.0]), np.array([np.inf, 5.0]),
        np.array([0.0, 1.0]),
        row_lower=np.array([3.0, -1e30]), row_upper=np.array([1e30, 1.0]),
    )  # x+y >= 3 and x+y <= 1
    sol = drv.simplex_solve(mdl, SolveOptions(), dual=True)
    assert sol.status == ProblemStatus.PRIMAL_INFEASIBLE


def test_batch_hard_cases_stay_batched():
    """Fake-bound endings are escalated/finished inside the batch; the
    per-instance driver fallback only fires for numerical leftovers."""
    from clp_tpu.parallel.batch import solve_batch_dual_simplex

    calls = []
    orig = drv.simplex_solve

    def counting(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    rng = np.random.default_rng(0)
    models, refs = [], []
    for i in range(8):
        mdl, A, c, lo, hi, bu = _free_var_lp(i, rng)
        models.append(mdl)
        refs.append(so.linprog(c, A_ub=A, b_ub=bu, bounds=list(zip(lo, hi)),
                               method="highs"))
    drv.simplex_solve = counting
    try:
        sols = solve_batch_dual_simplex(models, SolveOptions())
    finally:
        drv.simplex_solve = orig
    assert len(calls) == 0, f"{len(calls)} instances serialized"
    for sol, ref in zip(sols, refs):
        assert sol.status == ProblemStatus.OPTIMAL
        assert abs(sol.objective_value - ref.fun) < 1e-6 * (1 + abs(ref.fun))
