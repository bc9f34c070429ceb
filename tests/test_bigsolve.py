"""crunch_polish: working-set simplex finish for large sparse LPs.

The capability class the reference serves with its sparse LU
(ClpFactorization.hpp:483 goSparse): sparse LPs beyond comfortable dense
scale still reach 1e-7+ accuracy. Here PDHG supplies the seed and
bigsolve.crunch_polish closes to verified KKT against the full sparse data.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from clp_tpu import Model, SolveOptions, ProblemStatus, SecondaryStatus, check_kkt
from clp_tpu.bigsolve import crunch_polish
from clp_tpu.pdlp import pdlp_solve


def _sparse_feasible_lp(m, n, nnz, seed=0, slack=0.5):
    rng = np.random.default_rng(seed)
    rows = rng.integers(0, m, nnz)
    cols = rng.integers(0, n, nnz)
    data = rng.normal(size=nnz)
    A = sp.csc_matrix((data, (rows, cols)), shape=(m, n))
    A.sum_duplicates()
    x0 = rng.uniform(0, 2, n)
    b = A @ x0
    mod = Model()
    mod.load_problem(
        A, col_lower=np.zeros(n), col_upper=np.full(n, 10.0),
        objective=rng.normal(size=n),
        row_lower=np.full(m, -1e30), row_upper=b + slack,
    )
    return mod


def test_pdlp_optimal_carries_reduced_accuracy():
    mod = _sparse_feasible_lp(200, 400, 4000, seed=1)
    sol = pdlp_solve(mod, SolveOptions())
    assert sol.status == ProblemStatus.OPTIMAL
    assert sol.secondary_status == SecondaryStatus.REDUCED_ACCURACY


def test_crunch_polish_reaches_simplex_accuracy():
    mod = _sparse_feasible_lp(600, 1200, 14000, seed=7)
    opts = SolveOptions()
    seed_sol = pdlp_solve(mod, opts)
    assert seed_sol.status == ProblemStatus.OPTIMAL
    pol = crunch_polish(mod, opts, seed_sol)
    assert pol is not None
    assert pol.status == ProblemStatus.OPTIMAL
    assert pol.secondary_status == SecondaryStatus.NONE
    rep = check_kkt(mod, x=pol.primal, y=pol.duals, tol=1e-7)
    assert rep.ok, str(rep)
    # the polish must strictly improve (or match) the first-order objective
    assert pol.objective_value <= seed_sol.objective_value + 1e-6 * (
        1 + abs(seed_sol.objective_value)
    )
    # cross-check the optimum against scipy's HiGHS
    from scipy.optimize import linprog

    res = linprog(
        mod.objective,
        A_ub=mod.matrix, b_ub=mod.row_upper,
        bounds=list(zip(mod.col_lower, mod.col_upper)),
        method="highs",
    )
    assert res.status == 0
    np.testing.assert_allclose(pol.objective_value, res.fun, rtol=1e-7, atol=1e-7)


def test_crunch_polish_never_reports_unverified_optimal():
    """Seed with a deliberately WRONG dual point: the polish must still only
    return a verified optimum (or None), never an unverified claim."""
    mod = _sparse_feasible_lp(300, 500, 5000, seed=3)
    opts = SolveOptions()
    rng = np.random.default_rng(0)
    from clp_tpu.model import Solution

    bogus = Solution(
        status=ProblemStatus.OPTIMAL,
        primal=rng.uniform(0, 1, mod.num_cols),
        duals=rng.normal(size=mod.num_rows),
    )
    pol = crunch_polish(mod, opts, bogus)
    if pol is not None:
        assert pol.status == ProblemStatus.OPTIMAL
        rep = check_kkt(mod, x=pol.primal, y=pol.duals, tol=1e-7)
        assert rep.ok, str(rep)
