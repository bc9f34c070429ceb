"""Strategy-matrix sweep: every method x presolve setting must agree
(reference pattern: 12-strategy netlib sweep, unitTest.cpp:92-180)."""

import numpy as np
import pytest

import clp_tpu
from clp_tpu import Model, SolveOptions, SolveMethod, ProblemStatus, check_kkt
from clp_tpu.utils.generators import random_lp, transport_lp
from tests.test_mps import _linprog

STRATEGIES = [
    (SolveMethod.DUAL_SIMPLEX, True, "none"),
    (SolveMethod.DUAL_SIMPLEX, False, "none"),
    (SolveMethod.PRIMAL_SIMPLEX, True, "none"),
    (SolveMethod.PRIMAL_SIMPLEX, False, "idiot"),
    (SolveMethod.BARRIER, True, "none"),
    (SolveMethod.BARRIER_NO_CROSS, False, "none"),
    (SolveMethod.AUTOMATIC, True, "none"),
]


@pytest.mark.parametrize("gen,seed", [("random", 21), ("random", 22), ("transport", 5)])
def test_all_strategies_agree(gen, seed):
    def make():
        if gen == "random":
            return random_lp(10, 16, seed=seed)
        return transport_lp(4, 5, seed=seed)

    ref = _linprog(make())
    assert ref.status == 0
    for method, presolve, crash in STRATEGIES:
        model = make()
        o = SolveOptions(method=method, crash=crash)
        o.presolve.enabled = presolve
        sol = model.initial_solve(o)
        assert sol.status == ProblemStatus.OPTIMAL, (method, presolve, crash, sol)
        assert abs(sol.objective_value - ref.fun) < 1e-6 * (1 + abs(ref.fun)), (
            method,
            presolve,
            crash,
            sol.objective_value,
            ref.fun,
        )


def test_auto_dualize_tall():
    """AUTOMATIC dualizes very tall LPs (rows >> cols) and maps back."""
    from clp_tpu.utils.generators import random_lp
    from tests.test_mps import _linprog

    model = random_lp(2400, 300, seed=6, density=0.02)
    ref = _linprog(model)
    assert ref.status == 0
    sol = model.initial_solve(SolveOptions())  # AUTOMATIC
    assert sol.status == ProblemStatus.OPTIMAL
    assert abs(sol.objective_value - ref.fun) < 1e-6 * (1 + abs(ref.fun))
    assert sol.primal.size == model.num_cols
    assert sol.duals.size == model.num_rows


def test_auto_idiot_dual_for_wide_unit_lps():
    """doIdiot auto-invocation (ClpSolve.cpp:1276-1726 role): wide
    unit-heavy LPs route to the idiot-crash values-pass dual and reach
    the same optimum; the idiot warm start cuts the iteration count vs
    the cold dual (measured ~1.6x on this class)."""
    import scipy.sparse as sp

    from clp_tpu import INF, Model, ProblemStatus, SolveMethod, SolveOptions
    from clp_tpu.solve import _auto_idiot, _auto_method, _solve_simplex
    from clp_tpu.solve import initial_solve

    rng = np.random.default_rng(3)
    m_, n_, k = 256, 1600, 6
    rows, cols = [], []
    for j in range(n_):
        for i in rng.choice(m_, k, replace=False):
            rows.append(i), cols.append(j)
    A = sp.csr_matrix((np.ones(len(rows)), (rows, cols)),
                      shape=(m_, n_)).tocsc()
    model = Model()
    model.load_problem(A, np.zeros(n_), np.ones(n_), 1.0 + rng.random(n_),
                       np.ones(m_), np.full(m_, INF))
    assert _auto_idiot(model)
    assert _auto_method(model, SolveOptions()) == SolveMethod.DUAL_SIMPLEX

    o = SolveOptions(method=SolveMethod.DUAL_SIMPLEX)
    o.presolve.enabled = False
    cold = _solve_simplex(model.copy(), o, dual=True)
    auto = initial_solve(model, SolveOptions())  # AUTOMATIC: idiot -> dual
    assert auto.status == cold.status == ProblemStatus.OPTIMAL
    assert abs(auto.objective_value - cold.objective_value) < 1e-6 * (
        1 + abs(cold.objective_value))
    assert auto.iterations < cold.iterations  # the idiot point paid off

    # non-unit wide LPs do NOT take the idiot route
    from clp_tpu.utils.generators import random_lp

    assert not _auto_idiot(random_lp(64, 512, seed=1))
