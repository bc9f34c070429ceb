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
