"""Sprint (sifting) and portfolio racing tests."""

import numpy as np
import pytest

import clp_tpu
from clp_tpu import Model, SolveOptions, SolveMethod, ProblemStatus, check_kkt
from clp_tpu.utils.generators import random_lp, transport_lp, infeasible_lp
from tests.test_mps import _linprog


def test_sprint_wide_lp():
    """n >> m LP solved by sprint matches a direct solve."""
    model = random_lp(8, 1200, seed=11, density=0.25)
    ref = _linprog(model)
    sol = model.initial_solve(SolveOptions(method=SolveMethod.SPRINT))
    assert sol.status == ProblemStatus.OPTIMAL
    assert ref.status == 0
    assert abs(sol.objective_value - ref.fun) < 1e-6 * (1 + abs(ref.fun))
    rep = check_kkt(model, tol=1e-5)
    assert rep.ok, str(rep)


def test_sprint_transport():
    model = transport_lp(5, 40, seed=2)  # 45 rows x 200 cols
    ref = _linprog(model)
    sol = model.initial_solve(SolveOptions(method=SolveMethod.SPRINT))
    assert sol.status == ProblemStatus.OPTIMAL
    assert abs(sol.objective_value - ref.fun) < 1e-6 * (1 + abs(ref.fun))


def test_racing_optimal():
    from clp_tpu.parallel.racing import racing_solve

    model = random_lp(10, 15, seed=4)
    ref = _linprog(model)
    sol = racing_solve(model)
    assert sol.status == ProblemStatus.OPTIMAL
    assert abs(sol.objective_value - ref.fun) < 1e-6 * (1 + abs(ref.fun))
    assert hasattr(sol, "winning_config")


def test_racing_infeasible():
    from clp_tpu.parallel.racing import racing_solve

    model = infeasible_lp()
    sol = racing_solve(model)
    assert sol.status == ProblemStatus.PRIMAL_INFEASIBLE
