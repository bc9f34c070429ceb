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


def test_sprint_unbounded_classified():
    """An unbounded wide LP must be classified DUAL_INFEASIBLE by sprint,
    not claimed OPTIMAL at the fake-bound magnitude (regression: the
    escalation retry accepted an optimum leaning on a fake bound)."""
    import scipy.sparse as sp
    from clp_tpu import INF
    from clp_tpu.sprint import sprint_solve

    m = random_lp(12, 600, seed=5, density=0.1)
    a0 = np.asarray(m.matrix.todense())[:, 0:1]
    m.col_upper = m.col_upper.copy()
    m.col_upper[0] = INF
    m.add_columns(sp.csc_matrix(-a0), lower=[0.0], upper=[INF],
                  objective=[-float(m.objective[0]) - 1.0])
    o = SolveOptions()
    o.presolve.enabled = False
    s = sprint_solve(m, o)
    assert s.status == ProblemStatus.DUAL_INFEASIBLE


def test_race_seeds_on_device_batched():
    """On-device racing: K perturbation-seed variants of one LP in one
    vmapped program; the winner's basis warm-starts a true-cost cleanup
    that verifies at (near-)zero extra iterations."""
    from clp_tpu.parallel.racing import race_seeds
    from clp_tpu.solve import _solve_simplex
    from clp_tpu.utils.generators import random_lp, transport_lp

    for make in (lambda: random_lp(24, 40, seed=3),
                 lambda: transport_lp(5, 6, seed=1)):
        m = make()
        o = SolveOptions(method=SolveMethod.DUAL_SIMPLEX)
        o.presolve.enabled = False
        ref = _solve_simplex(make(), o, dual=True)
        sol = race_seeds(m, o, k=6)
        assert sol.status == ProblemStatus.OPTIMAL
        assert getattr(sol, "winning_config", None) is not None
        assert sol.iterations <= 3  # cleanup from the winning basis
        assert abs(sol.objective_value - ref.objective_value) < 1e-7 * (
            1 + abs(ref.objective_value))


def test_race_seeds_infeasible_falls_back_to_driver():
    from clp_tpu.parallel.racing import race_seeds
    from clp_tpu.utils.generators import infeasible_lp

    m = infeasible_lp()
    o = SolveOptions(method=SolveMethod.DUAL_SIMPLEX)
    o.presolve.enabled = False
    sol = race_seeds(m, o, k=4)
    assert sol.status == ProblemStatus.PRIMAL_INFEASIBLE
