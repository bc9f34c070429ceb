"""Network matrix + spanning-tree basis (ClpNetworkMatrix / ClpNetworkBasis).

The network simplex keeps the basis as a spanning tree — no factorization
at all — and the dense engines switch to multiply-free +-1 PRICE/FTRAN
kernels (SimplexOptions.price_mode="pm1") on qualifying matrices.
"""

import numpy as np
import pytest
import scipy.optimize as so
import scipy.sparse as sp

from clp_tpu.constants import ProblemStatus, SolveMethod
from clp_tpu.model import Model
from clp_tpu.network import network_form, network_simplex, solve_network
from clp_tpu.options import SolveOptions
from clp_tpu.solve import initial_solve


def make_mcf(nn, na, seed, cap=30.0, supply=5, ranges=False):
    """Random connected min-cost-flow Model (ring + random arcs)."""
    rng = np.random.default_rng(seed)
    A = np.zeros((nn, na))
    for j in range(na):
        t, h = rng.choice(nn, 2, replace=False)
        A[h, j] = 1.0
        A[t, j] = -1.0
    cols = [A]
    for i in range(nn):
        col = np.zeros((nn, 1))
        col[(i + 1) % nn, 0] = 1.0
        col[i, 0] = -1.0
        cols.append(col)
    A = np.hstack(cols)
    natot = A.shape[1]
    cost = rng.integers(1, 9, natot).astype(float)
    b = rng.integers(-supply, supply + 1, nn).astype(float)
    b[-1] = -b[:-1].sum()
    rl, ru = b.copy(), b.copy()
    if ranges:
        rl -= (rng.random(nn) < 0.3) * 2.0
        ru += (rng.random(nn) < 0.3) * 2.0
    m = Model()
    m.load_problem(sp.csc_matrix(A), np.zeros(natot), np.full(natot, cap),
                   cost, row_lower=rl, row_upper=ru)
    return m, A, cost, rl, ru, natot


@pytest.mark.parametrize("seed", range(4))
def test_network_simplex_matches_highs(seed):
    m, A, cost, rl, ru, natot = make_mcf(18, 50, seed)
    sol = solve_network(m)
    ref = so.linprog(cost, A_eq=A, b_eq=rl, bounds=[(0, 30)] * natot,
                     method="highs")
    assert (sol.status == ProblemStatus.OPTIMAL) == (ref.status == 0)
    if ref.status == 0:
        assert abs(sol.objective_value - ref.fun) < 1e-7 * (1 + abs(ref.fun))
        # complementary slackness on arcs
        x, dj = sol.primal, sol.reduced_costs
        assert np.all((x <= 1e-7) | (dj <= 1e-6))
        assert np.all((x >= 30 - 1e-7) | (dj >= -1e-6))


def test_network_ranges_and_maximize():
    m, A, cost, rl, ru, natot = make_mcf(25, 80, 7, cap=50.0, ranges=True)
    sol = solve_network(m)
    ref = so.linprog(cost, A_ub=np.vstack([A, -A]),
                     b_ub=np.concatenate([ru, -rl]),
                     bounds=[(0, 50)] * natot, method="highs")
    assert sol.status == ProblemStatus.OPTIMAL and ref.status == 0
    assert abs(sol.objective_value - ref.fun) < 1e-7 * (1 + abs(ref.fun))
    m.optimization_direction = -1.0
    sol2 = solve_network(m)
    ref2 = so.linprog(-cost, A_ub=np.vstack([A, -A]),
                      b_ub=np.concatenate([ru, -rl]),
                      bounds=[(0, 50)] * natot, method="highs")
    assert abs(sol2.objective_value - (-ref2.fun)) < 1e-7 * (1 + abs(ref2.fun))


def test_network_infeasible_and_unbounded():
    A = np.zeros((2, 1))
    A[0, 0], A[1, 0] = 1.0, -1.0
    m = Model()
    m.load_problem(sp.csc_matrix(A), np.zeros(1), np.full(1, 2.0), np.ones(1),
                   row_lower=np.array([5.0, -5.0]), row_upper=np.array([5.0, -5.0]))
    assert solve_network(m).status == ProblemStatus.PRIMAL_INFEASIBLE

    A = np.zeros((2, 2))
    A[0, 0], A[1, 0] = 1.0, -1.0
    A[1, 1], A[0, 1] = 1.0, -1.0  # 2-cycle, both arcs negative cost, no caps
    m = Model()
    m.load_problem(sp.csc_matrix(A), np.zeros(2), np.full(2, np.inf),
                   np.array([-1.0, -1.0]), row_lower=np.zeros(2),
                   row_upper=np.zeros(2))
    sol = solve_network(m)
    assert sol.status == ProblemStatus.DUAL_INFEASIBLE
    assert sol.unbounded_ray is not None


def test_auto_method_routes_networks():
    m, A, cost, rl, ru, natot = make_mcf(15, 40, 3)
    assert m.detect_structure()["network"]
    sol = initial_solve(m, SolveOptions())
    ref = so.linprog(cost, A_eq=A, b_eq=rl, bounds=[(0, 30)] * natot,
                     method="highs")
    assert sol.status == ProblemStatus.OPTIMAL
    assert abs(sol.objective_value - ref.fun) < 1e-6 * (1 + abs(ref.fun))


def test_explicit_network_method():
    m, A, cost, rl, ru, natot = make_mcf(12, 30, 5)
    sol = initial_solve(m, SolveOptions(method=SolveMethod.NETWORK))
    ref = so.linprog(cost, A_eq=A, b_eq=rl, bounds=[(0, 30)] * natot,
                     method="highs")
    assert sol.status == ProblemStatus.OPTIMAL
    assert abs(sol.objective_value - ref.fun) < 1e-6 * (1 + abs(ref.fun))


def test_network_form_rejects_general_matrices():
    m = Model()
    A = sp.csc_matrix(np.array([[2.0, 1.0], [0.0, -1.0]]))
    m.load_problem(A, np.zeros(2), np.ones(2), np.ones(2),
                   row_lower=-np.ones(2), row_upper=np.ones(2))
    assert network_form(m) is None
    with pytest.raises(ValueError):
        solve_network(m)


def test_pm1_price_mode_matches_dense():
    """The engines' multiply-free kernels agree with the dense contraction."""
    from clp_tpu.forms import to_standard_form
    from clp_tpu.simplex import engine

    m, A, cost, rl, ru, natot = make_mcf(14, 40, 0)
    lp, _ = to_standard_form(m)
    results = {}
    for mode in ("dense", "pm1"):
        opts = engine.SimplexOptions(price_mode=mode)
        st = engine.initial_state(lp, opts)
        st = engine.recompute(lp, st, opts.dual_bound)
        st = engine.make_dual_feasible(lp, st, opts)
        st = engine.dual_solve(lp, st, opts)
        xn = np.array(engine.nonbasic_values(lp, st.vstat, opts.dual_bound))
        xn[np.asarray(st.basis)] = np.asarray(st.xb)
        results[mode] = (int(st.status), float(np.asarray(lp.c) @ xn))
    assert results["dense"][0] == results["pm1"][0] == engine.OPTIMAL
    assert abs(results["dense"][1] - results["pm1"][1]) < 1e-8

    # primal engine too
    for mode in ("dense", "pm1"):
        opts = engine.SimplexOptions(price_mode=mode)
        st = engine.initial_state(lp, opts)
        st = engine.recompute(lp, st, opts.dual_bound)
        st = engine.primal_solve(lp, st, opts)
        xn = np.array(engine.nonbasic_values(lp, st.vstat, opts.dual_bound))
        xn[np.asarray(st.basis)] = np.asarray(st.xb)
        assert int(st.status) == engine.OPTIMAL
        assert abs(float(np.asarray(lp.c) @ xn) - results["dense"][1]) < 1e-8


def test_driver_auto_pm1(monkeypatch):
    """simplex_solve flips to pm1 kernels automatically on +-1 models."""
    from clp_tpu.simplex import driver as drv

    m, A, cost, rl, ru, natot = make_mcf(10, 24, 2)
    assert drv._pm1_eligible(m)
    sol = drv.simplex_solve(m, SolveOptions(), dual=True)
    assert sol.status == ProblemStatus.OPTIMAL
    ref = so.linprog(cost, A_eq=A, b_eq=rl, bounds=[(0, 30)] * natot,
                     method="highs")
    assert abs(sol.objective_value - ref.fun) < 1e-6 * (1 + abs(ref.fun))


def test_spanning_tree_basis_is_factorization_free():
    """iters/s advantage: the tree basis does no LU and each pivot is
    O(cycle); make sure a mid-size instance stays fast and exact."""
    import time

    m, A, cost, rl, ru, natot = make_mcf(200, 800, 11, cap=40.0)
    t0 = time.time()
    sol = solve_network(m)
    wall = time.time() - t0
    assert sol.status == ProblemStatus.OPTIMAL
    ref = so.linprog(cost, A_eq=A, b_eq=rl, bounds=[(0, 40)] * natot,
                     method="highs")
    assert abs(sol.objective_value - ref.fun) < 1e-7 * (1 + abs(ref.fun))
    assert sol.iterations > 0
    assert wall < 30.0  # hundreds of pivots, no factorization anywhere
