"""Presolve/postsolve round-trip tests: solve with presolve on == off."""

import numpy as np
import pytest
import scipy.sparse as sp

import clp_tpu
from clp_tpu import (
    Model,
    SolveOptions,
    SolveMethod,
    check_kkt,
    INF,
    ProblemStatus,
)
from clp_tpu.utils.generators import random_lp
from tests.test_mps import _linprog


def _with_fixed_and_singletons(seed=0):
    """Random LP plus fixed columns, singleton rows, and an empty row."""
    model = random_lp(8, 12, seed=seed)
    A = model.matrix.tolil()
    m, n = A.shape
    # fixed column
    model.col_lower[3] = model.col_upper[3] = 0.7
    # singleton row constraining column 5
    srow = np.zeros((1, n))
    srow[0, 5] = 2.0
    model.add_rows(sp.csc_matrix(srow), lower=[-INF], upper=[4.0])
    # empty row (feasible)
    model.add_rows(sp.csc_matrix((1, n)), lower=[-1.0], upper=[1.0])
    return model


@pytest.mark.parametrize("method", [SolveMethod.DUAL_SIMPLEX, SolveMethod.BARRIER_NO_CROSS])
@pytest.mark.parametrize("seed", [0, 1])
def test_presolve_matches_no_presolve(method, seed):
    m1 = _with_fixed_and_singletons(seed)
    m2 = m1.copy()

    opts_on = SolveOptions(method=method)
    opts_off = SolveOptions(method=method)
    opts_off.presolve.enabled = False

    s1 = m1.initial_solve(opts_on)
    s2 = m2.initial_solve(opts_off)
    assert s1.status == ProblemStatus.OPTIMAL
    assert s2.status == ProblemStatus.OPTIMAL
    assert abs(s1.objective_value - s2.objective_value) < 1e-6 * (
        1 + abs(s2.objective_value)
    )
    rep = check_kkt(m1)
    assert rep.ok, str(rep)
    # dimensions restored
    assert s1.primal.shape == (m1.num_cols,)
    assert s1.duals.shape == (m1.num_rows,)


def test_presolve_detects_infeasible_bounds():
    model = random_lp(5, 8, seed=2)
    model.col_lower[0] = 2.0
    model.col_upper[0] = 1.0
    sol = model.initial_solve(SolveOptions(method=SolveMethod.DUAL_SIMPLEX))
    assert sol.status == ProblemStatus.PRIMAL_INFEASIBLE


def test_presolve_detects_infeasible_empty_row():
    model = random_lp(5, 8, seed=3)
    model.add_rows(sp.csc_matrix((1, model.num_cols)), lower=[1.0], upper=[2.0])
    sol = model.initial_solve(SolveOptions(method=SolveMethod.DUAL_SIMPLEX))
    assert sol.status == ProblemStatus.PRIMAL_INFEASIBLE


def test_presolve_shrinks():
    from clp_tpu.presolve import presolve
    from clp_tpu.options import PresolveOptions

    model = _with_fixed_and_singletons(1)
    reduced, info = presolve(model, PresolveOptions())
    assert reduced.num_cols < model.num_cols
    assert reduced.num_rows < model.num_rows


def test_postsolve_duals_consistent():
    model = _with_fixed_and_singletons(4)
    ref = _linprog(model)
    sol = model.initial_solve(SolveOptions(method=SolveMethod.DUAL_SIMPLEX))
    assert sol.status == ProblemStatus.OPTIMAL
    assert abs(sol.objective_value - ref.fun) < 1e-6 * (1 + abs(ref.fun))
    rep = check_kkt(model)
    assert rep.ok, str(rep)


def test_doubleton_substitution():
    """Equality doubleton rows get substituted; solution matches & KKT holds."""
    rng = np.random.default_rng(11)
    base = random_lp(8, 12, seed=11)
    # append doubleton equality rows: x0 + 2 x1 = 1.5, 3 x2 - x3 = 0.4
    n = base.num_cols
    r1 = np.zeros((1, n)); r1[0, 0] = 1.0; r1[0, 1] = 2.0
    r2 = np.zeros((1, n)); r2[0, 2] = 3.0; r2[0, 3] = -1.0
    base.add_rows(sp.csc_matrix(np.vstack([r1, r2])), lower=[1.5, 0.4], upper=[1.5, 0.4])

    m_on = base.copy()
    m_off = base.copy()
    o_on = SolveOptions(method=SolveMethod.DUAL_SIMPLEX)
    o_off = SolveOptions(method=SolveMethod.DUAL_SIMPLEX)
    o_off.presolve.enabled = False
    s_on = m_on.initial_solve(o_on)
    s_off = m_off.initial_solve(o_off)
    assert s_on.status == s_off.status == ProblemStatus.OPTIMAL
    assert abs(s_on.objective_value - s_off.objective_value) < 1e-6 * (
        1 + abs(s_off.objective_value)
    )
    rep = check_kkt(m_on)
    assert rep.ok, str(rep)


def test_doubleton_shrinks():
    from clp_tpu.presolve import presolve
    from clp_tpu.options import PresolveOptions

    base = random_lp(6, 10, seed=12)
    n = base.num_cols
    r1 = np.zeros((1, n)); r1[0, 0] = 1.0; r1[0, 5] = -2.0
    base.add_rows(sp.csc_matrix(r1), lower=[0.25], upper=[0.25])
    red, info = presolve(base, PresolveOptions())
    assert red.num_cols <= base.num_cols - 1
    assert red.num_rows <= base.num_rows - 1


def test_duplicate_rows_and_cols():
    """Duplicate rows intersect; duplicate equal-cost columns merge."""
    base = random_lp(7, 9, seed=21)
    # duplicate row 0 with looser bounds; then duplicate col 1 exactly
    base.add_rows(base.matrix[0:1, :], lower=[base.row_lower[0] - 1.0],
                  upper=[base.row_upper[0] + 1.0])
    base.add_columns(base.matrix[:, 1], lower=[base.col_lower[1]],
                     upper=[base.col_upper[1]], objective=[base.objective[1]])
    m_on = base.copy()
    m_off = base.copy()
    o_on = SolveOptions(method=SolveMethod.DUAL_SIMPLEX)
    o_off = SolveOptions(method=SolveMethod.DUAL_SIMPLEX)
    o_off.presolve.enabled = False
    s_on = m_on.initial_solve(o_on)
    s_off = m_off.initial_solve(o_off)
    assert s_on.status == s_off.status == ProblemStatus.OPTIMAL
    assert abs(s_on.objective_value - s_off.objective_value) < 1e-6 * (
        1 + abs(s_off.objective_value)
    )
    rep = check_kkt(m_on)
    assert rep.ok, str(rep)
    # shapes restored
    assert s_on.primal.shape == (base.num_cols,)
    assert s_on.duals.shape == (base.num_rows,)


def test_duplicate_col_shrinks():
    from clp_tpu.presolve import presolve
    from clp_tpu.options import PresolveOptions

    base = random_lp(6, 8, seed=22)
    base.add_columns(base.matrix[:, 0], lower=[base.col_lower[0]],
                     upper=[base.col_upper[0]], objective=[base.objective[0]])
    red, info = presolve(base, PresolveOptions())
    assert red.num_cols <= base.num_cols - 1


def test_duplicate_row_dual_attribution():
    """When the binding bound came from a DROPPED duplicate, the dual must
    land on that row, not the kept one (CoinPresolve dupN_action semantics;
    ADVICE round-1 medium finding)."""
    model = Model()
    A = sp.csc_matrix(np.array([[1.0, 1.0], [1.0, 1.0]]))
    model.load_problem(
        A,
        col_lower=[0.0, 0.0],
        col_upper=[4.0, 4.0],
        objective=[-1.0, -1.0],  # maximize x + y
        row_lower=[-INF, -INF],
        row_upper=[10.0, 5.0],  # row 1 (the duplicate) carries the tight bound
    )
    sol = model.initial_solve(SolveOptions(method=SolveMethod.DUAL_SIMPLEX))
    assert sol.status == ProblemStatus.OPTIMAL
    assert abs(sol.objective_value - (-5.0)) < 1e-7
    # the tight row is row 1: dual lives there, row 0 inactive with zero dual
    assert abs(sol.duals[0]) < 1e-9
    assert abs(sol.duals[1] + 1.0) < 1e-7
    rep = check_kkt(model)
    assert rep.ok, str(rep)


def test_infeasible_ray_postsolve_with_doubleton():
    """Farkas-ray extension through a tape containing a doubleton record
    must not crash (ADVICE round-1 high finding: stale/undefined m_before)."""
    model = Model()
    # x + y = 4 is a doubleton equality (x gets substituted out);
    # the rest is infeasible: y + z >= 10 with y <= 2, z <= 3.
    A = sp.csc_matrix(np.array([
        [1.0, 1.0, 0.0],   # x + y = 4
        [0.0, 1.0, 1.0],   # y + z >= 10
    ]))
    model.load_problem(
        A,
        col_lower=[0.0, 0.0, 0.0],
        col_upper=[10.0, 2.0, 3.0],
        objective=[1.0, 1.0, 1.0],
        row_lower=[4.0, 10.0],
        row_upper=[4.0, INF],
    )
    sol = model.initial_solve(SolveOptions(method=SolveMethod.DUAL_SIMPLEX))
    assert sol.status == ProblemStatus.PRIMAL_INFEASIBLE
    if sol.infeasibility_ray is not None:
        assert sol.infeasibility_ray.shape == (model.num_rows,)


# ---------------------------------------------------------------------------
# Round-2 transforms: forcing rows, free column singletons, tripleton,
# Q-aware fixed columns (reference: ClpPresolve.cpp:966-1443 transform list)
# ---------------------------------------------------------------------------


def _forcing_model():
    """Row 0 forces both variables: x0 + x1 >= 2 with x in [0,1]^2."""
    A = sp.csc_matrix(np.array([[1.0, 1.0, 0.0], [1.0, 0.0, 1.0]]))
    model = Model()
    model.load_problem(
        A,
        col_lower=[0.0, 0.0, 0.0],
        col_upper=[1.0, 1.0, 5.0],
        objective=[1.0, 2.0, -1.0],
        row_lower=[2.0, -INF],
        row_upper=[INF, 3.0],
    )
    return model


def test_forcing_row_fixes_and_repairs_duals():
    from clp_tpu.presolve import presolve, postsolve, _ForcingRow
    from clp_tpu.options import PresolveOptions

    m = _forcing_model()
    work, info = presolve(m.copy(), PresolveOptions())
    assert any(isinstance(r, _ForcingRow) for r in info.tape)
    s_on = m.copy().initial_solve(SolveOptions(method=SolveMethod.DUAL_SIMPLEX))
    opts_off = SolveOptions(method=SolveMethod.DUAL_SIMPLEX)
    opts_off.presolve.enabled = False
    s_off = m.copy().initial_solve(opts_off)
    assert s_on.status == ProblemStatus.OPTIMAL
    assert abs(s_on.objective_value - s_off.objective_value) < 1e-7
    rep = check_kkt(m, x=s_on.primal, y=s_on.duals, tol=1e-6)
    assert rep.ok, rep


def test_free_singleton_column_removed():
    from clp_tpu.presolve import presolve, postsolve, _FreeSingleton
    from clp_tpu.options import PresolveOptions

    # x2 appears only in the equality row and is free -> substituted out
    A = sp.csc_matrix(np.array([[1.0, 2.0, 1.0], [1.0, -1.0, 0.0]]))
    m = Model()
    m.load_problem(
        A,
        col_lower=[0.0, 0.0, -INF],
        col_upper=[10.0, 10.0, INF],
        objective=[1.0, 1.0, 0.5],
        row_lower=[4.0, -INF],
        row_upper=[4.0, 2.0],
    )
    work, info = presolve(m.copy(), PresolveOptions())
    assert any(isinstance(r, _FreeSingleton) for r in info.tape)
    s_on = m.copy().initial_solve(SolveOptions(method=SolveMethod.DUAL_SIMPLEX))
    opts_off = SolveOptions(method=SolveMethod.DUAL_SIMPLEX)
    opts_off.presolve.enabled = False
    s_off = m.copy().initial_solve(opts_off)
    assert s_on.status == ProblemStatus.OPTIMAL
    assert abs(s_on.objective_value - s_off.objective_value) < 1e-7 * (
        1 + abs(s_off.objective_value)
    )
    rep = check_kkt(m, x=s_on.primal, y=s_on.duals, tol=1e-6)
    assert rep.ok, rep


def test_tripleton_substitution():
    from clp_tpu.presolve import presolve, _Tripleton
    from clp_tpu.options import PresolveOptions

    # equality row with 3 entries; x1 is implied free within wide bounds
    A = sp.csc_matrix(np.array([
        [1.0, 1.0, 1.0, 0.0],
        [2.0, 0.0, 1.0, 1.0],
        [0.0, 3.0, 0.0, 1.0],
    ]))
    m = Model()
    m.load_problem(
        A,
        col_lower=[0.0, -100.0, 0.0, 0.0],
        col_upper=[2.0, 100.0, 2.0, 4.0],
        objective=[1.0, 0.5, 2.0, 1.0],
        row_lower=[3.0, 1.0, -INF],
        row_upper=[3.0, INF, 6.0],
    )
    work, info = presolve(m.copy(), PresolveOptions())
    assert any(isinstance(r, _Tripleton) for r in info.tape)
    assert work.num_cols < m.num_cols
    s_on = m.copy().initial_solve(SolveOptions(method=SolveMethod.DUAL_SIMPLEX))
    opts_off = SolveOptions(method=SolveMethod.DUAL_SIMPLEX)
    opts_off.presolve.enabled = False
    s_off = m.copy().initial_solve(opts_off)
    assert s_on.status == ProblemStatus.OPTIMAL
    assert abs(s_on.objective_value - s_off.objective_value) < 1e-7 * (
        1 + abs(s_off.objective_value)
    )
    rep = check_kkt(m, x=s_on.primal, y=s_on.duals, tol=1e-6)
    assert rep.ok, rep


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_round2_transforms_random_roundtrip(seed):
    """Random LPs with planted structure: presolve on == off + KKT clean."""
    rng = np.random.default_rng(seed)
    model = random_lp(10, 14, seed=seed)
    A = model.matrix.tolil()
    n = model.num_cols
    # plant a free singleton column in a fresh equality row
    row = np.zeros((1, n))
    row[0, rng.integers(n)] = 1.0 + rng.uniform()
    newcol = np.zeros((model.num_rows + 1, 1))
    newcol[-1, 0] = 2.0
    model.add_rows(sp.csc_matrix(row), lower=[1.5], upper=[1.5])
    model.add_columns(sp.csc_matrix(newcol), lower=[-INF], upper=[INF],
                      objective=[0.1])
    s_on = model.copy().initial_solve(SolveOptions(method=SolveMethod.DUAL_SIMPLEX))
    opts_off = SolveOptions(method=SolveMethod.DUAL_SIMPLEX)
    opts_off.presolve.enabled = False
    s_off = model.copy().initial_solve(opts_off)
    assert s_on.status == s_off.status
    if s_on.status == ProblemStatus.OPTIMAL:
        assert abs(s_on.objective_value - s_off.objective_value) < 1e-6 * (
            1 + abs(s_off.objective_value)
        )
        rep = check_kkt(model, x=s_on.primal, y=s_on.duals, tol=1e-6)
        assert rep.ok, rep


def test_qp_presolve_fixed_columns():
    """QP with a fixed column: presolve folds Q terms; barrier matches."""
    rng = np.random.default_rng(0)
    n, mrows = 6, 4
    A = sp.csc_matrix(rng.standard_normal((mrows, n)))
    L = rng.standard_normal((n, n)) * 0.3
    Q = sp.csc_matrix(L @ L.T + np.eye(n))
    cl = np.full(n, -2.0)
    cu = np.full(n, 2.0)
    cl[2] = cu[2] = 0.5  # fixed column interacts with Q
    m = Model()
    m.load_problem(A, col_lower=cl, col_upper=cu,
                   objective=rng.standard_normal(n),
                   row_lower=np.full(mrows, -3.0), row_upper=np.full(mrows, 3.0))
    m.quadratic_objective = Q
    m2 = m.copy()
    opts_on = SolveOptions(method=SolveMethod.BARRIER_NO_CROSS)
    opts_off = SolveOptions(method=SolveMethod.BARRIER_NO_CROSS)
    opts_off.presolve.enabled = False
    s_on = m.initial_solve(opts_on)
    s_off = m2.initial_solve(opts_off)
    assert s_on.status == ProblemStatus.OPTIMAL
    assert s_off.status == ProblemStatus.OPTIMAL
    assert abs(s_on.objective_value - s_off.objective_value) < 1e-5 * (
        1 + abs(s_off.objective_value)
    )


def test_dual_fix_monotone_column():
    """A column whose entries all sit in one-sided rows (monotone) is fixed
    at its cost-preferred bound by _dual_fix_columns (remove_dual parity)."""
    from clp_tpu.presolve import presolve
    from clp_tpu.options import PresolveOptions

    # x0 appears only with a>0 in <=-rows: monotone-down; c0 > 0 -> at lower
    A = sp.csc_matrix(np.array([
        [1.0, 2.0, 0.0],
        [3.0, 0.0, 1.0],
        [0.0, 1.0, 1.0],
    ]))
    m = Model()
    m.load_problem(
        A,
        col_lower=[0.0, 0.0, 0.0],
        col_upper=[10.0, 10.0, 10.0],
        objective=[1.0, -1.0, -2.0],
        row_lower=[-INF, -INF, 1.0],
        row_upper=[4.0, 6.0, 5.0],
    )
    work, info = presolve(m.copy(), PresolveOptions())
    assert work.num_cols < m.num_cols  # x0 fixed at 0 and removed
    s_on = m.copy().initial_solve(SolveOptions(method=SolveMethod.DUAL_SIMPLEX))
    opts_off = SolveOptions(method=SolveMethod.DUAL_SIMPLEX)
    opts_off.presolve.enabled = False
    s_off = m.copy().initial_solve(opts_off)
    assert s_on.status == ProblemStatus.OPTIMAL
    assert abs(s_on.objective_value - s_off.objective_value) < 1e-7 * (
        1 + abs(s_off.objective_value)
    )
    assert abs(s_on.primal[0]) < 1e-9
    rep = check_kkt(m, x=s_on.primal, y=s_on.duals, tol=1e-6)
    assert rep.ok, rep


def test_dual_fix_detects_unbounded():
    """Monotone-down column with c>0?? no: c<0 toward +inf = unbounded."""
    from clp_tpu.presolve import presolve
    from clp_tpu.options import PresolveOptions

    # x0 monotone-UP (entry a<0 in a <=-row), c0 < 0, upper bound infinite
    A = sp.csc_matrix(np.array([[-1.0, 1.0]]))
    m = Model()
    m.load_problem(
        A,
        col_lower=[0.0, 0.0],
        col_upper=[INF, 1.0],
        objective=[-1.0, 1.0],
        row_lower=[-INF],
        row_upper=[4.0],
    )
    work, info = presolve(m.copy(), PresolveOptions())
    assert info.status == ProblemStatus.DUAL_INFEASIBLE


def test_implied_free_general_row_substitution():
    """A 4-entry equality row with an implied-free variable is substituted
    out (implied_free_action/subst parity); solutions match presolve-off."""
    from clp_tpu.presolve import presolve, _Tripleton
    from clp_tpu.options import PresolveOptions

    A = sp.csc_matrix(np.array([
        [1.0, 1.0, 1.0, 1.0, 0.0],
        [2.0, 0.0, 1.0, 0.0, 1.0],
        [0.0, 3.0, 0.0, 1.0, 1.0],
        [1.0, 0.0, 0.0, 2.0, 0.0],
    ]))
    m = Model()
    m.load_problem(
        A,
        col_lower=[0.0, -1000.0, 0.0, 0.0, 0.0],
        col_upper=[2.0, 1000.0, 2.0, 4.0, 3.0],
        objective=[1.0, 0.5, 2.0, 1.0, 0.3],
        row_lower=[3.0, 1.0, -INF, 0.5],
        row_upper=[3.0, INF, 6.0, INF],
    )
    opts = PresolveOptions(tripleton=False)  # force the general-row path
    work, info = presolve(m.copy(), opts)
    assert any(isinstance(r, _Tripleton) and r.col_keep.size >= 3
               for r in info.tape)
    s_on = m.copy().initial_solve(SolveOptions(method=SolveMethod.DUAL_SIMPLEX))
    opts_off = SolveOptions(method=SolveMethod.DUAL_SIMPLEX)
    opts_off.presolve.enabled = False
    s_off = m.copy().initial_solve(opts_off)
    assert s_on.status == ProblemStatus.OPTIMAL
    assert abs(s_on.objective_value - s_off.objective_value) < 1e-7 * (
        1 + abs(s_off.objective_value)
    )
    rep = check_kkt(m, x=s_on.primal, y=s_on.duals, tol=1e-6)
    assert rep.ok, rep


def test_dominated_duplicate_columns():
    """Identical columns with different costs: the costlier one is fixed at
    its lower bound when the cheaper has unlimited headroom."""
    from clp_tpu.presolve import presolve
    from clp_tpu.options import PresolveOptions

    A = sp.csc_matrix(np.array([
        [1.0, 1.0, 2.0],
        [1.0, 1.0, 0.0],
    ]))
    m = Model()
    m.load_problem(
        A,
        col_lower=[0.0, 0.0, 0.0],
        col_upper=[INF, 5.0, 5.0],
        objective=[1.0, 3.0, 1.0],
        row_lower=[2.0, 1.0],
        row_upper=[INF, INF],
    )
    opts = PresolveOptions(dominated_cols=True)
    work, info = presolve(m.copy(), opts)
    assert work.num_cols < m.num_cols  # x1 (costlier duplicate) removed
    o = SolveOptions(method=SolveMethod.DUAL_SIMPLEX)
    o.presolve.dominated_cols = True
    s_on = m.copy().initial_solve(o)
    opts_off = SolveOptions(method=SolveMethod.DUAL_SIMPLEX)
    opts_off.presolve.enabled = False
    s_off = m.copy().initial_solve(opts_off)
    assert s_on.status == ProblemStatus.OPTIMAL
    assert abs(s_on.objective_value - s_off.objective_value) < 1e-7 * (
        1 + abs(s_off.objective_value)
    )
    assert abs(s_on.primal[1]) < 1e-9
    rep = check_kkt(m, x=s_on.primal, y=s_on.duals, tol=1e-6)
    assert rep.ok, rep
