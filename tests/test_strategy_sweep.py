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


# ---------------------------------------------------------------------------
# doIdiot decision-surface matrix (ClpSolve.cpp:1276-1726): on each family
# where the broadened gate fires, AUTOMATIC must be at least as good as the
# best fixed alternative; on the reference's kill conditions it must not fire
# ---------------------------------------------------------------------------


def _covering(m_, n_, k, seed, data_fn=None, eq=False):
    import scipy.sparse as sp

    from clp_tpu import INF, Model

    rng = np.random.default_rng(seed)
    rows, cols = [], []
    for j in range(n_):
        for i in rng.choice(m_, k, replace=False):
            rows.append(i), cols.append(j)
    data = np.ones(len(rows)) if data_fn is None else data_fn(rng, len(rows))
    A = sp.csr_matrix((data, (rows, cols)), shape=(m_, n_)).tocsc()
    model = Model()
    rl = np.ones(m_)
    ru = np.ones(m_) if eq else np.full(m_, INF)
    model.load_problem(A, np.zeros(n_), np.ones(n_), 1.0 + rng.random(n_),
                       rl, ru)
    return model


IDIOT_FAMILIES = {
    # 0/1 covering: the measured round-3 slot
    "covering": lambda: _covering(256, 1600, 6, 3),
    # unit-coefficient partitioning-like (equality rows)
    "partitioning": lambda: _covering(256, 1600, 6, 7, eq=True),
    # very sparse non-unit integral entries: fires via the
    # numberElements <= 3*numberColumns branch (:1684)
    "sparse_nonunit": lambda: _covering(
        256, 1600, 3, 11,
        data_fn=lambda rng, sz: rng.choice([1.0, 2.0], sz)),
}


@pytest.mark.parametrize("family", sorted(IDIOT_FAMILIES))
def test_auto_idiot_beats_best_fixed(family):
    from clp_tpu.solve import _auto_idiot, _solve_simplex, initial_solve

    make = IDIOT_FAMILIES[family]
    assert _auto_idiot(make()), family

    fixed_iters = {}
    ref_obj = None
    for name, dual in (("dual", True), ("primal", False)):
        o = SolveOptions(
            method=SolveMethod.DUAL_SIMPLEX if dual else SolveMethod.PRIMAL_SIMPLEX
        )
        o.presolve.enabled = False
        sol = _solve_simplex(make(), o, dual=dual)
        assert sol.status == ProblemStatus.OPTIMAL, (family, name)
        fixed_iters[name] = sol.iterations
        ref_obj = sol.objective_value

    auto = initial_solve(make(), SolveOptions())  # AUTOMATIC: idiot -> dual
    assert auto.status == ProblemStatus.OPTIMAL
    assert abs(auto.objective_value - ref_obj) < 1e-6 * (1 + abs(ref_obj))
    best = min(fixed_iters.values())
    # auto >= best-of-fixed: the idiot values-pass start must not lose to
    # either cold engine (small slack for pricing noise)
    assert auto.iterations <= best * 1.05 + 10, (family, auto.iterations, fixed_iters)


def test_auto_idiot_kill_conditions():
    """The reference's doIdiot kill switches (free columns :1622, wild rhs
    range / non-integral rhs :1628-1670) must hold in the broadened gate."""
    from clp_tpu.solve import _auto_idiot

    # wild rhs range (largest/smallest > 10)
    m = _covering(256, 1600, 6, 3)
    rl = np.asarray(m.row_lower).copy()
    rl[::2] = 100.0
    m.row_lower = rl
    assert not _auto_idiot(m)

    # non-integral rhs
    m = _covering(256, 1600, 6, 3)
    rl = np.asarray(m.row_lower).copy()
    rl[0] = 1.5
    m.row_lower = rl
    assert not _auto_idiot(m)

    # free columns
    m = _covering(256, 1600, 6, 3)
    cl = np.asarray(m.col_lower).copy()
    cu = np.asarray(m.col_upper).copy()
    cl[:8], cu[:8] = -1e30, 1e30
    m.col_lower, m.col_upper = cl, cu
    assert not _auto_idiot(m)

    # dense non-unit entries (neither +-1-heavy nor sparse)
    import scipy.sparse as sp

    from clp_tpu import INF, Model

    rng = np.random.default_rng(5)
    A = sp.csc_matrix(rng.uniform(0.2, 3.0, (256, 1600)))
    m = Model()
    m.load_problem(A, np.zeros(1600), np.ones(1600),
                   1.0 + rng.random(1600), np.ones(256), np.full(256, INF))
    assert not _auto_idiot(m)
