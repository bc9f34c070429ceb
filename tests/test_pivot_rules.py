"""Pivot-rule family: dual/primal Dantzig, steepest, devex, partial, and
Positive Edge (reference: ClpDualRowSteepest, ClpPrimalColumnSteepest modes,
ClpPESimplex.hpp:45). All rules must reach the same optimum; exact steepest
edge and PE additionally exercise their extra BTRAN/PRICE machinery."""

import numpy as np
import pytest

from clp_tpu.forms import to_standard_form
from clp_tpu.simplex import engine
from clp_tpu.utils.generators import random_lp


def _dual(lp, opts):
    st = engine.initial_state(lp, opts)
    st = engine.recompute(lp, st, opts.dual_bound)
    st = engine.make_dual_feasible(lp, st, opts)
    st = engine.dual_solve(lp, st, opts)
    return st


def _primal(lp, opts):
    st = engine.initial_state(lp, opts)
    st = engine.recompute(lp, st, opts.dual_bound)
    st = engine.primal_solve(lp, st, opts)
    return st


def _obj(lp, st):
    xn = np.array(engine.nonbasic_values(lp, st.vstat, engine.SimplexOptions().dual_bound))
    xn[np.asarray(st.basis)] = np.asarray(st.xb)
    return float(np.asarray(lp.c) @ xn)


@pytest.mark.parametrize("seed", [0, 3])
def test_all_rules_reach_same_optimum(seed):
    model = random_lp(40, 70, seed=seed)
    lp, _ = to_standard_form(model)
    objs = []
    for dp in ("steepest", "dantzig", "pe"):
        st = _dual(lp, engine.SimplexOptions(dual_pivot=dp))
        assert int(st.status) == engine.OPTIMAL, dp
        objs.append(_obj(lp, st))
    for pp in ("devex", "dantzig", "steepest", "partial", "pe"):
        st = _primal(lp, engine.SimplexOptions(primal_pivot=pp))
        assert int(st.status) == engine.OPTIMAL, pp
        objs.append(_obj(lp, st))
    ref = objs[0]
    assert all(abs(o - ref) < 1e-7 * (1 + abs(ref)) for o in objs), objs


def test_steepest_edge_weights_stay_bounded():
    """Forrest-Goldfarb primal weights keep gamma_j >= 1 + eta^2 > 1."""
    model = random_lp(30, 55, seed=9)
    lp, _ = to_standard_form(model)
    st = _primal(lp, engine.SimplexOptions(primal_pivot="steepest"))
    assert int(st.status) == engine.OPTIMAL
    assert float(np.asarray(st.wcol).min()) >= 1.0 - 1e-12


def test_pe_on_degenerate_transport():
    """PE stays correct on a massively tied/degenerate transportation LP."""
    import scipy.sparse as sp

    from clp_tpu.model import Model

    rng = np.random.default_rng(5)
    S, D = 8, 8
    n = S * D
    A = np.zeros((S + D, n))
    for i in range(S):
        for j in range(D):
            A[i, i * D + j] = 1.0
            A[S + j, i * D + j] = -1.0
    b = np.concatenate([np.full(S, 5.0), np.full(D, -5.0)])
    cost = np.repeat(rng.integers(1, 4, S).astype(float), D)
    m = Model()
    m.load_problem(sp.csc_matrix(A), np.zeros(n), np.full(n, 5.0), cost,
                   row_lower=b, row_upper=b)
    lp, _ = to_standard_form(m)
    ref = None
    for piv in ("devex", "pe"):
        st = _primal(lp, engine.SimplexOptions(primal_pivot=piv))
        assert int(st.status) == engine.OPTIMAL
        o = _obj(lp, st)
        ref = o if ref is None else ref
        assert abs(o - ref) < 1e-8
    for piv in ("steepest", "pe"):
        st = _dual(lp, engine.SimplexOptions(dual_pivot=piv))
        assert int(st.status) == engine.OPTIMAL
        assert abs(_obj(lp, st) - ref) < 1e-8


def test_partial_pricing_small_window():
    """A tiny window forces many fallback-free partial selections."""
    model = random_lp(25, 120, seed=2)
    lp, _ = to_standard_form(model)
    st = _primal(lp, engine.SimplexOptions(primal_pivot="partial", partial_window=16))
    assert int(st.status) == engine.OPTIMAL
    ref = _primal(lp, engine.SimplexOptions(primal_pivot="devex"))
    assert abs(_obj(lp, st) - _obj(lp, ref)) < 1e-7 * (1 + abs(_obj(lp, ref)))


def test_cli_pivot_param_spellings():
    from clp_tpu.params import apply as apply_param

    class _CLI:
        def __init__(self):
            from clp_tpu.options import SolveOptions

            self.options = SolveOptions()

    cli = _CLI()
    apply_param(cli, "primalpivot", "pesteepest")
    assert cli.options.primal_pivot == "pesteepest"
    apply_param(cli, "dualpivot", "pesteepest")
    assert cli.options.dual_pivot == "pesteepest"
    apply_param(cli, "primalpivot", "partial")
    assert cli.options.primal_pivot == "partial"

    from clp_tpu.simplex.driver import _DUAL_PIVOT_MAP, _PRIMAL_PIVOT_MAP

    assert _PRIMAL_PIVOT_MAP["pesteepest"] == "pe"
    assert _DUAL_PIVOT_MAP["pesteepest"] == "pe"
