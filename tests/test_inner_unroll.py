"""inner_unroll: scan-blocked pivot loops must be bit-identical to the
while-loop protocol.

The engines' pivot bodies freeze every state write once a stop condition
holds (do_pivot gates carrying ~refactor_now and the iteration limit,
round 5), which is what makes over-running a scan block a no-op. These
tests pin that contract: same pivot count, same objective, same basis —
for both inverse dtypes, both engines, and a refactor frequency that does
NOT divide the unroll length (so blocks straddle chunk boundaries).
"""

import dataclasses

import numpy as np
import pytest

from clp_tpu.forms import to_standard_form
from clp_tpu.simplex import engine
from clp_tpu.utils.generators import random_lp, staircase_lp


def _solve(lp, opts):
    st = engine.initial_state(lp, opts)
    st = engine.recompute(lp, st, opts.dual_bound)
    st = engine.make_dual_feasible(lp, st, opts)
    st = engine.dual_solve(lp, st, opts)
    c = np.asarray(lp.c)
    xn = np.asarray(engine.nonbasic_values(lp, st.vstat, opts.dual_bound))
    obj = float(c[np.asarray(st.basis)] @ np.asarray(st.xb) + c @ xn)
    return st, obj


@pytest.mark.parametrize("inv", ["float64", "float32"])
@pytest.mark.parametrize("freq", [40, 37])  # 37 does not divide unroll
def test_dual_unroll_matches_while(inv, freq):
    model = staircase_lp(nblocks=4, bm=16, bn=36, seed=2)
    lp, _ = to_standard_form(model)
    base = engine.SimplexOptions(
        max_iterations=20000, refactor_frequency=freq,
        inverse_dtype=inv, dual_ratio="bfrt")
    st1, obj1 = _solve(lp, base)
    st8, obj8 = _solve(lp, dataclasses.replace(base, inner_unroll=8))
    assert int(st1.status) == engine.OPTIMAL
    assert int(st8.status) == engine.OPTIMAL
    assert int(st8.iterations) == int(st1.iterations)
    assert obj8 == pytest.approx(obj1, rel=1e-9)
    np.testing.assert_array_equal(np.asarray(st8.basis), np.asarray(st1.basis))


def test_dual_unroll_iteration_limit_exact():
    # the limit gate inside do_pivot must stop the count at EXACTLY
    # max_iterations even when a scan block straddles it
    model = random_lp(24, 44, seed=5, density=0.4)
    lp, _ = to_standard_form(model)
    opts = engine.SimplexOptions(
        max_iterations=7, refactor_frequency=40, dual_ratio="bfrt",
        inner_unroll=8)
    st, _ = _solve(lp, opts)
    assert int(st.iterations) <= 7


def test_primal_unroll_matches_while():
    model = random_lp(32, 60, seed=4, density=0.35)
    lp, _ = to_standard_form(model)
    base = engine.SimplexOptions(
        max_iterations=20000, refactor_frequency=40)
    def run(o):
        st = engine.initial_state(lp, o)
        st = engine.recompute(lp, st, o.dual_bound)
        st = engine.primal_solve(lp, st, o)
        return st
    st1 = run(base)
    st8 = run(dataclasses.replace(base, inner_unroll=8))
    assert int(st1.status) == int(st8.status)
    assert int(st1.iterations) == int(st8.iterations)
    np.testing.assert_array_equal(np.asarray(st8.basis), np.asarray(st1.basis))
