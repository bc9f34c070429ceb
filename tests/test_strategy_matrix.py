"""The reference's 12-strategy matrix over structured LP families.

unitTest.cpp:92-180 (setupForSolve) enumerates 12 solve strategies —
barrier, dual/primal with and without crash, automatic with and without,
primal-idiot at several pass counts, dual-volume — and runs the netlib
set under each. Netlib data is not in this environment (zero egress),
so the matrix runs over the generated structured families instead
(staircase, transport/network, GUB blocks, covering), checking every
strategy reaches the same verified optimum. dual-volume (COIN_HAS_VOL
only in the reference) is replaced by the TPU-native PDLP strategy.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from clp_tpu import INF, Model, ProblemStatus, SolveMethod, SolveOptions
from clp_tpu.utils.generators import random_lp, staircase_lp, transport_lp
from tests.test_mps import _linprog


def _strategies():
    """(name, options) pairs mirroring setupForSolve's 12 algorithms."""
    out = []

    def add(name, method, crash="none", **kw):
        o = SolveOptions(method=method, crash=crash, **kw)
        out.append((name, o))

    add("ba", SolveMethod.BARRIER)                      # 0 barrier
    add("du-pdlp", SolveMethod.PDLP)                    # 1 (volume slot)
    add("du-cr", SolveMethod.DUAL_SIMPLEX, "triangular")  # 2 dual-crash
    add("du", SolveMethod.DUAL_SIMPLEX)                 # 3 dual
    add("pr-cr", SolveMethod.PRIMAL_SIMPLEX, "triangular")  # 4 primal-crash
    add("pr", SolveMethod.PRIMAL_SIMPLEX)               # 5 primal
    add("au-cr", SolveMethod.AUTOMATIC, "triangular")   # 6 either-crash
    add("au", SolveMethod.AUTOMATIC)                    # 7 either
    add("pr-id-1", SolveMethod.PRIMAL_IDIOT)            # 8 primal-idiot-1
    add("pr-id-5", SolveMethod.PRIMAL_IDIOT)            # 9 primal-idiot-5
    add("pr-id-70", SolveMethod.PRIMAL_IDIOT)           # 10 primal-idiot-70
    add("du-id", SolveMethod.DUAL_SIMPLEX, "idiot")     # 11 (volume slot)
    return out


def _gub_lp(K=12, per=5, mg=6, seed=0):
    """K GUB sets (sum of each set's columns <= 1) + mg general rows."""
    rng = np.random.default_rng(seed)
    n = K * per
    G = rng.uniform(0.0, 1.0, (mg, n)) * (rng.random((mg, n)) < 0.4)
    set_rows = np.zeros((K, n))
    for k in range(K):
        set_rows[k, k * per:(k + 1) * per] = 1.0
    A = sp.csc_matrix(np.vstack([G, set_rows]))
    m = Model()
    m.load_problem(
        A,
        col_lower=np.zeros(n),
        col_upper=np.full(n, INF),
        objective=rng.uniform(-2.0, -0.1, n),
        row_lower=np.concatenate([np.full(mg, -INF), np.full(K, -INF)]),
        row_upper=np.concatenate([rng.uniform(1.0, 3.0, mg), np.ones(K)]),
    )
    return m


FAMILIES = {
    "staircase": lambda: staircase_lp(nblocks=4, bm=8, bn=14, seed=2),
    "transport": lambda: transport_lp(5, 7, seed=4),
    "gub": lambda: _gub_lp(),
    "covering": lambda: random_lp(24, 40, seed=9),
}


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_twelve_strategy_matrix(family):
    make = FAMILIES[family]
    ref = _linprog(make())
    assert ref.status == 0
    for name, opts in _strategies():
        sol = make().initial_solve(opts)
        assert sol.status == ProblemStatus.OPTIMAL, (family, name, sol.status)
        tol = 2e-4 if name == "du-pdlp" else 1e-6
        assert abs(sol.objective_value - ref.fun) < tol * (1 + abs(ref.fun)), (
            family, name, sol.objective_value, ref.fun,
        )


def test_strategy_matrix_piecewise_family():
    """Piecewise costs own their solve route; the strategy surface still
    must not break the attachment, and the answer must match the
    reformulated LP under the plain strategies."""
    rng = np.random.default_rng(7)
    n, mr = 6, 4
    A = sp.csc_matrix(rng.uniform(-1, 1, (mr, n)))
    b = rng.uniform(1.0, 2.0, mr)

    def base():
        m = Model()
        m.load_problem(A, np.zeros(n), np.full(n, 4.0), np.zeros(n),
                       np.full(mr, -INF), b)
        return m

    # convex piecewise cost on every column: V-shape with a kink at 1.5
    kinks = [0.0, 1.5, 4.0]
    slopes = [-1.0, 2.0]
    m = base()
    for j in range(n):
        m.set_piecewise_cost(j, kinks, slopes)
    sol = m.initial_solve(SolveOptions())
    assert sol.status == ProblemStatus.OPTIMAL

    # reformulation: x_j = u1 + u2, u1 in [0,1.5] cost -1, u2 in [0,2.5] cost 2
    A2 = sp.hstack([A, A], format="csc")
    ref = Model()
    ref.load_problem(
        A2,
        col_lower=np.zeros(2 * n),
        col_upper=np.concatenate([np.full(n, 1.5), np.full(n, 2.5)]),
        objective=np.concatenate([np.full(n, -1.0), np.full(n, 2.0)]),
        row_lower=np.full(mr, -INF),
        row_upper=b,
    )
    for name, opts in [("du", SolveOptions(method=SolveMethod.DUAL_SIMPLEX)),
                       ("pr", SolveOptions(method=SolveMethod.PRIMAL_SIMPLEX))]:
        rsol = ref.copy().initial_solve(opts)
        assert rsol.status == ProblemStatus.OPTIMAL, name
        assert abs(sol.objective_value - rsol.objective_value) < 1e-7 * (
            1 + abs(rsol.objective_value)), name
