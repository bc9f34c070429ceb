"""Column generation on cutting stock, pricing subproblem solved by fathom."""

import numpy as np
import pytest
import scipy.sparse as sp

import clp_tpu
from clp_tpu import Model, INF, ProblemStatus
from clp_tpu.colgen import column_generation


def test_cutting_stock():
    """Roll width 10; demands: 44x w3, 30x w4, 20x w5. LP relaxation optimum
    of the pattern formulation via delayed column generation."""
    widths = np.array([3.0, 4.0, 5.0])
    demand = np.array([44.0, 30.0, 20.0])
    W = 10.0

    master = Model()
    # initial patterns: single-width patterns
    init = np.diag(np.floor(W / widths))
    master.load_problem(
        sp.csc_matrix(init),
        col_lower=np.zeros(3),
        col_upper=np.full(3, INF),
        objective=np.ones(3),
        row_lower=demand,
        row_upper=np.full(3, INF),
    )

    def pricer(duals):
        """Knapsack: max duals'a s.t. widths'a <= W, a integer >= 0 (fathom)."""
        sub = Model()
        sub.load_problem(
            sp.csc_matrix(widths.reshape(1, -1)),
            col_lower=np.zeros(3),
            col_upper=np.floor(W / widths),
            objective=duals,
            row_lower=[-INF],
            row_upper=[W],
        )
        sub.set_maximize()
        for j in range(3):
            sub.set_integer(j)
        from clp_tpu.mip import fathom

        res = fathom(sub, max_nodes=200)
        if res.status != ProblemStatus.OPTIMAL:
            return []
        if res.objective_value > 1.0 + 1e-7:  # reduced cost 1 - duals'a < 0
            return [(np.round(res.primal), 1.0, 0.0, INF)]
        return []

    sol = column_generation(master, pricer)
    assert sol.status == ProblemStatus.OPTIMAL
    # true LP optimum over ALL feasible patterns is 36.0 (verified by
    # enumerating the 14 patterns and solving directly)
    assert abs(sol.objective_value - 36.0) < 1e-6
