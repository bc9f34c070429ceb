"""Network LP via the spanning-tree simplex (examples/network.cpp):
a min-cost-flow instance is detected as a network and solved without any
factorization (ClpNetworkMatrix / ClpNetworkBasis role)."""

import sys as _sys, pathlib as _pathlib

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import scipy.sparse as sp

from clp_tpu import Model, SolveOptions, SolveMethod, INF

# 5-node min-cost flow: node-arc incidence (+1 tail, -1 head)
arcs = [(0, 1, 4.0), (0, 2, 2.0), (1, 2, 1.0), (1, 3, 5.0), (2, 3, 8.0),
        (2, 4, 10.0), (3, 4, 6.0)]
n_nodes, n_arcs = 5, len(arcs)
A = np.zeros((n_nodes, n_arcs))
cost = np.zeros(n_arcs)
for j, (t, h, c) in enumerate(arcs):
    A[t, j] = 1.0
    A[h, j] = -1.0
    cost[j] = c
supply = np.array([10.0, 0.0, 0.0, 0.0, -10.0])  # 10 units from node 0 to 4

m = Model()
m.load_problem(sp.csc_matrix(A), col_lower=np.zeros(n_arcs),
               col_upper=np.full(n_arcs, 8.0), objective=cost,
               row_lower=supply, row_upper=supply)
print("structure:", m.detect_structure())
sol = m.initial_solve(SolveOptions(method=SolveMethod.NETWORK))
print(f"{sol.status.name}: min cost {sol.objective_value:.6g}, "
      f"flows {np.round(sol.primal, 6)}")
assert sol.status.name == "OPTIMAL"
