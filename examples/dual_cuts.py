"""Row generation: solve a relaxation, add back violated rows, resolve warm
(examples/dualCuts.cpp flow).

The reference's dualCuts treats inequality rows as cuts: start from the
equality skeleton, solve, find original rows the solution violates, add the
most-violated ones back, and re-solve warm until no violations remain.
"""

import sys as _sys, pathlib as _pathlib

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import sys

import numpy as np
import scipy.sparse as sp

from clp_tpu import INF, Model, SolveOptions, SolveMethod, ProblemStatus

path = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/examples/modified_afiro.mps"
full = Model()
assert full.read_mps(path) == 0

A = full.matrix.tocsr()
rl, ru = full.row_lower, full.row_upper
is_eq = np.isclose(rl, ru)
print(f"{full.num_rows} rows: {int(is_eq.sum())} equalities kept, "
      f"{int((~is_eq).sum())} inequality cuts start outside")

# relaxation: equality rows only
relax = Model()
relax.load_problem(
    sp.csc_matrix(A[is_eq]),
    col_lower=full.col_lower, col_upper=full.col_upper,
    objective=full.objective, row_lower=rl[is_eq], row_upper=ru[is_eq],
)
relax.optimization_direction = full.optimization_direction
inactive = list(np.flatnonzero(~is_eq))

opts = SolveOptions(method=SolveMethod.DUAL_SIMPLEX)
opts.presolve.enabled = False  # keep the basis mappable across row additions
sol = relax.initial_solve(opts)
rounds = 0
while sol.status == ProblemStatus.OPTIMAL and inactive:
    x = sol.primal
    act = A[inactive] @ x
    viol = np.maximum(act - ru[inactive], rl[inactive] - act)
    worst = np.flatnonzero(viol > 1e-7)
    if worst.size == 0:
        break
    # add the violated cuts (most violated first, up to 5 per round)
    order = worst[np.argsort(-viol[worst])][:5]
    add = [inactive[i] for i in order]
    relax.add_rows(sp.csc_matrix(A[add]), lower=rl[add], upper=ru[add])
    inactive = [r for r in inactive if r not in add]
    rounds += 1
    print(f"round {rounds}: added {len(add)} cuts "
          f"(max violation {viol[order[0]]:.3e}), {len(inactive)} outside")
    sol = relax.initial_solve(opts)

ref = full.initial_solve(SolveOptions(method=SolveMethod.DUAL_SIMPLEX))
print(f"cut loop:  {sol.status.name} obj {sol.objective_value:.10g} "
      f"({rounds} rounds, {relax.num_rows}/{full.num_rows} rows used)")
print(f"full model: {ref.status.name} obj {ref.objective_value:.10g}")
assert abs(sol.objective_value - ref.objective_value) < 1e-6 * (1 + abs(ref.objective_value))
