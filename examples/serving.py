"""Serving-mode levers: shape bucketing + warm-basis re-solves.

The reference is a one-shot CLI solver; a TPU deployment instead serves
STREAMS of related LPs, where two costs dominate:

  1. XLA compiles one program per (rows, cols) shape — minutes per shape
     through a remote-compile tunnel.  `SolveOptions.shape_bucket` pads
     every model up to bucket multiples with inert padding, so all
     nearby shapes share ONE compiled program (simplex AND barrier
     paths).
  2. Re-solves of perturbed models from a cold basis re-pay the whole
     iteration count.  A basis loaded with `set_basis_status` (or
     `-basisIn`, or Osi `setWarmStart`) warm-starts the next solve
     (reference: statusCopy is dual()'s starting basis,
     ClpModel.hpp:910-914).
"""

import sys as _sys, pathlib as _pathlib

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from clp_tpu import SolveOptions, SolveMethod
from clp_tpu.utils.generators import random_lp

opts = SolveOptions(method=SolveMethod.DUAL_SIMPLEX, shape_bucket=64)

# --- lever 1: odd shapes in one bucket share the compiled program ---
for m_, n_ in [(37, 61), (41, 59)]:  # both pad to (64, 128)
    sol = random_lp(m_, n_, seed=5).initial_solve(opts)
    print(f"{m_}x{n_}: {sol.status.name} obj {sol.objective_value:.8g} "
          f"its {sol.iterations} wall {sol.solve_time:.2f}s")

# --- lever 2: re-solve a perturbed model from the previous basis ---
base = random_lp(37, 61, seed=5)
sol = base.initial_solve(opts)
cs, rs = base.get_basis_status()

perturbed = random_lp(37, 61, seed=5)
perturbed.row_upper = np.where(
    perturbed.row_upper < 1e29, perturbed.row_upper * 1.01, perturbed.row_upper
)
perturbed.set_basis_status(cs, rs)  # pending warm start
warm = perturbed.initial_solve(opts)
print(f"perturbed re-solve: {warm.status.name} obj {warm.objective_value:.8g} "
      f"its {warm.iterations} (cold was {sol.iterations})")
# the warm re-solve should need far fewer pivots than the cold solve; a
# tolerant bound keeps the example robust to seed/platform pricing noise
# (the strict 0-iteration round-trip check lives in tests/test_simplex.py)
assert warm.iterations <= sol.iterations // 2 + 5
