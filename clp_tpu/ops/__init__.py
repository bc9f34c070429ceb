"""Device compute kernels (XLA + Pallas).

The reference implements these layers as hand-tuned AVX2 C++
(CoinAbcHelperFunctions.hpp:313-518) and blocked C (ClpCholeskyDense.hpp).
Here the default lowering is XLA (which tiles dense matmul/cholesky onto the
MXU already); Pallas kernels live beside it for the ops XLA fuses poorly
(fused simplex pivot updates, masked pricing reductions).
"""

from .linalg import chol_factor_reg, chol_solve, lu_refactor, solve_refined  # noqa: F401
