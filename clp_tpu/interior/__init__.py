"""Interior-point solvers (the barrier path).

TPU-native rebuild of ClpInterior + ClpPredictorCorrector
(ClpInterior.hpp:71, ClpPredictorCorrector.cpp:75): a Mehrotra
predictor-corrector on the dense normal equations, with the per-iteration
A·D·A' assembly and Cholesky running on the MXU, fully jittable and
batchable over scenario axes.
"""

from .mehrotra import IPMOptions, IPMResult, ipm_solve, ipm_solve_jit  # noqa: F401
