"""Revised simplex engines (dual and primal), TPU-native.

Rebuild of the reference's simplex family (ClpSimplex/ClpSimplexDual/
ClpSimplexPrimal, SURVEY.md §3.2-3.3) as fixed-shape jitted device programs:

  - basis factorization: explicit dense inverse, rank-1 product-form update
    per pivot (outer product on MXU/VPU), from-scratch LU refactorization
    every `refactor_frequency` pivots — replaces CoinFactorization /
    CoinAbc LU + Forrest-Tomlin (ClpFactorization.hpp:34).
  - pricing: masked vectorized reductions (argmax over rows/columns) —
    replaces pivot-rule plugin classes and ABOCA_LITE threaded chunking.
  - ratio tests: Harris two-pass as masked two-phase reductions
    (ClpSimplexDual.cpp:3665 dualColumn0, ClpSimplexPrimal.cpp:1877).
  - dual phase-1: fake bounds on infinite-bound nonbasics
    (ClpSimplexDual.cpp:143-158 dualBound_ semantics).
"""

from .driver import simplex_solve  # noqa: F401
