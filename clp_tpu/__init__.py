"""clp_tpu — a TPU-native linear/quadratic programming framework.

A from-scratch rebuild of the capability surface of coin-or/Clp
(see SURVEY.md) designed for TPUs: batched dense linear algebra on the MXU
(JAX/XLA/Pallas), fixed-shape jitted solver iterations, and scale-out by
sharding scenario batches and column blocks over `jax.sharding` meshes.

Problem class:  minimize c'x + (1/2) x'Qx
                subject to row_lower <= A x <= row_upper
                           col_lower <=   x <= col_upper

Entry points:
    Model               — problem container (ClpModel equivalent)
    SolveOptions        — solve configuration (ClpSolve equivalent)
    initial_solve       — orchestrated solve (presolve -> method -> postsolve)
    solve_batch         — one-call batched solve of many same-shape LPs
    read_mps/write_mps  — MPS IO

LP solvers need float64: importing this package enables jax x64 mode.
"""

from __future__ import annotations

import os as _os

import jax as _jax

_jax.config.update("jax_enable_x64", True)
# escape hatch: the container's sitecustomize pins the TPU platform before
# env vars can act; CLPTPU_PLATFORM=cpu forces a backend from user code
if _os.environ.get("CLPTPU_PLATFORM"):
    _jax.config.update("jax_platforms", _os.environ["CLPTPU_PLATFORM"])
# persistent compilation cache: opt-in only (CLPTPU_COMPILE_CACHE=<dir>).
# Measured through this environment's TPU tunnel it does not help (AOT
# compiles happen server-side), and cross-machine CPU AOT artifacts trigger
# machine-feature mismatch warnings.
try:
    _cache_dir = _os.environ.get("CLPTPU_COMPILE_CACHE")
    if _cache_dir and _cache_dir != "off":
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:  # cache is an optimization, never a hard requirement
    pass

from .constants import (  # noqa: E402,F401
    INF,
    ProblemStatus,
    SecondaryStatus,
    VariableStatus,
    SolveMethod,
    ScalingMode,
)
from .model import Model, Solution  # noqa: E402,F401
from .options import SolveOptions, PresolveOptions  # noqa: E402,F401
from .io.mps import read_mps, write_mps  # noqa: E402,F401
from .io.lp_format import read_lp, write_lp  # noqa: E402,F401
from .validate import check_kkt, check_objective  # noqa: E402,F401
from .solve import initial_solve, solve_batch  # noqa: E402,F401
from .analysis import ranging, parametrics, dualize, find_iis  # noqa: E402,F401

__version__ = "0.1.0"
