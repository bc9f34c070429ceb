"""Disaster handler (ClpDisasterHandler, ClpSimplex.hpp:992-1001):
a pluggable catastrophic-recovery callback invoked only after the
driver's built-in escalation chain (algorithm switch -> full-f64 ->
perturbation) has failed. Here the engine is poisoned on purpose so
the hook fires, and the handler's recovery retry — on the healed
engine — finishes the solve."""

import sys as _sys, pathlib as _pathlib

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import dataclasses

import jax.numpy as jnp

from clp_tpu import ProblemStatus, SolveMethod, SolveOptions
from clp_tpu.events import DisasterHandler
from clp_tpu.simplex import driver as drv, engine as eng
from clp_tpu.utils.generators import random_lp

healed = {"flag": False}
real_dual, real_primal = drv.dual_solve, drv.primal_solve


def poisoned(real):
    def f(lp, state, opts):
        if healed["flag"]:
            return real(lp, state, opts)
        return dataclasses.replace(
            state, status=jnp.asarray(eng.NUMERICAL, jnp.int32))
    return f


drv.dual_solve, drv.primal_solve = poisoned(real_dual), poisoned(real_primal)


class Recovery(DisasterHandler):
    def save_info(self, snapshot):
        print(f"disaster snapshot: {snapshot.algorithm} engine, "
              f"status {snapshot.status}, {snapshot.iterations} its")

    def check(self, snapshot):
        healed["flag"] = True  # "fix" the environment for the retry
        snapshot.retry_options["refactor_frequency"] = 50
        return True  # type_of_disaster() defaults to 0 = recoverable


model = random_lp(15, 24, seed=4)
model.disaster_handler = Recovery()
sol = model.initial_solve(SolveOptions(method=SolveMethod.DUAL_SIMPLEX))
drv.dual_solve, drv.primal_solve = real_dual, real_primal
print(f"after recovery: {sol.status.name} obj={sol.objective_value:.8g}")
assert sol.status == ProblemStatus.OPTIMAL
