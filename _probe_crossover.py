import os
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS","") + " --xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np, time
from clp_tpu.utils.generators import random_lp
from clp_tpu.options import SolveOptions, PresolveOptions
from clp_tpu.constants import SolveMethod
from clp_tpu.solve import initial_solve

lp = random_lp(300, 500, seed=7)
no_pre = PresolveOptions(enabled=False)
t0 = time.time()
r1 = initial_solve(lp, SolveOptions(method=SolveMethod.BARRIER, presolve=no_pre))
t1 = time.time()
print("barrier+crossover:", r1.status, float(r1.objective_value), "%.1fs" % (t1 - t0), "iters", r1.iterations)
t0 = time.time()
r2 = initial_solve(lp, SolveOptions(method=SolveMethod.DUAL_SIMPLEX, presolve=no_pre))
t1 = time.time()
print("dual direct:      ", r2.status, float(r2.objective_value), "%.1fs" % (t1 - t0), "iters", r2.iterations)
print("obj diff:", abs(float(r1.objective_value) - float(r2.objective_value)))
