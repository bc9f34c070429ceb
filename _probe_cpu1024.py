import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np, time
from clp_tpu.utils.generators import random_lp
from clp_tpu.forms import to_standard_form
from clp_tpu.simplex import engine

model = random_lp(1024, 1792, seed=0, density=0.05)
lp, _ = to_standard_form(model)
for mode, freq in (("float64", 100), ("float32", 100), ("float32", 200)):
    opts = engine.SimplexOptions(max_iterations=120000, inverse_dtype=mode,
                                 refactor_frequency=freq)
    st = engine.initial_state(lp, opts)
    st = engine.recompute(lp, st, opts.dual_bound)
    st = engine.make_dual_feasible(lp, st, opts)
    t0 = time.time()
    st = engine.dual_solve(lp, st, opts)
    xn = engine.nonbasic_values(lp, st.vstat, opts.dual_bound)
    obj = float(np.take(np.asarray(lp.c), np.asarray(st.basis)) @ np.asarray(st.xb)
                + np.asarray(lp.c) @ np.asarray(xn))
    print(f"{mode} freq={freq}: status={int(st.status)} iters={int(st.iterations)} "
          f"obj={obj:.10g} {time.time()-t0:.0f}s")
