import numpy as np, time
from clp_tpu.utils.generators import random_lp
from clp_tpu.forms import to_standard_form
from clp_tpu.simplex import engine

model = random_lp(1024, 1792, seed=0, density=0.05)
lp, _ = to_standard_form(model)
opts = engine.SimplexOptions(max_iterations=120000, inverse_dtype="float32",
                             refactor_frequency=400)
st = engine.initial_state(lp, opts)
st = engine.recompute(lp, st, opts.dual_bound)
st, verified, obj = engine.primal_chunk(lp, st, opts)
t0 = time.time(); it1 = int(st.iterations)
while int(st.status) in (-1, 0) and not bool(verified) and time.time()-t0 < 300:
    st, verified, obj = engine.primal_chunk(lp, st, opts)
dt = time.time()-t0
nit = int(st.iterations) - it1
print(f"primal mixed TPU: status={int(st.status)} verified={bool(verified)} "
      f"iters={int(st.iterations)} obj={float(obj):.8g} rate={nit/max(dt,.01):.0f}/s ({dt:.0f}s)")
