import numpy as np, time
from clp_tpu.utils.generators import random_lp
from clp_tpu.forms import to_standard_form
from clp_tpu.simplex import engine

model = random_lp(2048, 3584, seed=0, density=0.03)
lp, _ = to_standard_form(model)
opts = engine.SimplexOptions(max_iterations=300000, inverse_dtype="float32",
                             use_pallas_price=True, refactor_frequency=400)
st = engine.initial_state(lp, opts)
st = engine.recompute(lp, st, opts.dual_bound)
st = engine.make_dual_feasible(lp, st, opts)
st, verified, obj = engine.dual_chunk(lp, st, opts)
t0 = time.time(); it1 = int(st.iterations)
while int(st.status) in (-1, 0) and not bool(verified) and time.time()-t0 < 500:
    st, verified, obj = engine.dual_chunk(lp, st, opts)
dt = time.time()-t0
nit = int(st.iterations) - it1
print(f"m=2048: status={int(st.status)} verified={bool(verified)} "
      f"iters={int(st.iterations)} obj={float(obj):.8g} rate={nit/max(dt,.01):.0f}/s ({dt:.0f}s)", flush=True)
