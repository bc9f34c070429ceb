import numpy as np, time
from clp_tpu.utils.generators import random_lp
from clp_tpu.forms import to_standard_form
from clp_tpu.simplex import engine

model = random_lp(1024, 1792, seed=0, density=0.05)
lp, _ = to_standard_form(model)
opts = engine.SimplexOptions(max_iterations=60000, use_pallas_price=True,
                             inverse_dtype="float32")
st = engine.initial_state(lp, opts)
st = engine.recompute(lp, st, opts.dual_bound)
st = engine.make_dual_feasible(lp, st, opts)
t0 = time.time()
st, verified, obj = engine.dual_chunk(lp, st, opts)
it1 = int(st.iterations)
print(f"chunk1 (compile): iters={it1} status={int(st.status)} {time.time()-t0:.1f}s")
t0 = time.time()
for k in range(5):
    st, verified, obj = engine.dual_chunk(lp, st, opts)
it = int(st.iterations)
dt = time.time() - t0
print(f"5 chunks: iters={it-it1} in {dt:.2f}s = {(it-it1)/dt:.1f} pivots/s status={int(st.status)}")
