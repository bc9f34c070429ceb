import numpy as np, time
from clp_tpu.utils.generators import random_lp
from clp_tpu.forms import to_standard_form
from clp_tpu.simplex import engine

model = random_lp(1024, 1792, seed=0, density=0.05)
lp, _ = to_standard_form(model)
for freq in (100, 200, 400):
    opts = engine.SimplexOptions(max_iterations=60000, use_pallas_price=True,
                                 inverse_dtype="float32", refactor_frequency=freq)
    st = engine.initial_state(lp, opts)
    st = engine.recompute(lp, st, opts.dual_bound)
    st = engine.make_dual_feasible(lp, st, opts)
    st, verified, obj = engine.dual_chunk(lp, st, opts)
    it1 = int(st.iterations)
    t0 = time.time()
    nit = 0
    while time.time() - t0 < 12 and int(st.status) == -1:
        before = int(st.iterations)
        st, verified, obj = engine.dual_chunk(lp, st, opts)
        nit += int(st.iterations) - before
    dt = time.time() - t0
    print(f"freq={freq}: {nit} pivots in {dt:.2f}s = {nit/dt:.1f}/s status={int(st.status)}")
