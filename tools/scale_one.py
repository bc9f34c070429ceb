"""Solve ONE dfl001-class instance on the chip; print one JSON line.

Run in a SUBPROCESS by bench.bench_scale_evidence: the axon worker
intermittently crashes on 4096+-scale programs (rounds 2-5 infra flake),
and a crashed worker poisons the whole client process — isolation keeps
one instance's crash from sinking the other's measurement.

Uses the packed-chunk protocol (one fetch per 800-pivot chunk) rather
than the single-dispatch solve: the monolithic 4096-scale while_loop
program is precisely what crashes the worker most often this session,
and chunked is how the round-3 71 s result was measured.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp  # noqa: F401

    import clp_tpu  # noqa: F401
    from bench import highs_wall_sparse
    from clp_tpu.forms import to_standard_form
    from clp_tpu.simplex import engine
    from clp_tpu.utils.generators import random_lp, staircase_lp

    which = sys.argv[1]
    if which == "random_4096x7168_d2pct":
        model = random_lp(4096, 7168, seed=0, density=0.02)
        with_highs = False
    elif which == "staircase_6144x7680":
        # 128-row blocks — the same structural class as the 2048 bench
        # staircase. (256x320 blocks were tried first: the raw f32 engine
        # loop ends NUMERICAL at iter ~2400 there; the driver's
        # escalation policies handle that class, but this harness times
        # the bare engine.)
        model = staircase_lp(nblocks=48, bm=128, bn=160, seed=0)
        with_highs = True
    else:
        raise SystemExit(f"unknown instance {which}")

    lp, _ = to_standard_form(model)
    on_tpu = jax.default_backend() == "tpu"
    opts = engine.SimplexOptions(
        max_iterations=200000, refactor_frequency=800,
        use_pallas_price=on_tpu,
        inverse_dtype="float32" if on_tpu else "float64",
        dual_ratio="bfrt",
    )
    st = engine.initial_state(lp, opts)
    st = engine.recompute(lp, st, opts.dual_bound)
    st = engine.make_dual_feasible(lp, st, opts)
    st, info = engine.dual_chunk_packed(lp, st, opts)  # compile pass
    ih = np.asarray(info)
    it1 = int(ih[1])
    t0 = time.perf_counter()
    while not bool(ih[2]) and int(ih[0]) in (engine.CONTINUE, engine.OPTIMAL):
        st, info = engine.dual_chunk_packed(lp, st, opts)
        ih = np.asarray(info)
        if time.perf_counter() - t0 > 1500:
            break
    wall = time.perf_counter() - t0
    status = int(ih[0])
    iters = int(ih[1])
    obj = float(ih[3])
    rate = (iters - it1) / max(wall, 1e-9)
    # full-solve wall estimate puts the compile-overlapped first chunk
    # back at the measured steady rate (HiGHS walls below are full-solve)
    wall_full = iters / max(rate, 1e-9)
    entry = {
        "label": which,
        "m": model.num_rows, "n": model.num_cols,
        "nnz": int(model.matrix.nnz),
        "wall_s_post_compile": round(wall_full, 1),
        "wall_s_timed_region": round(wall, 1),
        "iterations": iters,
        "iterations_timed": iters - it1,
        "pivots_per_s": round(rate, 1),
        "verified": bool(ih[2]) and status == engine.OPTIMAL,
        "objective": obj,
        "protocol": "packed_chunks; rate over chunks 2..end",
    }
    if with_highs:
        hw, ho = highs_wall_sparse(model)
        entry["highs_wall_s_sparse_ranged"] = hw
        entry["objective_agrees_with_highs"] = (
            None if ho is None
            else bool(abs(obj - ho) <= 1e-6 * (1 + abs(ho))))
        entry["speedup_vs_highs"] = (
            None if not hw else round(hw / max(wall_full, 1e-9), 2))
    print("SCALE_JSON " + json.dumps(entry), flush=True)


if __name__ == "__main__":
    main()
