"""Per-pivot ablation harness for the dual simplex on hardware.

Productionizes the round-4 _probe_freq.py experiment (VERDICT r4 #1):
measures steady-state pivot rate, iteration count, and wall to verified
optimal on the bench instances under engine-option toggles, so kernel /
ratio-test / cadence decisions are driven by measured numbers on the
attached chip rather than guesses.

Usage:
    python tools/ablate_pivot.py [instance] [variant ...]
    instance: staircase (default) | random
    variants (default: all):
      base          bench config (pallas PRICE, bfrt K=256, topk)
      pallas_pivot  + fused FTRAN+rank-1 Pallas kernel
      k64 / k128    bfrt_topk = 64 / 128
      approx        bfrt_select = approx_min_k
      freq400/800/1600  refactor cadence sweep
      harris        short-step ratio test (long-step value check)

Each variant prints: rate (timed pivots/s, chunks after the first),
total iterations, verified flag, objective.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def run_variant(lp, opts, label, budget_s=240.0):
    """Packed protocol: ONE device fetch per chunk (engine round-5)."""
    from clp_tpu.simplex import engine

    st = engine.initial_state(lp, opts)
    st = engine.recompute(lp, st, opts.dual_bound)
    st = engine.make_dual_feasible(lp, st, opts)
    st, info = engine.dual_chunk_packed(lp, st, opts)  # compile pass
    ih = np.asarray(info)
    it1 = int(ih[1])
    t0 = time.perf_counter()
    timed = 0
    while not bool(ih[2]) and int(ih[0]) in (engine.CONTINUE, engine.OPTIMAL):
        before = int(ih[1])
        st, info = engine.dual_chunk_packed(lp, st, opts)
        ih = np.asarray(info)
        timed += int(ih[1]) - before
        if time.perf_counter() - t0 > budget_s:
            break
    dt = time.perf_counter() - t0
    rate = timed / max(dt, 1e-9)
    print(
        f"{label:14s} rate={rate:7.1f}/s iters={int(ih[1]):6d} "
        f"(first {it1}) verified={bool(ih[2])} status={int(ih[0])} "
        f"obj={float(ih[3]):.8g} wall={dt:.2f}s",
        flush=True,
    )
    return rate, int(ih[1]), bool(ih[2])


def main():
    import dataclasses

    import jax

    from clp_tpu.forms import to_standard_form
    from clp_tpu.simplex import engine
    from clp_tpu.utils.generators import random_lp, staircase_lp

    args = sys.argv[1:]
    inst = args[0] if args and args[0] in ("staircase", "random") else "staircase"
    wanted = [a for a in args if a not in ("staircase", "random")]

    if inst == "random":
        model = random_lp(1024, 1792, seed=0, density=0.05)
    else:
        model = staircase_lp(nblocks=16, bm=128, bn=288, seed=0)
    lp, _ = to_standard_form(model)
    m = model.num_rows
    on_tpu = jax.default_backend() == "tpu"
    base = engine.SimplexOptions(
        max_iterations=100000,
        refactor_frequency=(400 if m <= 1536 else 800) if on_tpu else 100,
        use_pallas_price=on_tpu,
        inverse_dtype="float32" if on_tpu else "float64",
        dual_ratio="bfrt",
    )
    variants = {
        "base": base,
        "pallas_pivot": dataclasses.replace(base, use_pallas_pivot=True),
        "k64": dataclasses.replace(base, bfrt_topk=64),
        "k128": dataclasses.replace(base, bfrt_topk=128),
        "approx": dataclasses.replace(base, bfrt_select="approx"),
        "approx_pp": dataclasses.replace(
            base, bfrt_select="approx", use_pallas_pivot=True),
        "freq400": dataclasses.replace(base, refactor_frequency=400),
        "freq1600": dataclasses.replace(base, refactor_frequency=1600),
        "harris": dataclasses.replace(base, dual_ratio="harris"),
        "u8": dataclasses.replace(base, inner_unroll=8),
        "u16": dataclasses.replace(base, inner_unroll=16),
        "u8f1600": dataclasses.replace(
            base, inner_unroll=8, refactor_frequency=1600),
    }
    if wanted:
        variants = {k: v for k, v in variants.items() if k in wanted}
    print(f"instance={inst} m={model.num_rows} n={model.num_cols} "
          f"nnz={model.matrix.nnz} backend={jax.default_backend()}")
    for label, o in variants.items():
        try:
            run_variant(lp, o, label)
        except Exception as e:
            print(f"{label:14s} ERROR {type(e).__name__}: {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
