"""Decompose the batched dual-simplex wall at b=256 (VERDICT r4 #5).

Where do the seconds go at 32x48 b=256: device dispatches (count x RPC +
device time), host repack, warm-state build, per-instance fallbacks, or
extraction? Instruments solve_batch_dual_simplex's phases via simple
monkey-patch timers, then reports a 10k-sweep extrapolation.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main():
    import jax

    import clp_tpu  # noqa: F401
    from clp_tpu.constants import ProblemStatus, SolveMethod
    from clp_tpu.options import SolveOptions
    from clp_tpu.parallel import batch
    from clp_tpu.utils.generators import random_lp

    B, M, N = 256, 32, 48
    base = random_lp(M, N, seed=4)
    rng = np.random.default_rng(3)
    models = []
    for _ in range(B):
        m = base.copy()
        shift = np.abs(rng.uniform(0, 0.05, m.num_rows))
        m.row_lower = np.where(m.row_lower > -1e29, m.row_lower - shift,
                               m.row_lower)
        m.row_upper = np.where(m.row_upper < 1e29, m.row_upper + shift,
                               m.row_upper)
        models.append(m)
    opts = SolveOptions(method=SolveMethod.DUAL_SIMPLEX)
    opts.presolve.enabled = False

    # instrument the dispatch loop
    stats = {"dispatches": 0, "brounds_s": 0.0, "repack_s": 0.0,
             "retire_s": 0.0}
    orig_brounds = batch._brounds

    def timed_brounds(lp, st, o, rounds):
        t0 = time.perf_counter()
        out = orig_brounds(lp, st, o, rounds)
        # force completion: status fetch is 4B
        _ = np.asarray(out[0].status[:1])
        stats["dispatches"] += 1
        stats["brounds_s"] += time.perf_counter() - t0
        return out

    batch._brounds = timed_brounds

    for attempt in ("compile", "timed"):
        for k in stats:
            stats[k] = 0 if k == "dispatches" else 0.0
        t0 = time.perf_counter()
        sols = batch.solve_batch_dual_simplex(models, opts)
        wall = time.perf_counter() - t0
        ok = sum(s.status == ProblemStatus.OPTIMAL for s in sols)
        print(f"{attempt}: wall={wall:.2f}s  inst/s={B / wall:.1f}  "
              f"optimal={ok}/{B}  dispatches={stats['dispatches']}  "
              f"brounds={stats['brounds_s']:.2f}s  "
              f"other={wall - stats['brounds_s']:.2f}s", flush=True)

    # 10k-sweep estimate from the timed pass: ceil(10000/B) batches at the
    # steady-state batch wall (programs stay compiled across batches)
    per_batch = wall
    sweeps = -(-10000 // B)
    print(f"10k-sweep extrapolation: {sweeps} batches x {per_batch:.2f}s "
          f"= {sweeps * per_batch:.1f}s  ({10000 / (sweeps * per_batch):.1f} "
          f"inst/s aggregate)", flush=True)


if __name__ == "__main__":
    main()
