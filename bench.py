"""Benchmark: scenario-batched IPM throughput on the attached accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures instances/second for a batch of dense LPs solved by the batched
Mehrotra IPM (the headline TPU-native capability, BASELINE.json configs[4]),
and reports vs_baseline as the measured speedup over solving the same
instances one-at-a-time on the same device — i.e. what batching buys on this
hardware (the reference solves strictly one instance per process,
SURVEY.md §2).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import clp_tpu  # noqa: F401  (x64 on)
    from clp_tpu.forms import StandardLP, to_ipm_form
    from clp_tpu.interior.mehrotra import IPMOptions, ipm_solve
    from clp_tpu.utils.generators import random_lp

    B = 64
    M, N = 48, 72
    opts = IPMOptions(tol=1e-8, max_iter=60)

    # perturbed-RHS scenarios of one base instance (same shapes batch-wide)
    base = random_lp(M, N, seed=0)
    rng = np.random.default_rng(1)
    lps = []
    for k in range(B):
        model = base.copy()
        shift = np.abs(rng.uniform(0, 0.05, model.num_rows))
        model.row_lower = np.where(model.row_lower > -1e29, model.row_lower - shift, model.row_lower)
        model.row_upper = np.where(model.row_upper < 1e29, model.row_upper + shift, model.row_upper)
        lp, _ = to_ipm_form(model)
        lps.append(lp)
    batched = StandardLP(
        G=jnp.stack([lp.G for lp in lps]),
        b=jnp.stack([lp.b for lp in lps]),
        c=jnp.stack([lp.c for lp in lps]),
        l=jnp.stack([lp.l for lp in lps]),
        u=jnp.stack([lp.u for lp in lps]),
    )

    solve_batched = jax.jit(jax.vmap(lambda one: ipm_solve(one, opts)))
    solve_one = jax.jit(lambda one: ipm_solve(one, opts))

    # NOTE: block_until_ready is unreliable through the axon tunnel
    # (returns before execution finishes) — force with a host transfer.
    def force(r):
        return np.asarray(r.pobj)

    # warmup/compile
    force(solve_batched(batched))
    force(solve_one(lps[0]))

    # batched timing
    t0 = time.perf_counter()
    reps = 2
    for _ in range(reps):
        res = solve_batched(batched)
        force(res)
    t_batched = (time.perf_counter() - t0) / reps
    throughput = B / t_batched

    # sequential baseline on same device (subset, extrapolated)
    k_seq = 8
    t0 = time.perf_counter()
    for i in range(k_seq):
        force(solve_one(lps[i]))
    t_seq_per = (time.perf_counter() - t0) / k_seq
    seq_throughput = 1.0 / t_seq_per

    conv = int(np.asarray(res.converged).sum())
    assert conv >= B * 9 // 10, f"only {conv}/{B} instances converged"

    print(
        json.dumps(
            {
                "metric": "batched_ipm_instances_per_sec",
                "value": round(throughput, 2),
                "unit": f"LP({M}x{N})/s",
                "vs_baseline": round(throughput / seq_throughput, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
