"""Decompose the barrier shape-bucket second-shape latency (VERDICT r4 #3).

BENCH_r04 measured 7.45 s for the SECOND odd shape in a shared bucket —
claimed zero-recompile, so where does the time go? This instruments the
exact _solve_barrier path phase by phase: form building, padding, RCM
probe, the ipm_solve_jit dispatch (trace-cache hit or miss?), and result
extraction, plus the full initial_solve wall for both shapes.
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
    from clp_tpu.utils.generators import random_lp

    opts = SolveOptions(method=SolveMethod.BARRIER_NO_CROSS, shape_bucket=64)
    opts.presolve.enabled = False

    for tag, (m_, n_) in (("first", (37, 61)), ("second", (41, 59)),
                          ("third", (43, 57))):
        model = random_lp(m_, n_, seed=5)
        t0 = time.perf_counter()
        sol = model.initial_solve(opts)
        wall = time.perf_counter() - t0
        print(f"{tag} {m_}x{n_}: wall={wall:.2f}s status={sol.status.name} "
              f"timings={ {k: round(v, 3) for k, v in (sol.timings or {}).items()} }",
              flush=True)
        assert sol.status == ProblemStatus.OPTIMAL

    # now the manual phase breakdown for a FOURTH shape in the same bucket
    import dataclasses as _dc

    from clp_tpu.forms import to_ipm_form
    from clp_tpu.interior.mehrotra import IPMOptions, ipm_solve_jit
    from clp_tpu.solve import _pad_ipm_lp, _rcm_band_plan

    model = random_lp(39, 63, seed=6)
    t = {}
    t0 = time.perf_counter()
    lp, info = to_ipm_form(model)
    t["to_ipm_form"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    lp, pad_dims = _pad_ipm_lp(lp, 64)
    t["pad"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    perm, nb = _rcm_band_plan(np.asarray(lp.G))
    t["rcm_probe"] = time.perf_counter() - t0
    iopts = IPMOptions(tol=opts.barrier_tolerance,
                       max_iter=opts.barrier_max_iterations,
                       reg_primal=1e-9, reg_dual=1e-10,
                       mixed32=jax.default_backend() == "tpu")
    t0 = time.perf_counter()
    res = ipm_solve_jit(lp, iopts)
    t["ipm_dispatch"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    conv = bool(res.converged)
    t["converged_fetch"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    xs = [np.asarray(a) for a in (res.x, res.y, res.z, res.w)]
    t["result_fetch"] = time.perf_counter() - t0
    # dispatch again: steady-state repeat cost of the SAME shapes
    t0 = time.perf_counter()
    res2 = ipm_solve_jit(lp, iopts)
    _ = bool(res2.converged)
    t["ipm_redispatch_same"] = time.perf_counter() - t0
    print(f"manual 39x63 (padded {lp.G.shape}): converged={conv} "
          f"phases={ {k: round(v, 3) for k, v in t.items()} }", flush=True)


if __name__ == "__main__":
    main()
