"""Can the barrier win the structured-sparse race outright?

The staircase bench instance (2048x4608, 0.7% nnz) is block-banded —
exactly what the RCM-banded / device-multifrontal barrier factors in
O(fill). The dual simplex pays a dense-inverse pivot loop there (1.00x
HiGHS, BENCH_r04); initialSolve's job is to route structure to the right
method. Measure: BARRIER_NO_CROSS wall (post-compile), objective
agreement vs HiGHS, KKT residuals.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main():
    import clp_tpu  # noqa: F401
    from bench import highs_wall_sparse
    from clp_tpu.constants import ProblemStatus, SolveMethod
    from clp_tpu.options import SolveOptions
    from clp_tpu.utils.generators import staircase_lp
    from clp_tpu.validate import check_kkt

    model = staircase_lp(nblocks=16, bm=128, bn=288, seed=0)
    opts = SolveOptions(method=SolveMethod.BARRIER_NO_CROSS)

    # first solve pays the compile
    t0 = time.perf_counter()
    sol = model.copy().initial_solve(opts)
    t_first = time.perf_counter() - t0
    print(f"first (incl compile): {t_first:.2f}s status={sol.status.name} "
          f"obj={sol.objective_value:.8g} timings={sol.timings}", flush=True)

    # repeat = the honest post-compile wall (same shape/program)
    t0 = time.perf_counter()
    m2 = model.copy()
    sol2 = m2.initial_solve(opts)
    t_post = time.perf_counter() - t0
    print(f"post-compile: {t_post:.2f}s status={sol2.status.name} "
          f"obj={sol2.objective_value:.8g}", flush=True)
    rep = check_kkt(m2, x=sol2.primal, y=sol2.duals, tol=1e-6)
    print(f"KKT ok={rep.ok} pinf={rep.primal_infeasibility:.2e} "
          f"dinf={rep.dual_infeasibility:.2e}", flush=True)

    hw, ho = highs_wall_sparse(model)
    agree = ho is not None and abs(sol2.objective_value - ho) <= 1e-6 * (
        1 + abs(ho))
    print(f"HiGHS: {hw}s obj={ho}; agree={agree}; "
          f"speedup_post_compile={None if not hw else round(hw / t_post, 2)}x",
          flush=True)


if __name__ == "__main__":
    main()
