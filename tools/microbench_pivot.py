"""Component-level cost of ONE dual pivot, measured by the slope method.

Runs K iterations of the dual pivot body inside one jitted lax.scan (so
there is no per-pivot dispatch), at two chain lengths; the slope is the
true per-pivot device cost. Component costs come from re-measuring with
that component replaced by a cheap alias (SimplexOptions.ablate — timing
gates, numerically meaningless results, used ONLY here).

This replaces the round-4 ablation numbers, which were measured with
per-dispatch timing (VERDICT r4 weak #2 applies to them too).
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def slope(fn_maker, x0, K1, K2, reps=3):
    t = {}
    for K in (K1, K2):
        run = fn_maker(K)
        float(run(x0))  # compile + warm
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(x0))
            best = min(best, time.perf_counter() - t0)
        t[K] = best
    return (t[K2] - t[K1]) / (K2 - K1)


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from clp_tpu.forms import to_standard_form
    from clp_tpu.simplex import engine
    from clp_tpu.utils.generators import staircase_lp

    model = staircase_lp(nblocks=16, bm=128, bn=288, seed=0)
    lp, _ = to_standard_form(model)
    on_tpu = jax.default_backend() == "tpu"
    base = engine.SimplexOptions(
        max_iterations=10 ** 9,  # never trip inside the scan
        refactor_frequency=10 ** 9,
        use_pallas_price=on_tpu,
        inverse_dtype="float32" if on_tpu else "float64",
        dual_ratio="bfrt",
    )

    st0 = engine.initial_state(lp, base)
    st0 = engine.recompute(lp, st0, base.dual_bound)
    st0 = engine.make_dual_feasible(lp, st0, base)

    def make_runner(opts, loop="scan"):
        it_fn = engine._dual_iteration_fn(lp, opts)

        def out_scalar(out):
            # read EVERY carried array so no component is dead code
            return (out.xb[:1].sum() + out.dj[:1].sum()
                    + out.binv[0, :1].sum() + out.weights[:1].sum()
                    + out.vstat[:1].sum() + out.basis[:1].sum()
                    ).astype(jnp.float32)

        def maker(K):
            if loop == "while":
                def run(st):
                    def cond(c):
                        return c[1] < K

                    def body(c):
                        s, k = c
                        return it_fn(lp, s, opts), k + 1

                    out, _ = jax.lax.while_loop(cond, body, (st, 0))
                    return out_scalar(out)
            else:
                def run(st):
                    out, _ = jax.lax.scan(
                        lambda s, _: (it_fn(lp, s, opts), None), st, None,
                        length=K)
                    return out_scalar(out)

            return jax.jit(run)

        return maker

    K1, K2 = 32, 160
    full = slope(make_runner(base), st0, K1, K2)
    print(f"full pivot (scan): {full * 1e6:8.1f} us", flush=True)
    t_while = slope(make_runner(base, loop="while"), st0, K1, K2)
    print(f"full pivot (while): {t_while * 1e6:8.1f} us "
          f"(while_loop overhead ~ {(t_while - full) * 1e6:.1f} us)",
          flush=True)
    o = dataclasses.replace(base, ablate=("forceflow",))
    t_ff = slope(make_runner(o), st0, K1, K2)
    print(f"  +forceflow : {t_ff * 1e6:8.1f} us  (flow matvec ~ "
          f"{(t_ff - full) * 1e6:7.1f} us — real solves pay this on "
          f"flip pivots)", flush=True)
    for gate in ("price", "ftran", "update", "bfrt", "book", "rowchoice",
                 "flip"):
        o = dataclasses.replace(base, ablate=(gate,))
        t = slope(make_runner(o), st0, K1, K2)
        print(f"  -{gate:9s}: {t * 1e6:8.1f} us  (component ~ "
              f"{(full - t) * 1e6:7.1f} us)", flush=True)
    # everything gated at once = irreducible loop/structure overhead
    o = dataclasses.replace(
        base, ablate=("price", "ftran", "update", "bfrt", "book",
                      "rowchoice"))
    t = slope(make_runner(o), st0, K1, K2)
    print(f"  skeleton   : {t * 1e6:8.1f} us", flush=True)

    # chunk-protocol fixed cost: recompute + verify, timed by slope too
    def rec_maker(K):
        def run(st):
            def body(s, _):
                s2 = engine.recompute(lp, s, base.dual_bound)
                ok = engine._verify_dual_claim(lp, s2, base)
                s2 = dataclasses.replace(
                    s2, xb=s2.xb + 1e-30 * ok.astype(s2.xb.dtype))
                return s2, None

            out, _ = jax.lax.scan(body, st, None, length=K)
            return (out.xb[:1].sum()).astype(jnp.float32)

        return jax.jit(run)

    t_rec = slope(rec_maker, st0, 2, 10)
    print(f"recompute+verify: {t_rec * 1e3:8.2f} ms per chunk "
          f"(/800 pivots = {t_rec / 800 * 1e6:.1f} us/pivot)", flush=True)


if __name__ == "__main__":
    main()
