"""Scenario-batched solves: many same-shape LPs in one device program.

This is the headline TPU-native capability (BASELINE.json configs[4]): stack
B instances on a leading axis, vmap the IPM over it, and shard that axis
over the mesh so each chip solves its slice — no reference analogue (Clp
races *configurations*, ClpRacingSolver.hpp, but never batches instances).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..forms import StandardLP, to_ipm_form
from ..interior.mehrotra import IPMOptions, ipm_solve
from ..model import Model, Solution
from ..options import SolveOptions
from ..solve import _ipm_to_solution
from .mesh import make_mesh, scenario_sharding


def stack_models(models: Sequence[Model]) -> tuple[StandardLP, list]:
    """Stack same-shape models into one batched StandardLP (+ per-model info)."""
    lps, infos = [], []
    shape = None
    for mod in models:
        lp, info = to_ipm_form(mod)
        if shape is None:
            shape = lp.G.shape
        elif lp.G.shape != shape:
            raise ValueError(
                f"all models in a batch must share shape; got {lp.G.shape} vs {shape} "
                "(pad or bucket by shape first)"
            )
        lps.append(lp)
        infos.append(info)
    has_q = [lp.Q is not None for lp in lps]
    if any(has_q) and not all(has_q):
        raise ValueError("mixed LP/QP batches are not supported")
    batched = StandardLP(
        G=jnp.stack([lp.G for lp in lps]),
        b=jnp.stack([lp.b for lp in lps]),
        c=jnp.stack([lp.c for lp in lps]),
        l=jnp.stack([lp.l for lp in lps]),
        u=jnp.stack([lp.u for lp in lps]),
        Q=jnp.stack([lp.Q for lp in lps]) if all(has_q) else None,
    )
    return batched, infos


@partial(jax.jit, static_argnames=("opts",))
def ipm_solve_batched(lp: StandardLP, opts: IPMOptions):
    return jax.vmap(lambda one: ipm_solve(one, opts))(lp)


def stack_models_simplex(models: Sequence[Model]) -> tuple[StandardLP, list]:
    """Stack same-shape models into one batched StandardLP (simplex form)."""
    from ..forms import to_standard_form

    lps, infos = [], []
    shape = None
    for mod in models:
        lp, info = to_standard_form(mod)
        if shape is None:
            shape = lp.G.shape
        elif lp.G.shape != shape:
            raise ValueError("all models in a batch must share shape")
        lps.append(lp)
        infos.append(info)
    has_q = any(lp.Q is not None for lp in lps)
    if has_q and not all(lp.Q is not None for lp in lps):
        raise ValueError("mixing QP and LP instances in one batch")
    batched = StandardLP(
        G=jnp.stack([lp.G for lp in lps]),
        b=jnp.stack([lp.b for lp in lps]),
        c=jnp.stack([lp.c for lp in lps]),
        l=jnp.stack([lp.l for lp in lps]),
        u=jnp.stack([lp.u for lp in lps]),
        Q=jnp.stack([lp.Q for lp in lps]) if has_q else None,
    )
    return batched, infos


@partial(jax.jit, static_argnames=("o",))
def _bprep(lp, st, o):
    def one(lp1, st1):
        st1 = engine_mod().recompute(lp1, st1, o.dual_bound)
        return engine_mod().make_dual_feasible(lp1, st1, o)

    return jax.vmap(one)(lp, st)


@partial(jax.jit, static_argnames=("o",))
def _bchunk(lp, st, o):
    eng = engine_mod()

    def one(lp1, st1):
        return eng._one_chunk(
            lp1, st1, o, eng._dual_iteration_fn(lp1, o), eng._verify_dual_claim
        )

    return jax.vmap(one)(lp, st)


def engine_mod():
    from ..simplex import engine

    return engine


_PACK_CACHE: dict = {}


def _bulk_fetch_host(tree):
    """ONE device->host transfer for a whole pytree.

    Per-leaf np.asarray pays a ~30-60 ms tunnel RPC per leaf (round-5
    measurement: 22 leaf fetches = 1.4 s of a 5.4 s batch wall). Pack
    every leaf into one f64 vector on device (exact for f32/int32/bool),
    fetch once, unpack on host. Leaves already on host pass through."""
    leaves, treedef = jax.tree.flatten(tree)
    if all(isinstance(l, np.ndarray) for l in leaves):
        return tree
    key = tuple((tuple(l.shape), str(l.dtype)) for l in leaves)
    fn = _PACK_CACHE.get(key)
    if fn is None:
        @jax.jit
        def fn(*ls):
            return jnp.concatenate(
                [jnp.ravel(l).astype(jnp.float64) for l in ls])

        _PACK_CACHE[key] = fn
    flat = np.asarray(fn(*leaves))
    out = []
    pos = 0
    for l in leaves:
        size = int(np.prod(l.shape)) if l.ndim else 1
        out.append(flat[pos:pos + size].reshape(l.shape).astype(l.dtype))
        pos += size
    return jax.tree.unflatten(treedef, out)


@partial(jax.jit, static_argnames=("o", "rounds"))
def _brounds(lp, st, o, rounds: int):
    """`rounds` refactor-chunks of the FULL claim protocol per dispatch:
    vmapped bounded _run_loop (engine.dual_solve_rounds). Finished lanes
    are masked by the vmapped while_loops, so early finishers cost ~no
    FLOPs while the rest of the batch drains."""
    eng = engine_mod()

    def one(lp1, st1):
        return eng.dual_solve_rounds(lp1, st1, o, rounds)

    return jax.vmap(one)(lp, st)



@partial(jax.jit, static_argnames=("o",))
def _binit(lp, o):
    eng = engine_mod()
    return jax.vmap(lambda lp1: eng.initial_state(lp1, o))(lp)


@partial(jax.jit, static_argnames=("o",))
def _brerun(lp, st, need_, o):
    import dataclasses as _dc

    eng = engine_mod()

    def one(lp1, st1, n1):
        st1r = _dc.replace(
            st1,
            status=jnp.where(n1, eng.CONTINUE, st1.status).astype(
                st1.status.dtype
            ),
        )
        st2 = eng.recompute(lp1, st1r, o.dual_bound)
        st2 = eng.make_dual_feasible(lp1, st2, o)
        st2 = eng.dual_solve(lp1, st2, o)
        return jax.tree.map(lambda a, b: jnp.where(n1, b, a), st1, st2)

    return jax.vmap(one)(lp, st, need_)


@partial(jax.jit, static_argnames=("o",))
def _bprimal_finish(lp, st, need_, o):
    import dataclasses as _dc

    eng = engine_mod()

    def one(lp1, st1, n1):
        fake = ((st1.vstat == eng.AT_LOWER) & ~jnp.isfinite(lp1.l)) | (
            (st1.vstat == eng.AT_UPPER) & ~jnp.isfinite(lp1.u)
        )
        st1r = _dc.replace(
            st1,
            vstat=jnp.where(fake, eng.FREE, st1.vstat).astype(
                st1.vstat.dtype
            ),
            status=jnp.where(n1, eng.CONTINUE, st1.status).astype(
                st1.status.dtype
            ),
        )
        st2 = eng.recompute(lp1, st1r, o.dual_bound)
        st2 = eng.primal_solve(lp1, st2, o)
        return jax.tree.map(lambda a, b: jnp.where(n1, b, a), st1, st2)

    return jax.vmap(one)(lp, st, need_)


def _compacting_dual_loop(batched, init_states, opts, rounds_per_dispatch=6):
    """Chunked batched dual simplex with live-set compaction.

    The fully-vmapped `dual_solve` drags every finished instance through the
    slowest member's remaining pivots — batch throughput collapses to the
    worst case. Instead: run a BOUNDED number of refactor-chunks per device
    dispatch (the whole verified-claim protocol — chunk, refactor, verify,
    stall escalation — runs inside the dispatch; round 3 paid one host
    round trip per chunk, which dominated wall time through the tunnel at
    small shapes), then retire instances whose status is settled and
    repack the survivors into the next power-of-two bucket. Shapes stay
    static per bucket, so at most log2(B)+1 programs compile.
    """
    from ..simplex import engine

    import dataclasses as _dc

    B = int(jax.tree.leaves(batched)[0].shape[0])
    done: dict[int, object] = {}
    live = np.arange(B)
    lp_cur, st_cur = batched, _bprep(batched, init_states, opts)
    max_disp = (
        int(opts.max_iterations)
        // max(1, int(opts.refactor_frequency) * rounds_per_dispatch)
        + 8
    )

    prev_iters = np.full(live.size, -1, dtype=np.int64)
    stall = np.zeros(live.size, dtype=np.int64)
    for _ in range(max_disp):
        st_cur, verified = _brounds(lp_cur, st_cur, opts, rounds_per_dispatch)
        k = live.size
        stat = np.asarray(st_cur.status)[:k]
        ver = np.asarray(verified)[:k]
        iters = np.asarray(st_cur.iterations)[:k].astype(np.int64)
        # settled: verified claims (OPTIMAL / reclaimed terminal) and hard
        # stops; CONTINUE or an unverified claim gets another dispatch —
        # but a lane whose terminal CLAIM persists unverified with zero
        # iteration progress across two consecutive dispatches is retired
        # as NUMERICAL (the host-side pending/stall protocol, ADVICE r4
        # #3: otherwise it burns the whole max_disp budget re-claiming)
        hard = np.isin(stat, (engine.NUMERICAL, engine.ITER_LIMIT))
        claim_stalled = (~ver) & (stat != engine.CONTINUE) & ~hard & (
            iters == prev_iters
        )
        stall = np.where(claim_stalled, stall + 1, 0)
        prev_iters = iters.copy()
        give_up = stall >= 2
        finish = ver | hard | give_up

        if finish.any():
            # ONE bulk device->host fetch, then numpy slicing: per-lane
            # device slices each compile their own tiny server-side
            # program through the tunnel (measured 13.8 s of a 14.2 s
            # b=256 batch wall — 97% — in round 5)
            st_host = _bulk_fetch_host(st_cur)
            for j in np.flatnonzero(finish):
                st_j = jax.tree.map(lambda a: a[int(j)], st_host)
                if give_up[j] and not (ver[j] or hard[j]):
                    st_j = _dc.replace(
                        st_j,
                        status=np.asarray(engine.NUMERICAL,
                                          st_j.status.dtype),
                    )
                done[int(live[j])] = st_j
            keep = ~finish
            live = live[keep]
            prev_iters = prev_iters[keep]
            stall = stall[keep]
            if live.size == 0:
                break
            # repack survivors into the next power-of-two bucket (pad by
            # repeating the first survivor; padding results are discarded)
            bucket = 1 << int(np.ceil(np.log2(live.size)))
            idx = np.arange(bucket) % live.size
            src = np.flatnonzero(keep)[idx]
            gather = jnp.asarray(src)
            lp_cur = jax.tree.map(lambda a: jnp.take(a, gather, axis=0), lp_cur)
            st_cur = jax.tree.map(lambda a: jnp.take(a, gather, axis=0), st_cur)
    else:
        # dispatch budget exhausted: whatever is left goes to the
        # per-instance fallback as NUMERICAL (bulk fetch + numpy slicing,
        # same reason as the retirement path)
        st_host = _bulk_fetch_host(st_cur)
        for j in range(live.size):
            st_j = jax.tree.map(lambda a: a[int(j)], st_host)
            st_j = _dc.replace(
                st_j, status=np.asarray(engine.NUMERICAL, np.int32)
            )
            done[int(live[j])] = st_j

    # host-side stack: lane states are numpy already; callers do numpy
    # reads and feed jitted reruns, which ingest numpy directly
    return jax.tree.map(lambda *xs: np.stack(xs), *[done[i] for i in range(B)])


def solve_batch_dual_simplex(
    models: Sequence[Model],
    options: Optional[SolveOptions] = None,
    mesh: Optional[jax.sharding.Mesh] = None,
    warm: Optional[Solution] = None,
) -> list[Solution]:
    """Batched dual simplex: vmap the whole pivot loop over instances.

    The per-instance host policies (fake-bound escalation, algorithm
    switching) are not available inside the batch; instances that end on
    a fake bound or numerical trouble are re-solved individually through
    the full driver.
    """
    from ..simplex import engine
    from ..simplex.driver import _extract, simplex_solve

    options = options or SolveOptions()
    batched, infos = stack_models_simplex(models)
    inv_dtype = getattr(options, "inverse_dtype", "auto")
    if inv_dtype == "auto":
        # same policy as the single-instance driver: the mixed f32 pivot
        # loop pays on TPU at scale (lu vmaps across the batch natively)
        m0 = models[0].num_rows if models else 0
        inv_dtype = (
            "float32"
            if jax.default_backend() == "tpu" and m0 >= 512
            else "float64"
        )
    opts = engine.SimplexOptions(
        refactor_frequency=options.refactor_frequency
        or (400 if inv_dtype == "float32" else 100),
        max_iterations=options.max_iterations or 100000,
        inverse_dtype=inv_dtype,
        # same while-boundary amortization as the single-instance TPU
        # engine (round 5); under vmap every lane pays the loop boundary
        # of the slowest lane, so scan blocks help the whole batch
        inner_unroll=8 if inv_dtype == "float32" else 1,
    )
    if mesh is not None:
        sh = scenario_sharding(mesh, options.mesh_axis)
        batched = jax.tree.map(lambda a: jax.device_put(a, sh), batched)

    if warm is not None and warm.column_status is not None:
        # shared warm basis (e.g. strong branching from one parent): build
        # each instance's warm state on the host, stack, and solve batched
        from ..simplex.driver import _warm_state

        per = []
        for i in range(len(models)):
            lp_i = jax.tree.map(lambda a: a[i], batched)
            m_i, nt_i = lp_i.G.shape
            per.append(_warm_state(lp_i, opts, warm, nt_i - m_i, m_i))
        init_states = jax.tree.map(lambda *xs: jnp.stack(xs), *per)
    else:
        init_states = _binit(batched, opts)

    states = _compacting_dual_loop(batched, init_states, opts)

    # --- batched hard-case handling (no per-instance serialization):
    # 1) fake-bound escalation reruns, 2) demote-to-free + primal finish —
    # both still one vmapped program over the whole batch; only numerical
    # leftovers fall back to the single-instance driver (driver.py:469-505
    # is the per-instance original of this policy).
    import dataclasses as _dc

    def _flags(states_):
        stat_ = np.asarray(states_.status)
        l_ = np.asarray(batched.l)
        u_ = np.asarray(batched.u)
        vs_ = np.asarray(states_.vstat)
        fake = ((vs_ == engine.AT_LOWER) & ~np.isfinite(l_)) | (
            (vs_ == engine.AT_UPPER) & ~np.isfinite(u_)
        )
        return stat_, fake.any(axis=1)

    stat, fakes = _flags(states)
    opts_e = opts
    attempts = 0
    while attempts < 2 and np.any((stat == engine.OPTIMAL) & fakes):
        attempts += 1
        opts_e = _dc.replace(opts_e, dual_bound=opts_e.dual_bound * 100.0)
        need = jnp.asarray((stat == engine.OPTIMAL) & fakes)
        states = _brerun(batched, states, need, opts_e)
        stat, fakes = _flags(states)

    # OPTIMAL-on-fake needs the true-bounds primal finish; an infeasibility
    # claim with fakes active is suspect for the same reason the driver
    # adjudicates it (a folded free variable only prices one direction)
    need_pf = ((stat == engine.OPTIMAL) | (stat == engine.PRIMAL_INFEASIBLE)) & fakes
    if np.any(need_pf):
        # park fake-bound nonbasics at 0 as FREE and finish with the primal
        # (resetFakeBounds + primal cleanup, ClpSimplexDual.cpp:8303)
        need = jnp.asarray(need_pf)
        states = _bprimal_finish(batched, states, need, opts_e)
        stat, fakes = _flags(states)

    # ONE bulk device->host transfer for the whole batch: slicing device
    # arrays per instance costs several RPC round trips each through a
    # tunnel-attached chip (~8 x 30 ms x B dominated the b=32 wall)
    states_np = _bulk_fetch_host(states)
    batched_np = _bulk_fetch_host(batched)
    out = []
    for i, mod in enumerate(models):
        st_i = jax.tree.map(lambda a: a[i], states_np)
        lp_i = jax.tree.map(lambda a: a[i], batched_np)
        status = int(st_i.status)
        clean = status in (
            engine.OPTIMAL,
            engine.PRIMAL_INFEASIBLE,
            engine.DUAL_INFEASIBLE,
        ) and not (status == engine.OPTIMAL and fakes[i])
        if clean:
            sol = _extract(mod, lp_i, st_i, opts_e, status)
        else:
            # numerical leftovers only (perturbation retries etc. need the
            # per-instance policies)
            sol = simplex_solve(mod, options, dual=True)
        mod.solution = sol
        out.append(sol)
    return out


def solve_batch_ipm(
    models: Sequence[Model],
    options: SolveOptions,
    mesh: Optional[jax.sharding.Mesh] = None,
) -> list[Solution]:
    batched, infos = stack_models(models)
    opts = IPMOptions(
        tol=options.barrier_tolerance, max_iter=options.barrier_max_iterations
    )
    # one shared banded plan for the whole batch (the reference's symbolic/
    # numeric split, ClpCholeskyBase.cpp:638: ordering once, factor many):
    # RCM on the UNION sparsity pattern across scenarios, so every
    # instance's normal matrix is banded under the same row permutation —
    # the vmapped numeric phase then runs block-tridiagonal per scenario
    perm = None
    if batched.Q is None:
        from ..solve import _rcm_band_plan

        union = (np.abs(np.asarray(batched.G)) > 0).any(axis=0)
        perm, nb = _rcm_band_plan(union.astype(np.float64))
        if perm is not None:
            import dataclasses as _dc

            pj = jnp.asarray(perm)
            batched = _dc.replace(
                batched, G=batched.G[:, pj, :], b=batched.b[:, pj]
            )
            opts = _dc.replace(opts, band_nb=nb)
    if mesh is not None:
        sh = scenario_sharding(mesh, options.mesh_axis)
        batched = jax.tree.map(lambda a: jax.device_put(a, sh), batched)
    res = ipm_solve_batched(batched, opts)
    res_host = jax.tree.map(np.asarray, res)
    if perm is not None:
        y_perm = res_host.y.copy()
        y_full = np.empty_like(y_perm)
        y_full[:, perm] = y_perm
        res_host = jax.tree.map(lambda a: a, res_host)
        res_host.y = y_full
    out = []
    for i, (mod, info) in enumerate(zip(models, infos)):
        one = jax.tree.map(lambda a: a[i], res_host)
        sol = _ipm_to_solution(mod, one, info, options)
        mod.solution = sol
        out.append(sol)
    return out


def solve_batch_qp_simplex(
    models: Sequence[Model],
    options: Optional[SolveOptions] = None,
    mesh: Optional[jax.sharding.Mesh] = None,
) -> list[Solution]:
    """Batched QP active-set simplex: same-shape QPs as ONE device program.

    The scenario shape this serves is the warm parametric sweep (portfolio
    rebalancing: one structure, many risk aversions / return targets).
    Phase 1 (zero-cost dual LP to a feasible vertex) and the jitted
    reduced-gradient active-set loop (simplex/qp.py) are both vmapped over
    the batch; the scenario axis shards over `mesh` exactly like the
    batched IPM / dual-simplex paths.  Instances the batch cannot finish
    cleanly fall back to the single-instance QP driver.
    """
    import dataclasses as _dc

    from ..simplex import engine
    from ..simplex.qp import QPState, _gradient, qp_simplex_solve, qp_solve

    options = options or SolveOptions()
    batched, infos = stack_models_simplex(models)
    if batched.Q is None:
        raise ValueError("solve_batch_qp_simplex needs quadratic objectives"
                         " (use solve_batch_dual_simplex for LPs)")
    m0, nt0 = batched.G.shape[1:]
    n0 = nt0 - m0
    opts = engine.SimplexOptions(
        refactor_frequency=options.refactor_frequency or 100,
        max_iterations=int(min(options.max_iterations or 10 ** 9,
                               50 * (m0 + n0) + 10000)),
    )
    if mesh is not None:
        sh = scenario_sharding(mesh, options.mesh_axis)
        batched = jax.tree.map(
            lambda a: jax.device_put(a, sh) if a is not None else None,
            batched)

    lp0 = _dc.replace(batched, c=jnp.zeros_like(batched.c), Q=None)

    @partial(jax.jit, static_argnames=("o",))
    def _phase1(lp, o):
        def one(lp1):
            st = engine.initial_state(lp1, o)
            st = engine.recompute(lp1, st, o.dual_bound)
            st = engine.make_dual_feasible(lp1, st, o)
            return engine.dual_solve(lp1, st, o)

        return jax.vmap(one)(lp)

    st0 = _phase1(lp0, opts)

    @partial(jax.jit, static_argnames=("o",))
    def _qp_batched(lp, lp_zero, st, o):
        def one(lp1, lpz1, st1):
            xn = engine.nonbasic_values(lpz1, st1.vstat, o.dual_bound)
            x_full = jnp.asarray(xn).at[st1.basis].set(st1.xb)
            q0 = QPState(
                basis=st1.basis, vstat=st1.vstat, binv=st1.binv, x=x_full,
                iterations=jnp.asarray(0, jnp.int32),
                status=jnp.asarray(engine.CONTINUE, jnp.int32),
                refactor_now=jnp.asarray(False),
            )
            return qp_solve(lp1, q0, o)

        return jax.vmap(one)(lp, lp_zero, st)

    qstates = _qp_batched(batched, lp0, st0, opts)

    from ..constants import ProblemStatus, VariableStatus
    from ..model import Solution
    from ..simplex.driver import _ENGINE_TO_VS

    status_map = {
        engine.OPTIMAL: ProblemStatus.OPTIMAL,
        engine.DUAL_INFEASIBLE: ProblemStatus.DUAL_INFEASIBLE,
        engine.ITER_LIMIT: ProblemStatus.STOPPED,
    }
    out = []
    for i, (mod, info) in enumerate(zip(models, infos)):
        p1 = int(np.asarray(st0.status)[i])
        qs = jax.tree.map(lambda a: np.asarray(a)[i], qstates)
        st = int(qs.status)
        if p1 == engine.PRIMAL_INFEASIBLE:
            sol = Solution(status=ProblemStatus.PRIMAL_INFEASIBLE)
        elif p1 != engine.OPTIMAL or st not in status_map:
            sol = qp_simplex_solve(mod, options)  # per-instance fallback
        else:
            lp_i = jax.tree.map(
                lambda a: a[i] if a is not None else None, batched)
            x = np.asarray(qs.x)
            g = np.asarray(_gradient(lp_i, qs.x))
            y = g[np.asarray(qs.basis)] @ np.asarray(qs.binv)
            sense = info.sense
            n = mod.num_cols
            xs = x[:n]
            obj = float(mod.objective @ xs) + mod.objective_offset
            if mod.quadratic_objective is not None:
                obj += 0.5 * float(xs @ (mod.quadratic_objective @ xs))
            vstat = np.asarray(qs.vstat)
            duals = y * sense
            dj_user = (
                mod.objective
                + (mod.quadratic_objective @ xs
                   if mod.quadratic_objective is not None else 0.0)
                - mod.matrix.T @ duals
            )
            sol = Solution(
                status=status_map[st],
                objective_value=obj,
                primal=xs,
                duals=duals,
                reduced_costs=np.asarray(dj_user),
                row_activity=np.asarray(mod.matrix @ xs),
                iterations=int(qs.iterations) + int(np.asarray(st0.iterations)[i]),
                column_status=np.array(
                    [_ENGINE_TO_VS[int(s)] for s in vstat[:n]], dtype=np.int8),
                row_status=np.array(
                    [_ENGINE_TO_VS[int(s)] for s in vstat[n:]], dtype=np.int8),
            )
        mod.solution = sol
        out.append(sol)
    return out
