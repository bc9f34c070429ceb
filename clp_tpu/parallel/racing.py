"""Portfolio racing — run several solver configurations, first winner takes it.

Reference: ClpRacingSolver (ClpRacingSolver.hpp:12-26) races {dual,
primal+idiot, primal+sprint} clones on std::threads with an atomic abort.
TPU-native version: each configuration is pinned to its own device when
several are available (racing across chips), else configurations time-slice
one device via threads; the first OPTIMAL result wins and is installed on
the model.
"""

from __future__ import annotations

import threading
from typing import Optional, Sequence

import jax

from ..constants import ProblemStatus, SolveMethod
from ..model import Model, Solution
from ..options import SolveOptions


def default_race_configs() -> list[SolveOptions]:
    """The reference's portfolio: dual / primal+idiot / barrier."""
    a = SolveOptions(method=SolveMethod.DUAL_SIMPLEX)
    b = SolveOptions(method=SolveMethod.PRIMAL_SIMPLEX, crash="idiot")
    c = SolveOptions(method=SolveMethod.BARRIER_NO_CROSS)
    return [a, b, c]


def racing_solve(
    model: Model,
    configs: Optional[Sequence[SolveOptions]] = None,
    devices: Optional[Sequence] = None,
) -> Solution:
    configs = list(configs or default_race_configs())
    devices = list(devices or jax.devices())
    winner: dict = {}
    lock = threading.Lock()
    done = threading.Event()

    def run(i: int, opts: SolveOptions):
        mod = model.copy()
        dev = devices[i % len(devices)]
        try:
            with jax.default_device(dev):
                sol = mod.initial_solve(opts)
        except Exception as e:  # noqa: BLE001 — a losing config must not kill the race
            sol = Solution(status=ProblemStatus.ERRORS)
            sol.error = str(e)  # type: ignore[attr-defined]
        with lock:
            if sol.status == ProblemStatus.OPTIMAL and "sol" not in winner:
                winner["sol"] = sol
                winner["config"] = i
                done.set()
            winner.setdefault("results", []).append((i, sol))
            if len(winner["results"]) == len(configs):
                done.set()

    threads = [
        threading.Thread(target=run, args=(i, o), daemon=True)
        for i, o in enumerate(configs)
    ]
    for t in threads:
        t.start()
    done.wait()
    for t in threads:
        t.join(timeout=60.0)

    if "sol" in winner:
        model.solution = winner["sol"]
        model.solution.winning_config = winner["config"]  # type: ignore[attr-defined]
        return model.solution
    # no optimal finisher: return the most definitive result
    order = {
        ProblemStatus.PRIMAL_INFEASIBLE: 0,
        ProblemStatus.DUAL_INFEASIBLE: 1,
        ProblemStatus.STOPPED: 2,
        ProblemStatus.ERRORS: 3,
        ProblemStatus.UNKNOWN: 4,
    }
    results = sorted(winner.get("results", []), key=lambda r: order.get(r[1].status, 9))
    sol = results[0][1] if results else Solution(status=ProblemStatus.ERRORS)
    model.solution = sol
    return sol


def race_seeds(
    model: Model,
    options: Optional[SolveOptions] = None,
    k: int = 8,
    perturb: float = 1e-6,
    max_chunks: int = 400,
) -> Solution:
    """On-device racing: K data-parameterized variants of ONE LP in ONE
    vmapped program — the TPU-idiomatic replacement for thread racing.

    The reference races structurally different configurations on threads
    (ClpRacingSolver.hpp:12-26); a single chip cannot time-slice those
    profitably.  What a chip CAN do is run K variants that differ only in
    DATA — here K cost-perturbation seeds (variant 0 unperturbed), the
    anti-degeneracy diversification of ClpSimplexDual::perturb — as one
    batched dual-simplex program.  Chunks run in lockstep; the first
    variant whose claim verifies wins, its basis warm-starts one cleanup
    solve on the TRUE costs, and everything else is abandoned mid-chunk.
    On degenerate LPs where one trajectory stalls, another seed's usually
    does not.
    """
    import jax.numpy as jnp

    from ..forms import StandardLP, to_standard_form
    from ..simplex import engine
    from ..simplex.driver import _ENGINE_TO_VS, simplex_solve
    from .batch import _bchunk, _bprep

    import numpy as np

    options = options or SolveOptions()
    lp, _info = to_standard_form(model)
    m, nt = lp.G.shape
    n = nt - m
    c = np.asarray(lp.c)
    rng = np.random.default_rng(model.random_seed)
    rows = [np.zeros(nt)]
    for _ in range(k - 1):
        rows.append(rng.uniform(0.5, 1.0, nt) * perturb * (1.0 + np.abs(c)))
    c_k = jnp.asarray(c[None, :] + np.stack(rows))
    tile = lambda a: jnp.broadcast_to(a, (k,) + a.shape)  # noqa: E731
    batched = StandardLP(
        G=jnp.stack([lp.G] * k), b=tile(lp.b), c=c_k,
        l=tile(lp.l), u=tile(lp.u),
    )
    opts = engine.SimplexOptions(
        refactor_frequency=options.refactor_frequency or 100,
        max_iterations=options.max_iterations or 100000,
    )
    init = jax.vmap(lambda lp1: engine.initial_state(lp1, opts))(batched)
    st = _bprep(batched, init, opts)
    winner = -1
    for _ in range(max_chunks):
        st, verified, _obj = _bchunk(batched, st, opts)
        ver = np.asarray(verified)
        stat = np.asarray(st.status)
        wins = np.flatnonzero(ver & (stat == engine.OPTIMAL))
        if wins.size:
            winner = int(wins[0])
            break
        # an OPTIMAL claim verifies in the NEXT chunk (fresh factors):
        # keep going while any variant is running OR has a pending claim
        pending = (stat == engine.CONTINUE) | (
            (stat == engine.OPTIMAL) & ~ver)
        if not np.any(pending):
            break
    if winner < 0:
        # no perturbed variant verified: the plain driver adjudicates
        # (its certificate checks also own infeasible/unbounded claims)
        return simplex_solve(model, options, dual=True)
    vstat = np.asarray(st.vstat)[winner]
    warm = Solution(
        column_status=np.array([_ENGINE_TO_VS[int(s)] for s in vstat[:n]],
                               dtype=np.int8),
        row_status=np.array([_ENGINE_TO_VS[int(s)] for s in vstat[n:]],
                            dtype=np.int8),
    )
    # cleanup on TRUE costs from the winning basis (perturbation removal,
    # ClpSimplexDual.cpp:6533 restore-and-clean step)
    sol = simplex_solve(model, options, dual=True, warm=warm)
    sol.winning_config = winner  # type: ignore[attr-defined]
    model.solution = sol
    return sol
