"""Message-handler pass-through (CoinMessageHandler parity).

The reference's unit test installs a derived handler and intercepts
messages at any log level (unitTest.cpp:1567 MyMessageHandler); these
tests install a capturing handler on the model and assert the solver
phases actually emit their CLP_* catalog messages through it.
"""

import numpy as np

from clp_tpu import Model, SolveOptions, SolveMethod, INF, ProblemStatus
from clp_tpu.events import MessageHandler
from clp_tpu.utils.generators import random_lp, infeasible_lp, unbounded_lp


class _Capture(MessageHandler):
    def __init__(self):
        super().__init__(log_level=0)  # filter everything from printing...
        self.texts = []

    def message(self, number, **kw):
        # ...but record every emission, printed or not
        super().message(number, **kw)

    def print_message(self, msg, text):
        self.texts.append(text)


def _solve(model, method, presolve=False):
    h = _Capture()
    model.message_handler = h
    opts = SolveOptions(method=method)
    opts.presolve.enabled = presolve
    sol = model.initial_solve(opts)
    return sol, h


def test_dual_optimal_emits_finished():
    model = random_lp(10, 16, seed=0)
    sol, h = _solve(model, SolveMethod.DUAL_SIMPLEX)
    assert sol.status == ProblemStatus.OPTIMAL
    assert "CLP_SIMPLEX_FINISHED" in h.messages_seen


def test_primal_optimal_emits_message():
    model = random_lp(10, 16, seed=1)
    sol, h = _solve(model, SolveMethod.PRIMAL_SIMPLEX)
    assert sol.status == ProblemStatus.OPTIMAL
    assert (
        "CLP_PRIMAL_OPTIMAL" in h.messages_seen
        or "CLP_SIMPLEX_FINISHED" in h.messages_seen
    )


def test_infeasible_emits_message():
    model = infeasible_lp()
    sol, h = _solve(model, SolveMethod.DUAL_SIMPLEX)
    assert sol.status == ProblemStatus.PRIMAL_INFEASIBLE
    assert "CLP_SIMPLEX_INFEASIBLE" in h.messages_seen


def test_unbounded_emits_message():
    model = unbounded_lp()
    sol, h = _solve(model, SolveMethod.PRIMAL_SIMPLEX)
    assert sol.status == ProblemStatus.DUAL_INFEASIBLE
    assert "CLP_SIMPLEX_UNBOUNDED" in h.messages_seen


def test_barrier_emits_end():
    model = random_lp(12, 20, seed=2)
    sol, h = _solve(model, SolveMethod.BARRIER)
    assert sol.status == ProblemStatus.OPTIMAL
    assert "CLP_BARRIER_END" in h.messages_seen


def test_handler_survives_clone_by_reference():
    model = random_lp(8, 12, seed=3)
    h = _Capture()
    model.message_handler = h
    clone = model.copy()
    assert clone.message_handler is h  # shared pointer semantics


def test_save_restore_drops_handler():
    import tempfile, os

    model = random_lp(8, 12, seed=4)
    model.message_handler = _Capture()
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "m.clp")
        assert model.save_model(path) == 0
        m2 = Model()
        assert m2.restore_model(path) == 0
        assert m2.message_handler is None
        sol = m2.initial_solve(SolveOptions(method=SolveMethod.DUAL_SIMPLEX))
        assert sol.status == ProblemStatus.OPTIMAL


def test_sanity_check_rejects_nan_matrix():
    """Non-finite data is rejected with CLP_BAD_MATRIX / CLP_BAD_BOUNDS
    and status ERRORS (reference sanityCheck behavior)."""
    import scipy.sparse as sp

    m = Model()
    m.load_problem(
        sp.csc_matrix(np.array([[1.0, np.nan], [1.0, 3.0]])),
        col_lower=[0, 0], col_upper=[INF, INF], objective=[1.0, 1.0],
        row_lower=[-INF, -INF], row_upper=[4.0, 6.0],
    )
    h = _Capture()
    m.message_handler = h
    sol = m.initial_solve(SolveOptions(method=SolveMethod.DUAL_SIMPLEX))
    assert sol.status == ProblemStatus.ERRORS
    assert "CLP_BAD_MATRIX" in h.messages_seen

    m2 = Model()
    m2.load_problem(
        sp.csc_matrix(np.array([[1.0, 2.0]])),
        col_lower=[0, np.nan], col_upper=[INF, INF], objective=[1.0, 1.0],
        row_lower=[-INF], row_upper=[4.0],
    )
    h2 = _Capture()
    m2.message_handler = h2
    sol2 = m2.initial_solve(SolveOptions(method=SolveMethod.DUAL_SIMPLEX))
    assert sol2.status == ProblemStatus.ERRORS
    assert "CLP_BAD_BOUNDS" in h2.messages_seen


# --- event-hook surface (ClpEventHandler.hpp:32-76, full 43-hook enum) ---


class _Recorder:
    """EventHandler that records every hook; optionally aborts on one."""

    def __init__(self, abort_on=None, abort_after=0):
        from clp_tpu.events import EventHandler

        self.seen = []
        self.abort_on = abort_on
        self.abort_after = abort_after

    def __call__(self, which, model):
        return self.event(which, model)

    def event(self, which, model=None, **info):
        self.seen.append((which, info))
        if self.abort_on is not None and which == self.abort_on:
            if sum(1 for w, _ in self.seen if w == which) > self.abort_after:
                return 0
        return -1


def test_event_enum_matches_reference_numbering():
    from clp_tpu.events import Event

    # reference values (ClpEventHandler.hpp: endOfIteration = 100, ...)
    assert Event.END_OF_ITERATION == 100
    assert Event.NO_THETA == 141
    ref_hooks = [e for e in Event if 100 <= int(e) <= 141]
    assert len(set(int(e) for e in ref_hooks)) == 42  # all 42 values present
    assert Event.CROSSOVER_START is Event.START_OF_CROSSOVER  # legacy alias


def test_simplex_hooks_fire_in_order():
    from clp_tpu.events import Event, EventHandler

    class H(_Recorder, EventHandler):
        pass

    model = random_lp(12, 20, seed=2)
    h = H()
    model.event_handler = h
    opts = SolveOptions(method=SolveMethod.DUAL_SIMPLEX)
    opts.presolve.enabled = False
    sol = model.initial_solve(opts)
    assert sol.status == ProblemStatus.OPTIMAL
    names = [w for w, _ in h.seen]
    for must in (Event.START_SOLVE, Event.END_OF_CREATE_RIM,
                 Event.BEFORE_STATUS_OF_PROBLEM_IN_DUAL,
                 Event.START_OF_STATUS_OF_PROBLEM_IN_DUAL,
                 Event.END_OF_ITERATION, Event.END_OF_FACTORIZATION,
                 Event.LOOKS_END_IN_DUAL, Event.END_IN_DUAL,
                 Event.BEFORE_DELETE_RIM, Event.SOLUTION, Event.END_SOLVE):
        assert must in names, must
    # ordering sanity: create-rim before iterations before delete-rim
    assert names.index(Event.END_OF_CREATE_RIM) < names.index(
        Event.END_OF_ITERATION) < names.index(Event.BEFORE_DELETE_RIM)


def test_presolve_hooks_fire():
    from clp_tpu.events import Event, EventHandler

    class H(_Recorder, EventHandler):
        pass

    model = random_lp(12, 20, seed=3)
    h = H()
    model.event_handler = h
    sol = model.initial_solve()  # presolve ON by default
    names = [w for w, _ in h.seen]
    for must in (Event.PRESOLVE_START, Event.PRESOLVE_SIZE,
                 Event.PRESOLVE_END, Event.PRESOLVE_BEFORE_SOLVE,
                 Event.PRESOLVE_AFTER_FIRST_SOLVE,
                 Event.PRESOLVE_AFTER_SOLVE):
        assert must in names, must


def test_abort_from_end_of_iteration():
    from clp_tpu.events import Event, EventHandler

    class H(_Recorder, EventHandler):
        pass

    model = random_lp(40, 64, seed=4)
    h = H(abort_on=Event.END_OF_ITERATION)
    model.event_handler = h
    opts = SolveOptions(method=SolveMethod.DUAL_SIMPLEX)
    opts.presolve.enabled = False
    sol = model.initial_solve(opts)
    assert sol.status == ProblemStatus.USER_STOPPED


def test_theta_hooks_in_parametrics():
    from clp_tpu.analysis import parametrics_exact
    from clp_tpu.events import Event, EventHandler

    class H(_Recorder, EventHandler):
        pass

    model = random_lp(8, 14, seed=5)
    o = SolveOptions(method=SolveMethod.DUAL_SIMPLEX)
    o.presolve.enabled = False
    model.initial_solve(o)
    h = H()
    model.event_handler = h
    dc = np.zeros(model.num_cols)
    dc[0] = 1.0
    res = parametrics_exact(model, 2.0, dc=dc)
    names = [w for w, _ in h.seen]
    if res.pivots:
        assert Event.THETA in names
    assert Event.NO_THETA in names


def test_node_and_solution_hooks_in_fathom():
    import scipy.sparse as sp

    from clp_tpu.events import Event, EventHandler
    from clp_tpu.mip import fathom

    class H(_Recorder, EventHandler):
        pass

    # tiny knapsack MIP
    model = Model()
    model.load_problem(
        sp.csc_matrix(np.array([[3.0, 5.0, 4.0, 6.0]])),
        np.zeros(4), np.ones(4), np.array([-5.0, -8.0, -7.0, -9.0]),
        np.array([-INF]), np.array([9.0]))
    model.set_integer(range(4))
    h = H()
    model.event_handler = h
    res = fathom(model)
    names = [w for w, _ in h.seen]
    assert Event.NODE in names
    assert res.status == ProblemStatus.OPTIMAL
    assert Event.SOLUTION in names


def test_nonlinear_hooks_in_piecewise():
    import scipy.sparse as sp

    from clp_tpu.events import Event, EventHandler
    from clp_tpu.piecewise import solve_piecewise

    class H(_Recorder, EventHandler):
        pass

    m = Model()
    m.load_problem(sp.csc_matrix(np.array([[1.0]])), np.array([0.0]),
                   np.array([10.0]), np.array([0.0]),
                   np.array([-INF]), np.array([INF]))
    h = H()
    m.event_handler = h
    solve_piecewise(m, {0: ([0.0, 4.0, 10.0], [-2.0, 3.0])})
    names = [w for w, _ in h.seen]
    assert Event.BEFORE_CREATE_NON_LINEAR in names
    assert Event.AFTER_CREATE_NON_LINEAR in names


# ---------------------------------------------------------------------------
# Disaster handler (ClpDisasterHandler analogue, ClpSimplex.hpp:992-1001)
# ---------------------------------------------------------------------------


def test_disaster_handler_fires_and_recovers(monkeypatch):
    """Poison the engine so every built-in escalation fails, then verify
    the attached DisasterHandler fires (into_simplex / save_info / check)
    and its recovery retry — on the healed engine — reaches OPTIMAL."""
    import dataclasses
    import jax.numpy as jnp

    from clp_tpu.simplex import driver as drv, engine as eng
    from clp_tpu.events import DisasterHandler

    ref = random_lp(12, 20, seed=3).initial_solve(
        SolveOptions(method=SolveMethod.DUAL_SIMPLEX))
    assert ref.status == ProblemStatus.OPTIMAL

    real_dual, real_primal = drv.dual_solve, drv.primal_solve
    healed = {"flag": False}

    def poisoned_dual(lp, state, opts):
        if healed["flag"]:
            return real_dual(lp, state, opts)
        return dataclasses.replace(
            state, status=jnp.asarray(eng.NUMERICAL, jnp.int32))

    def poisoned_primal(lp, state, opts):
        if healed["flag"]:
            return real_primal(lp, state, opts)
        return dataclasses.replace(
            state, status=jnp.asarray(eng.NUMERICAL, jnp.int32))

    monkeypatch.setattr(drv, "dual_solve", poisoned_dual)
    monkeypatch.setattr(drv, "primal_solve", poisoned_primal)

    class Recovery(DisasterHandler):
        def __init__(self):
            self.entered = False
            self.saved = None
            self.checked = 0

        def into_simplex(self, model):
            self.entered = True

        def save_info(self, snapshot):
            self.saved = snapshot

        def check(self, snapshot):
            self.checked += 1
            healed["flag"] = True  # the "fix": recovery runs on a good engine
            snapshot.retry_options["refactor_frequency"] = 50
            return True

    model = random_lp(12, 20, seed=3)
    h = Recovery()
    model.disaster_handler = h
    sol = model.initial_solve(SolveOptions(method=SolveMethod.DUAL_SIMPLEX))
    assert h.entered
    assert h.checked >= 1
    assert h.saved is not None
    assert h.saved.algorithm == "dual"
    assert h.saved.status in (eng.NUMERICAL, eng.CONTINUE)
    assert h.saved.vstat.size == 12 + 20
    assert sol.status == ProblemStatus.OPTIMAL
    assert abs(sol.objective_value - ref.objective_value) <= 1e-6 * (
        1 + abs(ref.objective_value))


def test_disaster_handler_abort_type_accepts_failure(monkeypatch):
    """typeOfDisaster() == 1 means abort: no recovery retry fires."""
    import dataclasses
    import jax.numpy as jnp

    from clp_tpu.simplex import driver as drv, engine as eng
    from clp_tpu.events import DisasterHandler

    def poisoned(lp, state, opts):
        return dataclasses.replace(
            state, status=jnp.asarray(eng.NUMERICAL, jnp.int32))

    monkeypatch.setattr(drv, "dual_solve", poisoned)
    monkeypatch.setattr(drv, "primal_solve", poisoned)

    class Abort(DisasterHandler):
        def __init__(self):
            self.checked = 0

        def check(self, snapshot):
            self.checked += 1
            return True

        def type_of_disaster(self):
            return 1  # abort

    model = random_lp(10, 16, seed=1)
    h = Abort()
    model.disaster_handler = h
    opts = SolveOptions(method=SolveMethod.DUAL_SIMPLEX)
    opts.presolve.enabled = False
    sol = model.initial_solve(opts)
    assert h.checked >= 1
    assert sol.status != ProblemStatus.OPTIMAL
