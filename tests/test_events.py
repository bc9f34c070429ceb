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
