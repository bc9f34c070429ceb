"""Full driver with message-handler interception (examples/driver2.cpp flow).

The reference's driver2 installs a MyMessageHandler that watches solver
messages mid-solve and reacts (it grabs the presolve-size message and can
save the model at events). Here a derived MessageHandler intercepts the
catalog messages the phases emit, and an event handler watches solve
lifecycle events.
"""

import sys as _sys, pathlib as _pathlib

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import sys

from clp_tpu import Model, SolveOptions, SolveMethod
from clp_tpu.events import MessageHandler


class MyMessageHandler(MessageHandler):
    """Intercepts every catalog message (unitTest.cpp MyMessageHandler
    pattern: derived handler sees messages regardless of log level)."""

    def __init__(self):
        super().__init__(log_level=1)
        self.intercepted = []

    def print_message(self, msg, text):
        self.intercepted.append(text)
        print(f"[intercepted #{msg.number}] {text}")


def my_event_handler(event, model):
    from clp_tpu.events import Event

    print(f"[event] {Event(event).name}")
    return -1  # ClpEventHandler convention: >= 0 aborts the solve


path = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/examples/modified_afiro.mps"
model = Model()
assert model.read_mps(path) == 0

model.message_handler = MyMessageHandler()
model.event_handler = my_event_handler

sol = model.initial_solve(SolveOptions(method=SolveMethod.DUAL_SIMPLEX))
print(f"status {sol.status.name} objective {sol.objective_value:.10g}")
print(f"{len(model.message_handler.intercepted)} messages intercepted")
assert model.message_handler.intercepted, "handler saw no messages"
