"""Event handler hooks (examples/event1.cpp): observe solve lifecycle
events; returning a value >= 0 would abort (ClpEventHandler role)."""

import sys as _sys, pathlib as _pathlib

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

from clp_tpu import Model
from clp_tpu.events import Event

m = Model()
assert m.read_mps("/root/reference/examples/modified_afiro.mps") == 0
seen = []

def handler(event, model):
    seen.append(event)
    return None  # any value >= 0 aborts the solve

m.event_handler = handler
sol = m.initial_solve()
print(f"{sol.status.name}: obj={sol.objective_value:.8g}; "
      f"events: {[Event(e).name for e in seen]}")
assert Event.START_SOLVE in seen and Event.END_SOLVE in seen
