"""Barrier with and without crossover (examples/testBarrier.cpp workload)."""

import sys as _sys, pathlib as _pathlib

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import sys

from clp_tpu import Model

path = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/examples/modified_afiro.mps"
m1 = Model(); m1.read_mps(path)
s1 = m1.barrier(crossover=False)
print(f"barrier (no cross): {s1.status.name} obj {s1.objective_value:.10g} its {s1.iterations}")
m2 = Model(); m2.read_mps(path)
s2 = m2.barrier(crossover=True)
print(f"barrier + crossover: {s2.status.name} obj {s2.objective_value:.10g} its {s2.iterations}")
