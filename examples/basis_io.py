"""Basis save/restore (examples/testBasis.cpp): write an MPS basis file
after a solve, then warm-start a modified model from it."""

import sys as _sys, pathlib as _pathlib, tempfile, os

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

from clp_tpu import Model
from clp_tpu.io.basis import read_basis, write_basis

m = Model()
assert m.read_mps("/root/reference/examples/modified_afiro.mps") == 0
sol = m.initial_solve()
path = os.path.join(tempfile.mkdtemp(), "afiro.bas")
write_basis(m, path)

m2 = Model()
assert m2.read_mps("/root/reference/examples/modified_afiro.mps") == 0
m2.objective = m2.objective * 1.01  # small cost change
read_basis(m2, path)
sol2 = m2.initial_solve()
print(f"warm re-solve: {sol2.status.name} obj={sol2.objective_value:.8g} "
      f"in {sol2.iterations} iterations")
assert sol2.status.name == "OPTIMAL"
