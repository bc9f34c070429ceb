"""Scale-out: scenario batching and meshes.

The reference is a single-process shared-memory code (SURVEY.md §2
parallelism table); its pthread/cilk intra-pivot parallelism maps here to
vectorized kernels inside one device program, and the *new* capability —
absent in the reference — is batching thousands of LP instances over a
`jax.sharding.Mesh` ("scenario" axis) with pjit/shard_map.
"""

from .mesh import make_mesh, scenario_sharding  # noqa: F401
from .batch import stack_models, solve_batch_ipm  # noqa: F401
