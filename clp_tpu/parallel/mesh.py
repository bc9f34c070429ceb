"""Mesh construction and sharding helpers.

Axes (SURVEY.md §5 distributed design): "scenario" shards independent LP
instances; "block" (later rounds) shards column blocks of one huge LP for
sprint/Dantzig-Wolfe-style decomposition.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence] = None, axis_name: str = "scenario"
) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devs), (axis_name,))


def scenario_sharding(mesh: Mesh, axis_name: str = "scenario") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh; replicate the rest."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
