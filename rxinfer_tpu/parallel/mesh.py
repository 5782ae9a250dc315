"""Device-mesh utilities for sharded inference.

The reference has no distributed execution at all (SURVEY.md §2.3); this module
is the TPU-native scaling tier mandated by BASELINE.json: batched independent
factor graphs sharded over chips (DP), shared-parameter message aggregation as
``psum`` (conjugate natural-parameter additivity), and time-blocked chains.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "batch") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis,))


def shard_batch(mesh: Mesh, tree, axis_name: str = "batch"):
    """Place a pytree with leading batch axis across the mesh's batch axis."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), tree)
