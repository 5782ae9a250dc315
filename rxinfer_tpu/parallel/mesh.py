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


def make_hybrid_mesh(
    n_hosts: Optional[int] = None,
    axis_names: tuple = ("host", "batch"),
) -> Mesh:
    """Two-level mesh with a slow DCN axis across hosts and a fast ICI axis
    within each host (the scaling-book recipe: data-parallel batch work rides
    ICI inside a slice; only the small conjugate-statistics reductions cross
    the DCN axis).

    On a real multi-host deployment (``jax.process_count() > 1``) the device
    grid is built with ``mesh_utils.create_hybrid_device_mesh`` so the first
    axis maps exactly onto host boundaries.  Single-process runs (tests, the
    virtual-CPU harness) emulate the topology by factoring the flat device
    list — collectives are then identical modulo wire speed."""
    devs = jax.devices()
    if jax.process_count() > 1:
        from jax.experimental import mesh_utils

        per_host = len(devs) // jax.process_count()
        grid = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1, per_host),
            dcn_mesh_shape=(jax.process_count(), 1),
        )
        return Mesh(grid, axis_names)
    n = len(devs)
    hosts = n_hosts or (2 if n % 2 == 0 and n > 1 else 1)
    if n % hosts != 0:
        raise ValueError(f"{n} devices cannot be split into {hosts} host groups")
    grid = np.asarray(devs).reshape(hosts, n // hosts)
    return Mesh(grid, axis_names)


def shard_batch(mesh: Mesh, tree, axis_name: str = "batch"):
    """Place a pytree with leading batch axis across the mesh's batch axis."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), tree)
