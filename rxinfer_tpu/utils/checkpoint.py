"""Checkpoint / resume of inference state (SURVEY.md §5: the reference has no
checkpoint subsystem; its idiomatic substitute is the posteriors→priors
autoupdates state, "trivially serializable" — here made explicit: any posterior
dict / autoupdates args / engine state is a pytree checkpointable to disk).

Default backend is a portable pickle of (host numpy leaves, treedef) — exact
pytree round-trip including distribution classes.  ``backend="orbax"`` uses
orbax-checkpoint for multi-host / async settings; restoring then requires a
``like`` pytree for the structure.
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import numpy as np


def _to_host(tree):
    return jax.tree_util.tree_map(lambda a: np.asarray(a), tree)


def save_checkpoint(path: str, state: Any, backend: str = "pickle") -> None:
    """Serialize a pytree of distributions / arrays (posteriors, streaming-engine
    args, sharded training state, ...)."""
    if backend == "orbax":
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.abspath(path), _to_host(state), force=True)
        return
    leaves, treedef = jax.tree_util.tree_flatten(_to_host(state))
    with open(path, "wb") as f:
        pickle.dump({"leaves": leaves, "treedef": treedef}, f)


def load_checkpoint(path: str, like: Any = None) -> Any:
    """Load a checkpoint saved by save_checkpoint.  Directories are treated as
    orbax checkpoints (``like`` gives the target structure)."""
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        if like is not None:
            return ckptr.restore(os.path.abspath(path), item=_to_host(like))
        return ckptr.restore(os.path.abspath(path))
    with open(path, "rb") as f:
        payload = pickle.load(f)
    return jax.tree_util.tree_unflatten(payload["treedef"], payload["leaves"])
