"""Checkpointing (SURVEY.md §5.4) via orbax.

Improves on the reference's plain ``torch.save(state_dict)``: saves params +
optimizer state + step atomically, supports resume (the reference has no
optimizer/step resume), and is multi-host safe (only process 0 writes
metadata; arrays are written by their owning shards).
"""

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def save_checkpoint(path: str, state, *, force: bool = True) -> None:
    """Save a TrainState (or any pytree) to ``path`` (absolute dir)."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=force)


def _abstract_leaf(x):
    """ShapeDtypeStruct carrying the target leaf's sharding (when it has
    one), so a restore onto mesh-sharded arrays comes back SHARDED — each
    host/device reads only its own shard slices from disk instead of
    materializing the full array and resharding (the multi-chip resume
    path: shard specs first, then restore into them)."""
    if isinstance(x, jax.ShapeDtypeStruct):
        return x
    sharding = getattr(x, "sharding", None)
    if isinstance(sharding, jax.sharding.Sharding):
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)
    import numpy as np
    arr = np.asarray(x)
    return jax.ShapeDtypeStruct(arr.shape, arr.dtype)


def restore_checkpoint(path: str, target=None):
    """Restore; ``target`` (a matching pytree of ShapeDtypeStructs or
    arrays) enables sharded/typed restoration — sharded target leaves
    restore with their shardings preserved."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if target is not None:
            abstract = jax.tree_util.tree_map(_abstract_leaf, target)
            return ckptr.restore(path, abstract)
        return ckptr.restore(path)


def save_params(path: str, params) -> None:
    save_checkpoint(path, params)


def load_params(path: str, target: Optional[Any] = None):
    return restore_checkpoint(path, target)
