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


def restore_checkpoint(path: str, target=None):
    """Restore; ``target`` (a matching pytree of ShapeDtypeStructs or
    arrays) enables sharded/typed restoration."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if target is not None:
            abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct
                                              if hasattr(ocp.utils, "to_shape_dtype_struct")
                                              else (lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)),
                                              target)
            return ckptr.restore(path, abstract)
        return ckptr.restore(path)


def save_params(path: str, params) -> None:
    save_checkpoint(path, params)


def load_params(path: str, target: Optional[Any] = None):
    return restore_checkpoint(path, target)
