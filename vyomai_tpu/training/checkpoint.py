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


class AsyncCheckpointManager:
    """Non-blocking checkpointing for the training loop (beyond the
    reference's blocking ``torch.save``): ``save`` snapshots device arrays
    and returns — serialization and disk writes run on orbax's background
    thread while the next train steps execute — with keep-last-N retention
    and step-indexed directories.

    Usage::

        with AsyncCheckpointManager(dir, max_to_keep=3) as mgr:
            for step in range(n):
                state, metrics = train_step(state, batch)
                mgr.save(step, state)          # returns immediately
        # context exit waits for in-flight writes
        state = mgr.restore(target=state)      # latest step

    ``save_interval_steps`` rate-limits saves (non-multiple steps are
    no-ops), so the call can sit unconditionally in the loop body.
    """

    def __init__(self, directory: str, *, max_to_keep: int = 3,
                 save_interval_steps: int = 1):
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval_steps,
                enable_async_checkpointing=True))

    def save(self, step: int, state) -> bool:
        """Queue an async save of ``state`` at ``step``. Returns False when
        rate-limited by ``save_interval_steps``."""
        return self._mgr.save(step, args=ocp.args.StandardSave(state))

    def restore(self, step: Optional[int] = None, target=None):
        """Restore ``step`` (default: latest). ``target`` enables
        typed/sharded restoration as in :func:`restore_checkpoint`."""
        if step is None:
            step = self._mgr.latest_step()
            if step is None:
                raise FileNotFoundError("no checkpoint steps saved yet")
        if target is not None:
            abstract = jax.tree_util.tree_map(_abstract_leaf, target)
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(abstract))
        return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        return sorted(self._mgr.all_steps())

    def wait(self) -> None:
        """Block until every queued save has hit disk."""
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
