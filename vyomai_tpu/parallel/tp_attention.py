"""Tensor-parallel attention via ``jax.shard_map``.

GSPMD cannot partition a ``pallas_call``, so under a model-parallel mesh the
flash kernel would otherwise be preceded by head all-gathers. This wrapper
shards q/k/v on the head axis and calls the (flash or XLA) sdpa per shard —
attention is embarrassingly parallel over heads, so no collectives are
needed inside.

Requirements: num_heads (and num_kv_heads for GQA) divisible by the model
axis size; the additive mask must be head-replicated (head dim 1), which is
what all the library mask builders produce.
"""

from functools import partial

import jax
from jax.sharding import Mesh, PartitionSpec as P

from ..layers.attention import sdpa


def sharded_sdpa(mesh: Mesh, q, k, v, mask=None, *, causal: bool = False,
                 axis: str = "model"):
    """sdpa with heads sharded over ``axis``. q: [B,H,Lq,D];
    k, v: [B,H_kv,Lk,D]; mask: additive [B,1,Lq,Lk] or None (replicated)."""
    n = mesh.shape[axis]
    assert q.shape[1] % n == 0, "num_heads must divide the model axis"
    assert k.shape[1] % n == 0, "num_kv_heads must divide the model axis"
    head_spec = P(None, axis, None, None)

    # check_vma=False: the per-shard sdpa may lower to the Pallas flash
    # kernel, whose outputs carry no varying-mesh-axes type (CLAUDE.md) —
    # shard_map's default typecheck rejects it
    if mask is None:
        fn = jax.shard_map(
            partial(sdpa, causal=causal), mesh=mesh,
            in_specs=(head_spec, head_spec, head_spec),
            out_specs=head_spec, check_vma=False)
        return fn(q, k, v)
    fn = jax.shard_map(
        lambda q_, k_, v_, m_: sdpa(q_, k_, v_, m_, causal=causal),
        mesh=mesh, in_specs=(head_spec, head_spec, head_spec, P()),
        out_specs=head_spec, check_vma=False)
    return fn(q, k, v, mask)
