"""Pipeline parallelism: GPipe schedule over a ``pp`` mesh axis.

The reference has no pipeline parallelism (SURVEY §2.4 — DP only); this is
a TPU-native scaling extension in the spirit of the rest of ``parallel/``:
express the schedule as SPMD + collectives and let XLA overlap the
``ppermute`` activation handoffs with compute on ICI.

Design (the scan/shift pattern): the layer stack's *stacked* parameters
``[L, ...]`` are sharded on the layer dimension across ``n`` pipeline
stages, so every device holds ``L/n`` contiguous layers and runs the SAME
program. Microbatches are injected at stage 0; after each tick every
stage's activation shifts one stage rightward (``lax.ppermute`` with no
wraparound — devices with no source receive zeros, which is exactly what
the fill phase needs). After ``M + n - 1`` ticks the last stage has emitted
every microbatch; its outputs are broadcast with a masked ``psum``.

The schedule is differentiable end-to-end: ``ppermute`` transposes to the
reverse shift, so the backward pipeline (right-to-left activation-gradient
flow) falls out of autodiff — no hand-written 1F1B machinery. Bubble
fraction is the usual ``(n-1) / (M + n-1)``; raise ``num_microbatches`` to
amortize it.
"""

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stage_params_sharding(mesh: Mesh, axis: str = "pp"):
    """NamedSharding that splits a stacked ``[L, ...]`` layer pytree across
    pipeline stages (layer dim 0 over ``axis``)."""
    return NamedSharding(mesh, P(axis))


def pipeline_apply(stage_fn: Callable, layer_params, x, *, mesh: Mesh,
                   axis: str = "pp", num_microbatches: int):
    """Run ``x`` through a layer stack pipelined over ``mesh[axis]``.

    stage_fn(local_layer_params, h) -> h
        applies one stage's local layers (e.g. a ``lax.scan`` over the
        ``L/n`` local stacked layers); must preserve ``h``'s shape.
    layer_params
        stacked ``[L, ...]`` pytree with ``L`` divisible by the stage
        count (sharded on dim 0, or shardable — ``shard_map`` splits it).
    x : [B, ...]
        global activations, ``B`` divisible by ``num_microbatches``.

    Returns ``[B, ...]``, replicated over ``axis``. Differentiable.
    """
    n = mesh.shape[axis]
    m = num_microbatches
    b = x.shape[0]
    assert b % m == 0, f"batch {b} not divisible by {m} microbatches"
    xs = x.reshape(m, b // m, *x.shape[1:])

    body = partial(_pipeline_body, stage_fn, axis=axis, n=n, m=m)
    fn = jax.shard_map(body, mesh=mesh, in_specs=(P(axis), P()),
                       out_specs=P())
    out = fn(layer_params, xs)
    return out.reshape(b, *x.shape[1:])


def _pipeline_body(stage_fn, local_params, xs, *, axis: str, n: int, m: int):
    """Per-stage body (under shard_map). xs: [M, mb, ...] replicated;
    local_params: this stage's [L/n, ...] slice.

    The tick loop is a ``fori_loop`` (lowered to scan — differentiable), so
    the compiled program contains ONE stage_fn application regardless of
    ``num_microbatches`` — raising M to shrink the bubble does not grow
    compile time."""
    idx = jax.lax.axis_index(axis)
    shift = [(j, j + 1) for j in range(n - 1)]  # no wraparound: fill w/ zeros
    zero = jnp.zeros_like(xs[0])

    def tick(t, carry):
        act, outs = carry
        inject = jnp.where(
            t < m,
            jax.lax.dynamic_index_in_dim(xs, jnp.minimum(t, m - 1), 0,
                                         keepdims=False),
            zero)
        inp = jnp.where(idx == 0, inject, act)
        y = stage_fn(local_params, inp)
        # collect y into outs[t - (n-1)] once the pipeline is full; earlier
        # ticks write back the existing row (no-op)
        o_idx = jnp.clip(t - (n - 1), 0, m - 1)
        cur = jax.lax.dynamic_index_in_dim(outs, o_idx, 0, keepdims=False)
        row = jnp.where(t >= n - 1, y, cur)
        outs = jax.lax.dynamic_update_index_in_dim(outs, row, o_idx, 0)
        if n > 1:
            y = jax.lax.ppermute(y, axis, shift)
        return (y, outs)

    carry = (zero, jnp.zeros_like(xs))
    # mark carries shard-varying so the loop typechecks under shard_map's
    # varying-manual-axes tracking (ppermute outputs are device-varying)
    carry = jax.tree_util.tree_map(
        lambda x: jax.lax.pcast(x, (axis,), to="varying"), carry)
    _, outs = jax.lax.fori_loop(0, m + n - 1, tick, carry)

    # only the last stage holds real outputs: mask + psum = broadcast
    outs = jnp.where(idx == n - 1, outs, jnp.zeros_like(outs))
    return jax.lax.psum(outs, axis)
