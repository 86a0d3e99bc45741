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
    local_params: this stage's [L/n, ...] slice."""
    idx = jax.lax.axis_index(axis)
    shift = [(j, j + 1) for j in range(n - 1)]  # no wraparound: fill w/ zeros
    carry = jnp.zeros_like(xs[0])
    outs = jnp.zeros_like(xs)
    zero = jnp.zeros_like(xs[0])

    for t in range(m + n - 1):
        inject = xs[t] if t < m else zero
        inp = jnp.where(idx == 0, inject, carry)
        y = stage_fn(local_params, inp)
        if t >= n - 1:
            keep = jnp.where(idx == n - 1, y, outs[t - (n - 1)])
            outs = outs.at[t - (n - 1)].set(keep)
        if n > 1:
            carry = jax.lax.ppermute(y, axis, shift)

    # only the last stage holds real outputs: mask + psum = broadcast
    outs = jnp.where(idx == n - 1, outs, jnp.zeros_like(outs))
    return jax.lax.psum(outs, axis)
