"""Ring attention: sequence-parallel attention over a mesh axis
(SURVEY.md §5.7 names this as the long-context extension point beyond the
reference's capabilities).

Each device holds a sequence shard of q/k/v ``[B, H, L/n, D]``. KV shards
rotate around the ring with ``lax.ppermute`` (ICI neighbor exchange) while
each device folds the visiting block into an online-softmax accumulator —
attention over sequences n x longer than one chip's memory, with
communication overlapped across ring steps. Causality is enforced from
global positions (shard index x shard length + offset).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core.masks import NEG_INF  # canonical masking sentinel


def _ring_body(q, k, v, *, axis: str, n: int, causal: bool, scale: float):
    """Per-shard body (runs under shard_map). q/k/v: [B, H, Lc, D] local.

    The local shard is folded first, then the loop rotates n-1 times —
    no wasted final exchange. Under ``causal``, a visiting shard that sits
    entirely in this shard's future (``src > idx``) is skipped via
    ``lax.cond`` (its probabilities are exactly zero), saving ~half the
    attention FLOPs across the ring; the predicate is device-local and the
    ppermutes stay outside the cond, so every device still participates in
    every collective."""
    idx = jax.lax.axis_index(axis)
    b, h, lc, d = q.shape
    q32 = q.astype(jnp.float32) * scale
    q_pos = idx * lc + jnp.arange(lc)                     # [Lc] global
    perm = [(j, (j + 1) % n) for j in range(n)]

    def fold(carry, kc, vc, src):
        def compute(carry):
            m, l, acc = carry
            s = jnp.einsum("bhqd,bhkd->bhqk", q32, kc.astype(jnp.float32))
            if causal:
                k_pos = src * lc + jnp.arange(lc)         # [Lc] global
                mask = jnp.where(k_pos[None, :] <= q_pos[:, None], 0.0,
                                 NEG_INF)
                s = s + mask[None, None]
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(jnp.maximum(m, m_cur), -1e30)
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m - m_new)
            l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
            acc_new = acc * alpha + jnp.einsum(
                "bhqk,bhkd->bhqd", p, vc.astype(jnp.float32))
            return m_new, l_new, acc_new
        if not causal:
            return compute(carry)
        # fully-future shard: p would be exactly 0 — skip the matmuls
        return jax.lax.cond(src > idx, lambda c: c, compute, carry)

    m0 = jnp.full((b, h, lc, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, h, lc, 1), jnp.float32)
    a0 = jnp.zeros((b, h, lc, d), jnp.float32)
    # mark the accumulators as shard-varying so the loop carry typechecks
    # under shard_map's varying-manual-axes tracking
    m0, l0, a0 = jax.tree_util.tree_map(
        lambda x: jax.lax.pcast(x, (axis,), to="varying"), (m0, l0, a0))
    carry = fold((m0, l0, a0), k, v, idx)                 # own shard first

    def step(i, state):
        m, l, acc, kc, vc = state
        kc = jax.lax.ppermute(kc, axis, perm)
        vc = jax.lax.ppermute(vc, axis, perm)
        src = (idx - i) % n                               # owner of kc/vc
        m, l, acc = fold((m, l, acc), kc, vc, src)
        return m, l, acc, kc, vc

    m, l, acc, _, _ = jax.lax.fori_loop(1, n, step, (*carry, k, v))
    l_safe = jnp.where(l == 0.0, 1.0, l)
    return (acc / l_safe).astype(q.dtype)


def ring_attention(q, k, v, *, mesh: Mesh, axis: str = "sp",
                   causal: bool = False):
    """q, k, v: [B, H, L, D] with L divisible by the ``axis`` size.
    Returns [B, H, L, D]; inputs/outputs sequence-sharded over ``axis``."""
    n = mesh.shape[axis]
    scale = 1.0 / (q.shape[-1] ** 0.5)
    spec = P(None, None, axis, None)
    fn = jax.shard_map(
        partial(_ring_body, axis=axis, n=n, causal=causal, scale=scale),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)
    return fn(q, k, v)
