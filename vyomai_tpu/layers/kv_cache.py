"""KV caches, TPU-first.

The reference ships four cache variants (``VyomAI/layers/kv_cache.py``):
concat-grow ``DynamicCache``/``DynamicCacheOne`` and preallocated
``StaticCache``/``StaticCacheOne``. Under XLA only the static design is
jittable (dynamic concat changes shapes every step), so here the static
layout is the one true device cache:

    k, v : [num_layers, batch, num_kv_heads, max_len, head_dim]

stored as a plain dict pytree ``{"k": ..., "v": ..., "length": int32[]}``
that threads through ``lax.scan`` over layers and ``lax.while_loop`` decode.
``length`` tracks the number of valid positions (the reference's
``start_pos + seqlen`` slice bound) — attention masks positions beyond it,
which is numerically identical to the reference's Python-side slicing.

``DynamicCacheOne``/``DynamicCache`` names are kept as aliases of the static
builders for API compatibility; the concat-grow behavior is intentionally
not replicated on device (documented deviation — it cannot be expressed
with static shapes, and the static cache subsumes it).

Speculative-decoding rollback (reference ``speculative_decoding.py:52-71``)
is a free ``length`` rewind here: stale tail entries are masked out by the
validity mask, so no zeroing pass is needed.
"""

from typing import Optional

import jax.numpy as jnp


def init_cache(config, *, batch_size: int = 1, max_len: Optional[int] = None,
               dtype=jnp.float32, num_layers: Optional[int] = None,
               num_kv_heads: Optional[int] = None,
               head_dim: Optional[int] = None):
    """Create a zeroed static KV cache pytree."""
    if head_dim is None:
        head_dim = getattr(config, "head_dim", None) or (
            config.hidden_size // config.num_attention_heads)
    if num_kv_heads is None:
        num_kv_heads = getattr(config, "num_key_value_heads", None) or \
            config.num_attention_heads
    if num_layers is None:
        num_layers = config.num_hidden_layers
    if max_len is None:
        max_len = config.max_position_embeddings
    shape = (num_layers, batch_size, num_kv_heads, max_len, head_dim)
    return {
        "k": jnp.zeros(shape, dtype=dtype),
        "v": jnp.zeros(shape, dtype=dtype),
        "length": jnp.zeros((), dtype=jnp.int32),
    }


def cache_max_len(cache) -> int:
    return cache["k"].shape[3]


def with_length(cache, length):
    return {**cache, "length": jnp.asarray(length, dtype=jnp.int32)}


def trim(cache, num_tokens_to_discard):
    """Rollback: drop the trailing ``num_tokens_to_discard`` positions.

    Replaces the reference's ``trim_dynamic_cache`` (tail slice) /
    ``trim_static_cache`` (tail zeroing). With validity-masked attention the
    rewind of ``length`` alone is sufficient and free.
    """
    return with_length(cache, jnp.maximum(cache["length"] - num_tokens_to_discard, 0))


# ---------------------------------------------------------------------------
# API-compat aliases (reference public names)
# ---------------------------------------------------------------------------

class StaticCacheOne:
    """All-layers static cache, reference-compatible constructor
    (``kv_cache.py:255-377``). Thin wrapper over the pytree builder."""

    def __init__(self, config, max_cache_len: Optional[int] = None,
                 dtype=jnp.float32, batch_size: int = 1,
                 is_gqa: bool = False):
        self.data = init_cache(config, batch_size=batch_size,
                               max_len=max_cache_len, dtype=dtype)

    def pytree(self):
        return self.data


# The dynamic variants are aliases: on TPU the static cache subsumes them.
DynamicCacheOne = StaticCacheOne
StaticCache = StaticCacheOne
DynamicCache = StaticCacheOne
