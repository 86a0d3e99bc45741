"""Positional embeddings: absolute (learned), sinusoidal, RoPE, ViT absolute.

Numerics mirror the reference exactly:
- AbsoluteEncoding: learned table, decoder slices [start_pos : start_pos+L]
  (reference ``layers/positional_embeddings.py:7-51``).
- SinusoidalEncoding: interleaved sin(even)/cos(odd) with
  ``div_term = exp(arange(0, d, 2) * -(ln 10000 / d))``
  (reference ``positional_embeddings.py:54-106``).
- RoPE: ``inv_freq = 1/10000^(2i/d)`` over head_dim, ``freqs = outer(t, inv)``,
  applied HF-style with ``emb = cat(freqs, freqs)`` and half-rotation
  (reference ``positional_embeddings.py:109-182``).
- VitAbsoluteEncoding: learned [1, num_patches+1, D] parameter
  (reference ``positional_embeddings.py:188-226``).

Tables that are pure functions of the config (sinusoidal, RoPE freqs) are
precomputed as constants, not params, so they fold into the jitted graph.
"""

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from ..core import nn as cnn


# ---------------------------------------------------------------------------
# Absolute (learned)
# ---------------------------------------------------------------------------

def absolute_init(key, config, dtype=jnp.float32):
    return cnn.embedding_init(
        key, config.max_position_embeddings, config.hidden_size,
        std=config.initializer_range, dtype=dtype)


def absolute_slice(p, start_pos, length: int):
    """Positions [start_pos, start_pos + length) -> [1, length, D].

    ``start_pos`` may be traced; static output shape (TPU-friendly gather).
    """
    out = jnp.take(p["weight"], start_pos + jnp.arange(length), axis=0)
    return out[None, :, :]


# ---------------------------------------------------------------------------
# Sinusoidal (constant)
# ---------------------------------------------------------------------------

def sinusoidal_table(max_len: int, dim: int, dtype=jnp.float32):
    if dim % 2 != 0:
        raise ValueError(f"SinusoidalEncoding requires even hidden dim, got {dim}")
    pos = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div = jnp.exp(jnp.arange(0, dim, 2, dtype=jnp.float32) * -(math.log(10000.0) / dim))
    tab = jnp.zeros((max_len, dim), dtype=jnp.float32)
    tab = tab.at[:, 0::2].set(jnp.sin(pos * div))
    tab = tab.at[:, 1::2].set(jnp.cos(pos * div))
    return tab.astype(dtype)[None, :, :]  # [1, max_len, D]


# ---------------------------------------------------------------------------
# RoPE
# ---------------------------------------------------------------------------

def rope_freqs(max_len: int, head_dim: int, theta: float = 10000.0,
               dtype=jnp.float32):
    """Precompute freqs [1, max_len, head_dim // 2]
    (reference ``RotaryEmbedding.forward``)."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    t = jnp.arange(max_len, dtype=jnp.float32)
    freqs = jnp.einsum("i,j->ij", t, inv_freq)
    return freqs.astype(dtype)[None, :, :]


def rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rotary_pos_emb(q, k, freqs, unsqueeze_dim: int = 1
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """HF-style rotary application. ``freqs``: [1, L, head_dim//2];
    q, k: [B, H, L, D]."""
    emb = jnp.concatenate([freqs, freqs], axis=-1)        # [1, L, D]
    cos = jnp.cos(emb).astype(q.dtype)
    sin = jnp.sin(emb).astype(q.dtype)
    cos = jnp.expand_dims(cos, unsqueeze_dim)             # [1, 1, L, D]
    sin = jnp.expand_dims(sin, unsqueeze_dim)
    q_out = q * cos + rotate_half(q) * sin
    k_out = k * cos + rotate_half(k) * sin
    return q_out, k_out


# ---------------------------------------------------------------------------
# ViT absolute (learned [1, P+1, D])
# ---------------------------------------------------------------------------

def vit_absolute_init(key, num_positions: int, dim: int, dtype=jnp.float32):
    return {"pos_embeddings": jax.random.normal(key, (1, num_positions, dim)).astype(dtype)}


def vit_absolute_add(p, img_seq):
    n = img_seq.shape[1]
    return img_seq + p["pos_embeddings"][:, :n]
