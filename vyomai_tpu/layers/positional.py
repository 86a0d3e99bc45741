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
from typing import Optional, Tuple

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


def absolute_slice(p, start_pos, length: int, pad_idx=None):
    """Positions [start_pos, start_pos + length) -> [1, length, D].

    ``start_pos`` may be traced; static output shape (TPU-friendly gather).
    ``pad_idx`` replicates the reference's ``nn.Embedding(padding_idx=
    pad_token_id)`` on the POSITION table (``positional_embeddings.py:37``):
    position row ``pad_idx`` never receives gradient (a reference training
    quirk — position ``pad_token_id`` is a real position, but its embedding
    row stays frozen; preserved for gradient parity)."""
    positions = start_pos + jnp.arange(length)
    out = jnp.take(p["weight"], positions, axis=0)
    if pad_idx is not None:
        out = jnp.where((positions == pad_idx)[:, None],
                        jax.lax.stop_gradient(out), out)
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
               dtype=jnp.float32, scaling: Optional[dict] = None):
    """Precompute freqs [1, max_len, head_dim // 2]
    (reference ``RotaryEmbedding.forward``).

    ``scaling`` enables long-context RoPE scaling (HF ``rope_scaling``
    dict convention; beyond the reference):
    - ``{"rope_type": "linear", "factor": f}`` — position interpolation
      (Chen et al. 2023): angles at position p equal unscaled p / f.
    - ``{"rope_type": "dynamic", "factor": f,
       "original_max_position_embeddings": L0}`` — dynamic NTK (HF
      convention): the base rescales with sequence length,
      ``theta * (f * L / L0 - (f - 1)) ** (D / (D - 2))``, and is the
      identity at ``L <= L0``. Static-shape analogue: evaluated once at
      the table length ``max_len`` (the worst case the table must
      cover), so pass ``L0`` (default ``max_len`` — identity) when the
      table extends past the pretrained window.
    - ``{"rope_type": "yarn", "factor": f,
       "original_max_position_embeddings": L0, ...}`` — YaRN (Peng et al.
      2023): per-dimension ramp between interpolated and extrapolated
      inv-freqs; pair with :func:`rope_attention_factor` for the
      attention-temperature mscale the paper prescribes.
    """
    half = jnp.arange(0, head_dim, 2, dtype=jnp.float32)
    inv_freq = 1.0 / (theta ** (half / head_dim))
    if scaling:
        typ = scaling.get("rope_type", scaling.get("type", "linear"))
        factor = float(scaling.get("factor", 1.0))
        if typ == "linear":
            inv_freq = inv_freq / factor
        elif typ in ("dynamic", "ntk"):
            l0 = float(scaling.get("original_max_position_embeddings",
                                   max_len))
            seq_len = max(float(max_len), l0)
            base = theta * (factor * seq_len / l0
                            - (factor - 1.0)) ** (head_dim / (head_dim - 2))
            inv_freq = 1.0 / (base ** (half / head_dim))
        elif typ == "yarn":
            l0 = float(scaling.get("original_max_position_embeddings",
                                   max_len))
            beta_fast = float(scaling.get("beta_fast", 32.0))
            beta_slow = float(scaling.get("beta_slow", 1.0))

            def corr_dim(beta):   # rotations -> dim index (YaRN eq. 17-18)
                return (head_dim
                        * math.log(l0 / (beta * 2 * math.pi))
                        / (2 * math.log(theta)))

            low = max(math.floor(corr_dim(beta_fast)), 0)
            high = min(math.ceil(corr_dim(beta_slow)), head_dim // 2 - 1)
            ramp = jnp.clip((jnp.arange(head_dim // 2, dtype=jnp.float32)
                             - low) / max(high - low, 1e-3), 0.0, 1.0)
            extrapolate = 1.0 - ramp   # 1 where frequencies stay unscaled
            inv_freq = (inv_freq / factor * (1.0 - extrapolate)
                        + inv_freq * extrapolate)
        else:
            raise ValueError(f"unknown rope_type {typ!r} "
                             "(linear | dynamic | yarn)")
    t = jnp.arange(max_len, dtype=jnp.float32)
    freqs = jnp.einsum("i,j->ij", t, inv_freq)
    return freqs.astype(dtype)[None, :, :]


def rope_attention_factor(scaling: Optional[dict]) -> float:
    """YaRN attention-temperature mscale: cos/sin are multiplied by
    ``0.1 * ln(factor) + 1`` (or an explicit ``attention_factor``).
    1.0 for every other (or no) scaling type."""
    if not scaling:
        return 1.0
    typ = scaling.get("rope_type", scaling.get("type", "linear"))
    if typ != "yarn":
        return 1.0
    if "attention_factor" in scaling:
        return float(scaling["attention_factor"])
    return 0.1 * math.log(float(scaling.get("factor", 1.0))) + 1.0


def rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rotary_pos_emb(q, k, freqs, unsqueeze_dim: int = 1,
                         scale: float = 1.0
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """HF-style rotary application. ``freqs``: [1, L, head_dim//2];
    q, k: [B, H, L, D]. ``scale``: YaRN attention mscale multiplying
    cos/sin (:func:`rope_attention_factor`)."""
    emb = jnp.concatenate([freqs, freqs], axis=-1)        # [1, L, D]
    cos = jnp.cos(emb).astype(q.dtype)
    sin = jnp.sin(emb).astype(q.dtype)
    if scale != 1.0:
        cos = cos * jnp.asarray(scale, q.dtype)
        sin = sin * jnp.asarray(scale, q.dtype)
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
