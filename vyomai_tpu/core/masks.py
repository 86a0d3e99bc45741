"""Additive attention-mask builders — the three reference mask recipes plus
the static-cache validity mask that replaces Python-side cache slicing.

Reference recipes rebuilt TPU-first (static shapes, no data-dependent
concats):
- bidirectional pad mask: ``models/encoder.py:156-164``
- causal + start_pos + pad: ``models/decoder.py:376-419`` (create_mask_for_decoder)
- prefix-LM over token_type_ids: ``paligemma.ipynb`` cell 17
  (_update_causal_mask)

All builders return *additive* float masks (0 where attendable, large
negative where masked) broadcastable against attention scores
``[B, H, Lq, Lk]``. ``NEG_INF`` matches ``torch.finfo(float32).min`` used by
the reference so logits parity holds bit-for-bit through the softmax.
"""

import jax.numpy as jnp

# torch.finfo(torch.float32).min — the reference's additive mask constant.
NEG_INF = float(jnp.finfo(jnp.float32).min)


def additive(mask_bool_or_float, dtype=jnp.float32):
    """(1 - m) * finfo.min — converts a {0,1} mask to additive form."""
    m = mask_bool_or_float.astype(dtype)
    return (1.0 - m) * NEG_INF


def bidirectional_mask(attention_mask, dtype=jnp.float32):
    """[B, Lk] pad mask -> additive [B, 1, 1, Lk] (encoder recipe)."""
    return additive(attention_mask[:, None, None, :], dtype)


def banded_causal_mask(seq_len: int, window: int, attention_mask=None,
                       dtype=jnp.float32, sinks: int = 0):
    """Sliding-window causal mask: query i attends keys
    ``(i - window, i]`` (Mistral SWA band) plus the first ``sinks``
    positions (StreamingLLM attention sinks). Optional [B, L] pad mask.
    Returns additive [B|1, 1, L, L]."""
    q_pos = jnp.arange(seq_len)[:, None]
    k_pos = jnp.arange(seq_len)[None, :]
    band = (k_pos <= q_pos) & ((k_pos > q_pos - window) | (k_pos < sinks))
    if attention_mask is not None:
        m = band[None] & (attention_mask[:, None, :] != 0)
        return additive(m[:, None], dtype)
    return additive(band[None, None], dtype)


def causal_mask(seq_len: int, attention_mask=None, start_pos: int = 0,
                batch_size: int = 1, dtype=jnp.float32):
    """Causal mask for a decoder block of ``seq_len`` queries whose first
    query sits at absolute position ``start_pos``; keys cover
    ``[0, start_pos + seq_len)``.

    ``attention_mask``: optional [B, start_pos + seq_len] pad mask.
    Returns additive [B, 1, seq_len, start_pos + seq_len].

    Equivalent to the reference's tril + ones-prepend + pad multiply
    (``models/decoder.py:376-419``) but built from iota comparisons with
    static shapes.
    """
    kv_len = start_pos + seq_len
    q_pos = start_pos + jnp.arange(seq_len)[:, None]      # [Lq, 1] absolute
    k_pos = jnp.arange(kv_len)[None, :]                   # [1, Lk] absolute
    causal = (k_pos <= q_pos)                             # [Lq, Lk]
    if attention_mask is not None:
        m = causal[None, :, :] & (attention_mask[:, None, :] != 0)
        m = m[:, None, :, :]
    else:
        m = jnp.broadcast_to(causal[None, None, :, :],
                             (batch_size, 1, seq_len, kv_len))
    return additive(m, dtype)


def causal_mask_static_kv(seq_len: int, kv_capacity: int, start_pos,
                          attention_mask=None, batch_size: int = 1,
                          dtype=jnp.float32, window=None, sinks: int = 0):
    """Causal mask for queries at ``[start_pos, start_pos + seq_len)`` against
    a full static KV buffer of width ``kv_capacity``.

    Combines the reference's causal+prefix recipe with static-cache validity:
    key j is attendable iff ``j <= start_pos + i`` (prefix + causal) and j is
    not padding. ``start_pos`` may be traced. Returns additive
    [B, 1, seq_len, kv_capacity].

    CONTRACT: ``attention_mask`` covers key positions FROM 0 — i.e. the
    whole context ``[0, start_pos + seq_len)`` — not just the current
    chunk. A shorter mask marks the remaining key positions INVALID (that
    is what prefill wants: keys past the prompt hold no data yet); passing
    a chunk-length mask during chunked cached decode would therefore mask
    out all cached history. Pass None to attend the full valid prefix.
    """
    q_pos = start_pos + jnp.arange(seq_len)[:, None]      # [Lq, 1]
    k_pos = jnp.arange(kv_capacity)[None, :]              # [1, K]
    causal = k_pos <= q_pos                               # [Lq, K]
    if window is not None:
        # sliding-window band: only the last ``window`` positions attend;
        # ``sinks`` initial positions stay attendable (StreamingLLM)
        causal = causal & ((k_pos > q_pos - window) | (k_pos < sinks))
    if attention_mask is not None:
        pad = attention_mask != 0                         # [B, Lpad]
        lpad = pad.shape[-1]
        if lpad < kv_capacity:
            pad = jnp.pad(pad, ((0, 0), (0, kv_capacity - lpad)))
        else:
            pad = pad[:, :kv_capacity]
        m = causal[None, :, :] & pad[:, None, :]
    else:
        m = jnp.broadcast_to(causal[None, :, :],
                             (batch_size, seq_len, kv_capacity))
    return additive(m[:, None, :, :], dtype)


def prefix_lm_mask(seq_len: int, prefix_len, attention_mask=None,
                   batch_size: int = 1, dtype=jnp.float32):
    """Prefix-LM mask: bidirectional attention over positions
    ``< prefix_len`` (image + prompt prefix), causal afterwards.

    ``prefix_len``: scalar or [B] array (may be traced). Matches the
    PaliGemma ``_update_causal_mask`` recipe built from ``token_type_ids``
    (reference ``paligemma.ipynb`` cell 17).
    Returns additive [B, 1, seq_len, seq_len].
    """
    q_pos = jnp.arange(seq_len)[:, None]                  # [L, 1]
    k_pos = jnp.arange(seq_len)[None, :]                  # [1, L]
    causal = k_pos <= q_pos                               # [L, L]
    plen = jnp.reshape(jnp.asarray(prefix_len), (-1, 1, 1))  # [B or 1,1,1]
    in_prefix = k_pos[None, :, :] < plen                  # [B?, L, L]
    m = causal[None, :, :] | in_prefix
    if attention_mask is not None:
        m = m & (attention_mask[:, None, :] != 0)
    m = jnp.broadcast_to(m, (batch_size, seq_len, seq_len))
    return additive(m[:, None, :, :], dtype)
