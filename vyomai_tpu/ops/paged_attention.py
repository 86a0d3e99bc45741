"""Paged KV attention for the serving engine (reference
``simple_vllm.ipynb``: ``flash_attn_with_kvcache`` + ``block_table`` decode
and ``flash_attn_varlen_func`` prefill — SURVEY.md §2.3 item 3).

Pool layout (TPU-first): one preallocated array per layer

    kv : [num_blocks, 2, block_size, H_kv * head_dim]

(k in row 0, v in row 1; stacked ``[L, ...]`` across layers). The head and
feature dims are flattened into the 128-aligned minor dim so both XLA
scatters and Pallas block DMAs stay tile-aligned, and one DMA per block
fetches k and v together. Block tables are int32 ``[B, max_blocks]``.

``paged_attention_decode`` is the XLA fallback (single gather + masked
attention); ``ops.paged_decode_pallas`` streams blocks HBM->VMEM directly.
"""

import jax
import jax.numpy as jnp

from ..core.masks import NEG_INF  # canonical masking sentinel

_INT8_EPS = 1e-8


def quantize_rows(x):
    """Symmetric per-row int8 quantization. x: [T, W] (any float dtype).
    Returns (q int8 [T, W], scale f32 [T])."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax / 127.0, _INT8_EPS)
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale[:, 0]


def write_kv(pool, k_new, v_new, slot_block, slot_offset, scales=None):
    """Scatter new K/V rows into the pool.

    pool: [NB, 2, BS, width]; k_new/v_new: [T, H_kv, D] (width = H_kv*D);
    slot_block/slot_offset: [T] int32. Rows with slot_block < 0 are dropped.

    Int8 pools quantize each row symmetrically at write time (one f32
    scale per written row, amax/127 over the row's H_kv*D features) into
    the ``scales [NB, 2, BS]`` sidecar; pass it and receive
    ``(pool, scales)`` back.
    """
    t = k_new.shape[0]
    width = pool.shape[-1]
    k_flat = k_new.reshape(t, width)
    v_flat = v_new.reshape(t, width)
    # Invalid rows are redirected OUT OF RANGE (blk = NB) and dropped by the
    # scatter, so a dead lane can never collide with a live lane's write to a
    # real block (duplicate scatter indices have unspecified winner order).
    valid = slot_block >= 0
    blk = jnp.where(valid, slot_block, pool.shape[0])
    if pool.dtype == jnp.int8:
        assert scales is not None, "int8 pool needs its scales sidecar"
        k_q, k_s = quantize_rows(k_flat)
        v_q, v_s = quantize_rows(v_flat)
        pool = pool.at[blk, 0, slot_offset].set(k_q, mode="drop")
        pool = pool.at[blk, 1, slot_offset].set(v_q, mode="drop")
        scales = scales.at[blk, 0, slot_offset].set(k_s, mode="drop")
        scales = scales.at[blk, 1, slot_offset].set(v_s, mode="drop")
        return pool, scales
    pool = pool.at[blk, 0, slot_offset].set(k_flat.astype(pool.dtype),
                                            mode="drop")
    pool = pool.at[blk, 1, slot_offset].set(v_flat.astype(pool.dtype),
                                            mode="drop")
    if scales is not None:
        return pool, scales
    return pool


def gather_kv(pool, tables, h_kv: int, scales=None):
    """Gather a sequence's context from the pool.

    pool: [NB, 2, BS, width]; tables: [MAXB] (clamped >= 0).
    Returns (k, v): [H_kv, MAXB*BS, D] (int8 pools dequantized to f32)."""
    maxb = tables.shape[0]
    nb, _, bs, width = pool.shape
    d = width // h_kv
    kv = pool[tables]                                   # [MAXB, 2, BS, width]
    if pool.dtype == jnp.int8:
        sc = scales[tables]                             # [MAXB, 2, BS]
        kv = kv.astype(jnp.float32) * sc[..., None]
    kv = kv.reshape(maxb, 2, bs, h_kv, d).transpose(1, 3, 0, 2, 4)
    kv = kv.reshape(2, h_kv, maxb * bs, d)
    return kv[0], kv[1]


def paged_attention_decode(q, pool, block_tables, seq_lens, h_kv: int,
                           scales=None, window=None, sinks: int = 0):
    """Single-token decode attention over paged KV (XLA fallback).

    q: [B, H, D]; pool: [NB, 2, BS, width]; block_tables: [B, MAXB] int32
    (-1 for unused); seq_lens: [B] int32. Returns [B, H, D].
    """
    b, h, d = q.shape
    nb, _, bs, width = pool.shape
    maxb = block_tables.shape[1]
    group = h // h_kv

    tables = jnp.where(block_tables < 0, 0, block_tables)
    k, v = jax.vmap(lambda t: gather_kv(pool, t, h_kv, scales))(tables)
    # k, v: [B, H_kv, T, D]
    if group > 1:
        k = jnp.repeat(k, group, axis=1)
        v = jnp.repeat(v, group, axis=1)

    scale = 1.0 / (d ** 0.5)
    scores = jnp.einsum("bhd,bhtd->bht", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    t_pos = jnp.arange(maxb * bs)[None, :]
    valid = t_pos < seq_lens[:, None]
    if window is not None:   # sliding window: only the last ``window`` keys
        band = t_pos >= seq_lens[:, None] - window
        if sinks:             # StreamingLLM: first ``sinks`` stay visible
            band = band | (t_pos < sinks)
        valid = valid & band
    scores = jnp.where(valid[:, None, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bht,bhtd->bhd", probs, v.astype(jnp.float32))
    return out.astype(q.dtype)
