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


# ---------------------------------------------------------------------------
# Int4 KV pool (quarter the bytes of bf16, 4x the block capacity)
#
# Packing is PER-HEAD-LOCAL SPLIT-HALVES: within head g's D features, packed
# byte j (of the head's D/2 bytes) holds feature d=j in its LOW nibble and
# feature d=j+D/2 in its HIGH nibble. Two consequences:
# - each kv head owns a CONTIGUOUS D/2-byte span of the packed width, so a
#   tensor-parallel split of the packed pool on the width axis still lands
#   on head boundaries (same property as the int8/bf16 layouts);
# - unpacking (lo, hi) then CONCATENATING along the feature axis yields the
#   features in "pi order" — all low-half features head-major, then all
#   high-half features — which is a fixed permutation the Pallas kernel
#   compensates for by permuting q the same way (no in-kernel lane
#   interleave, the thing Mosaic relayouts make expensive).
#
# Scales are per (row, head) — amax over the head's D features / 7 — four to
# eight times finer than the int8 pool's per-row scale, which is what keeps
# 15-level int4 usable for KV. Sidecar: [NB, 2, H_kv, BS] f32 — BS minor,
# because the kernel keeps the whole sidecar VMEM-resident and a minor dim
# of H_kv would pad to 128 lanes (32x inflation at H_kv=4 — measured VMEM
# OOM). The int8 pool's sidecar is [NB, 2, BS]; every consumer
# discriminates int4-vs-int8 by ndim, so the plumbing (engine ->
# paged_model scan -> ops) is shared.
# ---------------------------------------------------------------------------

_INT4_EPS = 1e-8


def pack_int4_rows(q4, h_kv: int):
    """Pack int4 values (int32, in [-8, 7]) [T, H_kv*D] -> int8
    [T, H_kv*D/2], per-head-local split-halves (see header comment)."""
    t, width = q4.shape
    d = width // h_kv
    x = q4.reshape(t, h_kv, d)
    lo, hi = x[..., :d // 2], x[..., d // 2:]
    packed = hi * 16 + (lo & 15)            # exact int8 range [-128, 127]
    return packed.reshape(t, width // 2).astype(jnp.int8)


def unpack_int4_rows(p8, h_kv: int):
    """Inverse of :func:`pack_int4_rows`: int8 [..., W/2] -> int32
    [..., W] in NATURAL feature order (XLA path; the Pallas kernel keeps
    pi order instead and permutes q)."""
    p32 = p8.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(p32, 28), 28)
    hi = jnp.right_shift(jnp.left_shift(p32, 24), 28)
    lead = p8.shape[:-1]
    half = p8.shape[-1] // h_kv             # D/2
    lo = lo.reshape(*lead, h_kv, half)
    hi = hi.reshape(*lead, h_kv, half)
    return jnp.concatenate([lo, hi], axis=-1).reshape(
        *lead, 2 * p8.shape[-1])


def quantize_rows_int4(x, h_kv: int):
    """Symmetric per-(row, head) int4 quantization + packing.

    x: [T, H_kv*D] float. Returns (packed int8 [T, H_kv*D/2],
    scale f32 [T, H_kv])."""
    t, width = x.shape
    d = width // h_kv
    xf = x.astype(jnp.float32).reshape(t, h_kv, d)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax / 7.0, _INT4_EPS)
    q = jnp.clip(jnp.round(xf / scale), -7, 7).astype(jnp.int32)
    return (pack_int4_rows(q.reshape(t, width), h_kv),
            scale[..., 0])


def write_kv(pool, k_new, v_new, slot_block, slot_offset, scales=None):
    """Scatter new K/V rows into the pool.

    pool: [NB, 2, BS, width]; k_new/v_new: [T, H_kv, D] (width = H_kv*D);
    slot_block/slot_offset: [T] int32. Rows with slot_block < 0 are dropped.

    Int8 pools quantize each row symmetrically at write time (one f32
    scale per written row, amax/127 over the row's H_kv*D features) into
    the ``scales [NB, 2, BS]`` sidecar; pass it and receive
    ``(pool, scales)`` back. Int4 pools (``scales [NB, 2, H_kv, BS]``,
    pool holding H_kv*D/2 packed bytes per row) quantize per (row, head)
    — amax/7 over each head's D features — and pack via
    :func:`pack_int4_rows`.
    """
    t = k_new.shape[0]
    width = k_new.shape[1] * k_new.shape[2]   # H_kv*D (pool holds width/2
    k_flat = k_new.reshape(t, width)          # bytes when int4-packed)
    v_flat = v_new.reshape(t, width)
    # Invalid rows are redirected OUT OF RANGE (blk = NB) and dropped by the
    # scatter, so a dead lane can never collide with a live lane's write to a
    # real block (duplicate scatter indices have unspecified winner order).
    valid = slot_block >= 0
    blk = jnp.where(valid, slot_block, pool.shape[0])
    if scales is not None and scales.ndim == 4:   # int4: [NB, 2, H_kv, BS]
        # (BS minor, H_kv second-minor: the kernel keeps the whole sidecar
        # VMEM-resident, and a minor dim of H_kv would pad to 128 lanes —
        # 32x inflation at H_kv=4, measured as a VMEM OOM at NB=1024)
        h_kv = k_new.shape[1]
        k_q, k_s = quantize_rows_int4(k_flat, h_kv)
        v_q, v_s = quantize_rows_int4(v_flat, h_kv)
        pool = pool.at[blk, 0, slot_offset].set(k_q, mode="drop")
        pool = pool.at[blk, 1, slot_offset].set(v_q, mode="drop")
        scales = scales.at[blk, 0, :, slot_offset].set(k_s, mode="drop")
        scales = scales.at[blk, 1, :, slot_offset].set(v_s, mode="drop")
        return pool, scales
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

    pool: [NB, 2, BS, width] (width/2 bytes for int4-packed pools);
    tables: [MAXB] (clamped >= 0). Returns (k, v): [H_kv, MAXB*BS, D]
    (quantized pools dequantized to f32)."""
    maxb = tables.shape[0]
    nb, _, bs, width = pool.shape
    kv = pool[tables]                                   # [MAXB, 2, BS, width]
    if scales is not None and scales.ndim == 4:         # int4 pool
        sc = scales[tables]                             # [MAXB, 2, H_kv, BS]
        kv = unpack_int4_rows(kv, h_kv).astype(jnp.float32)
        d = (2 * width) // h_kv
        kv = kv.reshape(maxb, 2, bs, h_kv, d) * \
            sc.transpose(0, 1, 3, 2)[..., None]
    else:
        d = width // h_kv
        if pool.dtype == jnp.int8:
            sc = scales[tables]                         # [MAXB, 2, BS]
            kv = kv.astype(jnp.float32) * sc[..., None]
        kv = kv.reshape(maxb, 2, bs, h_kv, d)
    kv = kv.transpose(1, 3, 0, 2, 4).reshape(2, h_kv, maxb * bs, d)
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
