"""Paged KV attention for the serving engine (reference
``simple_vllm.ipynb``: ``flash_attn_with_kvcache`` + ``block_table`` decode
and ``flash_attn_varlen_func`` prefill — SURVEY.md §2.3 item 3).

TPU-first: the KV pool is one preallocated array per tensor
``[num_blocks, block_size, H_kv, D]`` (stacked ``[L, ...]`` across layers);
block tables are int32 ``[B, max_blocks]``. The decode attention gathers a
sequence's blocks with one XLA gather (static max context) and runs a
masked single-query attention — fully jittable, no recompiles as batch
composition changes. (A scalar-prefetch Pallas variant that DMAs only live
blocks is the planned upgrade; the gather version is already
HBM-bandwidth-bound like dense decode.)
"""

import jax
import jax.numpy as jnp

NEG_INF = float(jnp.finfo(jnp.float32).min)


def write_kv(pool_k, pool_v, k_new, v_new, slot_block, slot_offset):
    """Scatter new K/V rows into the pool.

    pool_k/pool_v: [NB, BS, H_kv, D]; k_new/v_new: [T, H_kv, D];
    slot_block/slot_offset: [T] int32 (block index and in-block offset per
    token). Rows with slot_block < 0 are dropped (padding).
    """
    valid = slot_block >= 0
    nb = pool_k.shape[0]
    blk = jnp.where(valid, slot_block, nb - 1)  # dummy target, masked below
    k_new = jnp.where(valid[:, None, None], k_new, pool_k[blk, slot_offset])
    v_new = jnp.where(valid[:, None, None], v_new, pool_v[blk, slot_offset])
    pool_k = pool_k.at[blk, slot_offset].set(k_new)
    pool_v = pool_v.at[blk, slot_offset].set(v_new)
    return pool_k, pool_v


def paged_attention_decode(q, pool_k, pool_v, block_tables, seq_lens):
    """Single-token decode attention over paged KV.

    q: [B, H, D]; pool_k/pool_v: [NB, BS, H_kv, D];
    block_tables: [B, MAXB] int32 (-1 for unused);
    seq_lens: [B] int32 (valid context length incl. current token).
    Returns [B, H, D].
    """
    b, h, d = q.shape
    nb, bs, h_kv, _ = pool_k.shape
    maxb = block_tables.shape[1]
    group = h // h_kv

    tables = jnp.where(block_tables < 0, 0, block_tables)
    # gather: [B, MAXB, BS, H_kv, D] -> [B, MAXB*BS, H_kv, D]
    k = pool_k[tables].reshape(b, maxb * bs, h_kv, d)
    v = pool_v[tables].reshape(b, maxb * bs, h_kv, d)

    k = k.transpose(0, 2, 1, 3)                     # [B, H_kv, T, D]
    v = v.transpose(0, 2, 1, 3)
    if group > 1:
        k = jnp.repeat(k, group, axis=1)
        v = jnp.repeat(v, group, axis=1)

    scale = 1.0 / (d ** 0.5)
    scores = jnp.einsum("bhd,bhtd->bht", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    t_pos = jnp.arange(maxb * bs)[None, :]
    valid = t_pos < seq_lens[:, None]
    scores = jnp.where(valid[:, None, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bht,bhtd->bhd", probs, v.astype(jnp.float32))
    return out.astype(q.dtype)
