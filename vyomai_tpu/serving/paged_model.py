"""Device-side paged-KV model execution for the serving engine.

Adapts a modern-layer CLM (``models.qwen.ModelForCausalLM`` params layout)
to paged KV: prefill writes the prompt's K/V into pool blocks and attends
over cached-prefix + suffix; decode is a batched single-token step with
``ops.paged_attention.paged_attention_decode``.

Static shapes throughout: prefill is bucketed by (padded) suffix length,
decode runs a fixed max batch with invalid lanes masked — batch composition
changes never trigger recompiles (SURVEY.md §7 hard part #2).
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..core import nn as cnn
from ..layers.modern import swiglu_apply
from ..layers.positional import rotate_half
from ..ops.paged_attention import (gather_kv, paged_attention_decode,
                                   write_kv, NEG_INF)
from ..ops import paged_decode_pallas


def init_pool(config, num_blocks: int, block_size: int, dtype=jnp.bfloat16):
    """Combined K/V pool: [L, NB, 2, BS, H_kv * D] (k row 0, v row 1)."""
    width = config.num_key_value_heads * config.head_dim
    shape = (config.num_hidden_layers, num_blocks, 2, block_size, width)
    return {"kv": jnp.zeros(shape, dtype=dtype)}


def _rope_at(emb_freq, positions, x_q, x_k):
    """Apply RoPE at explicit ``positions`` [T]. x: [H, T, D]."""
    freqs = jnp.take(emb_freq[0], positions, axis=0)      # [T, D/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)[None]  # [1, T, D]
    cos = jnp.cos(emb).astype(x_q.dtype)
    sin = jnp.sin(emb).astype(x_q.dtype)
    q = x_q * cos + rotate_half(x_q) * sin
    k = x_k * cos + rotate_half(x_k) * sin
    return q, k


def _qkv(lp, cfg, hidden):
    """hidden: [T, Dm] -> q [H, T, D], k/v [Hkv, T, D] (with QK-norm)."""
    t = hidden.shape[0]
    nh, nkv, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                   cfg.head_dim)
    q = cnn.linear(lp["self_attn"]["q_proj"], hidden).reshape(t, nh, hd)
    k = cnn.linear(lp["self_attn"]["k_proj"], hidden).reshape(t, nkv, hd)
    v = cnn.linear(lp["self_attn"]["v_proj"], hidden).reshape(t, nkv, hd)
    if "q_norm" in lp["self_attn"]:
        q = cnn.rms_norm(lp["self_attn"]["q_norm"], q, eps=cfg.rms_norm_eps)
        k = cnn.rms_norm(lp["self_attn"]["k_norm"], k, eps=cfg.rms_norm_eps)
    return (q.transpose(1, 0, 2), k.transpose(1, 0, 2), v.transpose(1, 0, 2))


@partial(jax.jit, static_argnums=(0, 1), donate_argnums=(3,))
def prefill(model, plus_one: bool, params, pool, ids, positions,
            slot_blocks, slot_offsets, block_table, ctx_len, true_len):
    """Single-sequence prefill of the uncached prompt suffix.

    ids: [T_pad] (padded bucket); positions: [T_pad] absolute positions
    (cached_len + i, clamped); slot_blocks/slot_offsets: [T_pad] pool write
    targets (-1 for padding); block_table: [MAXB]; ctx_len: scalar total
    context after this prefill (= cached + true_len); true_len: scalar
    number of real suffix tokens. Returns (last-token logits [V], pool).
    """
    cfg = model.config
    emb_freq = model.emb_freq
    t_pad = ids.shape[0]
    hidden = cnn.embedding(params["embed_tokens"], ids[None])[0]
    if hasattr(cfg, "hidden_size") and plus_one:  # gemma input scaling
        hidden = hidden * jnp.asarray(cfg.hidden_size ** 0.5, hidden.dtype)

    nb, bs = pool["kv"].shape[1], pool["kv"].shape[3]
    maxb = block_table.shape[0]
    tables = jnp.where(block_table < 0, 0, block_table)

    # causal-with-offset mask over the gathered context [T_pad, MAXB*BS]
    t_ctx = maxb * bs
    k_pos = jnp.arange(t_ctx)[None, :]
    q_abs = positions[:, None]
    attn_mask = jnp.where((k_pos <= q_abs) & (k_pos < ctx_len), 0.0, NEG_INF)

    def body(h, xs):
        lp, pkv = xs
        normed = cnn.rms_norm(lp["input_layernorm"], h, eps=cfg.rms_norm_eps,
                              plus_one=plus_one)
        q, k, v = _qkv(lp, cfg, normed)
        q, k = _rope_at(emb_freq, positions, q, k)
        pkv = write_kv(pkv, k.transpose(1, 0, 2), v.transpose(1, 0, 2),
                       slot_blocks, slot_offsets)
        kk, vv = gather_kv(pkv, tables, cfg.num_key_value_heads)
        group = cfg.num_attention_heads // cfg.num_key_value_heads
        kk = jnp.repeat(kk, group, axis=0)                     # [H, Tctx, D]
        vv = jnp.repeat(vv, group, axis=0)
        scale = 1.0 / (cfg.head_dim ** 0.5)
        scores = jnp.einsum("htd,hsd->hts", q.astype(jnp.float32),
                            kk.astype(jnp.float32)) * scale
        scores = scores + attn_mask[None]
        probs = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("hts,hsd->htd", probs,
                          vv.astype(jnp.float32)).astype(h.dtype)
        attn = attn.transpose(1, 0, 2).reshape(t_pad, -1)
        h = h + cnn.linear(lp["self_attn"]["o_proj"], attn)
        normed = cnn.rms_norm(lp["post_attention_layernorm"], h,
                              eps=cfg.rms_norm_eps, plus_one=plus_one)
        h = h + swiglu_apply(lp["mlp"], normed,
                             act="gelu_pytorch_tanh" if plus_one else "silu")
        return h, pkv

    hidden, nkv = jax.lax.scan(
        body, hidden, (params["layers"], pool["kv"]))
    pool = {"kv": nkv}
    hidden = cnn.rms_norm(params["norm"], hidden, eps=cfg.rms_norm_eps,
                          plus_one=plus_one)
    last = hidden[true_len - 1]
    if "lm_head" in params:
        logits = cnn.linear(params["lm_head"], last)
    else:
        logits = last @ params["embed_tokens"]["weight"].T.astype(last.dtype)
    return logits, pool


def _decode_core(model, plus_one, params, pool, tokens, positions,
                 block_tables, seq_lens, slot_blocks, slot_offsets):
    """One decode step over the paged pool. Returns (logits [B, V], pool)."""
    cfg = model.config
    emb_freq = model.emb_freq
    b = tokens.shape[0]
    hidden = cnn.embedding(params["embed_tokens"], tokens)       # [B, Dm]
    if plus_one:
        hidden = hidden * jnp.asarray(cfg.hidden_size ** 0.5, hidden.dtype)

    use_pallas = paged_decode_pallas.supported(
        jnp.zeros((b, cfg.num_attention_heads, cfg.head_dim)),
        pool["kv"][0], cfg.num_key_value_heads)

    def body(h, xs):
        lp, pkv = xs
        normed = cnn.rms_norm(lp["input_layernorm"], h, eps=cfg.rms_norm_eps,
                              plus_one=plus_one)
        nh, nkv, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                       cfg.head_dim)
        q = cnn.linear(lp["self_attn"]["q_proj"], normed).reshape(b, nh, hd)
        k = cnn.linear(lp["self_attn"]["k_proj"], normed).reshape(b, nkv, hd)
        v = cnn.linear(lp["self_attn"]["v_proj"], normed).reshape(b, nkv, hd)
        if "q_norm" in lp["self_attn"]:
            q = cnn.rms_norm(lp["self_attn"]["q_norm"], q,
                             eps=cfg.rms_norm_eps)
            k = cnn.rms_norm(lp["self_attn"]["k_norm"], k,
                             eps=cfg.rms_norm_eps)
        freqs = jnp.take(emb_freq[0], positions, axis=0)         # [B, D/2]
        emb = jnp.concatenate([freqs, freqs], axis=-1)[:, None, :]
        cos = jnp.cos(emb).astype(q.dtype)
        sin = jnp.sin(emb).astype(q.dtype)
        q = q * cos + rotate_half(q) * sin
        k = k * cos + rotate_half(k) * sin
        pkv = write_kv(pkv, k, v, slot_blocks, slot_offsets)
        if use_pallas:
            attn = paged_decode_pallas.paged_attention_decode_pallas(
                q, pkv, block_tables, seq_lens, nkv)             # [B, H, D]
        else:
            attn = paged_attention_decode(q, pkv, block_tables, seq_lens,
                                          nkv)
        attn = attn.reshape(b, -1)
        h = h + cnn.linear(lp["self_attn"]["o_proj"], attn)
        normed = cnn.rms_norm(lp["post_attention_layernorm"], h,
                              eps=cfg.rms_norm_eps, plus_one=plus_one)
        h = h + swiglu_apply(lp["mlp"], normed,
                             act="gelu_pytorch_tanh" if plus_one else "silu")
        return h, pkv

    hidden, nkv_pool = jax.lax.scan(
        body, hidden, (params["layers"], pool["kv"]))
    pool = {"kv": nkv_pool}
    hidden = cnn.rms_norm(params["norm"], hidden, eps=cfg.rms_norm_eps,
                          plus_one=plus_one)
    if "lm_head" in params:
        logits = cnn.linear(params["lm_head"], hidden)
    else:
        logits = hidden @ params["embed_tokens"]["weight"].T.astype(
            hidden.dtype)
    return logits, pool


@partial(jax.jit, static_argnums=(0, 1), donate_argnums=(3,))
def decode(model, plus_one: bool, params, pool, tokens, positions,
           block_tables, seq_lens, slot_blocks, slot_offsets):
    """Batched single-token decode.

    tokens: [B] int32; positions: [B] absolute positions; block_tables:
    [B, MAXB]; seq_lens: [B] context lengths incl. the new token;
    slot_blocks/slot_offsets: [B] pool write targets (-1 = dead lane).
    Returns (logits [B, V], pool).
    """
    return _decode_core(model, plus_one, params, pool, tokens, positions,
                        block_tables, seq_lens, slot_blocks, slot_offsets)


@partial(jax.jit, static_argnums=(0, 1, 8), donate_argnums=(3,))
def decode_horizon(model, plus_one: bool, params, pool, tokens, positions,
                   block_tables, live, horizon: int):
    """Run ``horizon`` greedy decode steps fully on device — ONE host
    round-trip per ``horizon`` tokens instead of per token. The engine
    pre-allocates blocks to cover ``positions + horizon`` so in-graph slot
    arithmetic (``table[pos // BS], pos % BS``) always lands on live blocks.

    tokens: [B] latest token per lane; positions: [B] its absolute
    position; live: [B] bool lane validity. Returns
    (generated [B, horizon], pool)."""
    b = tokens.shape[0]
    bs = pool["kv"].shape[3]
    out_buf = jnp.zeros((b, horizon), dtype=jnp.int32)

    def body(i, carry):
        toks, pos, pl_, out = carry
        blk_idx = pos // bs
        slot_blocks = jnp.where(
            live, jnp.take_along_axis(block_tables, blk_idx[:, None],
                                      axis=1)[:, 0], -1)
        slot_offsets = pos % bs
        seq_lens = jnp.where(live, pos + 1, 0)
        logits, pl_ = _decode_core(model, plus_one, params, pl_, toks, pos,
                                   block_tables, seq_lens, slot_blocks,
                                   slot_offsets)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        out = out.at[:, i].set(nxt)
        return nxt, pos + 1, pl_, out

    _, _, pool, out_buf = jax.lax.fori_loop(
        0, horizon, body, (tokens.astype(jnp.int32), positions, pool,
                           out_buf))
    return out_buf, pool
