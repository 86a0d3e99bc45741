"""Attention blocks as pure init/apply pairs.

Rebuilds the reference attention family TPU-first:
- ``EncoderAttention`` / ``EncoderAttentionGqa`` (reference
  ``layers/attention.py:75-215``)
- ``DecoderAttention(Gqa)`` with static KV cache (reference
  ``layers/attention.py:218-379``, ``models/decoder.py:44-201``)
- ``EncoderDecoderAttention(Gqa)`` cross-attention with encode-once KV
  (reference ``layers/attention.py:382-573``)
- ``VisionAttention`` with fused qkv (reference ``layers/attention.py:576-624``)

Semantics preserved for logits parity:
- output projection is **post-LN residual**: ``LN(dropout(W·attn) + input)``
  (reference ``AttentionSelfOutput``, ``layers/attention.py:42-72``)
- softmax scale is 1/sqrt(head_dim), additive float mask.

The score/softmax/value contraction routes through :func:`sdpa`, which
dispatches to the Pallas flash-attention kernel on TPU when shapes allow and
falls back to a pure-XLA einsum path otherwise.
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core import nn as cnn
from .positional import apply_rotary_pos_emb

# Global switch for the fused attention backend
# ("auto" | "xla" | "flash" | "short").
_SDPA_IMPL = "auto"

from ..core.masks import NEG_INF as NEG_INF_F  # canonical sentinel


def set_sdpa_impl(impl: str) -> None:
    global _SDPA_IMPL
    assert impl in ("auto", "xla", "flash", "short")
    _SDPA_IMPL = impl


def repeat_kv(x, n_rep: int):
    """[B, H_kv, L, D] -> [B, H_kv * n_rep, L, D] by repeat-interleave on
    heads (reference ``layers/attention.py:8-19``). XLA folds the broadcast
    into the downstream matmul, so this costs no HBM traffic."""
    if n_rep == 1:
        return x
    b, h, l, d = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, :], (b, h, n_rep, l, d))
    return x.reshape(b, h * n_rep, l, d)


def _flash_shapes_ok(q, k, mask) -> bool:
    try:
        from ..ops import flash_attention as fa
        return fa.supported_shapes(q, k, mask)
    except Exception:
        return False


def _short_shapes_ok(q, k, mask, causal, window, segments) -> bool:
    try:
        from ..ops import short_attention as sa
        return sa.supported(q, k, mask, causal=causal, window=window,
                            segments=segments)
    except Exception:
        return False


def sdpa(q, k, v, mask=None, *, causal: bool = False, window=None,
         segments=None):
    """Scaled dot-product attention. q: [B,H,Lq,D]; k,v: [B,H,Lk,D];
    mask: additive, broadcastable to [B,H,Lq,Lk]. ``causal=True`` applies
    the triangular mask (queries aligned to the end of the kv range) —
    on the flash path this skips future blocks entirely.

    ``segments``: optional ``(q_seg [B, Lq], kv_seg [B, Lk])`` int32
    non-negative ids; attention is masked where ids differ (packed
    sequences). The flash path applies this IN-KERNEL at O(L) operand
    cost; the XLA path adds the equivalent additive mask.

    ``"auto"`` picks the implementation per *lowering platform*
    (``lax.platform_dependent``): the Pallas kernel on TPU, the einsum path
    everywhere else — so a computation placed on a CPU mesh takes the XLA
    path even when the process default backend is TPU (no
    ``set_sdpa_impl("xla")`` needed on CPU meshes).

    FULLY-MASKED query rows are implementation-defined: the flash kernel
    emits exactly 0 (online-softmax floor), the XLA path emits the uniform
    average of V (clamped softmax — the torch reference's behavior). Both
    are garbage-in/garbage-out values; mask such rows out downstream
    (pooling, loss) rather than reading them. Rows that exist only as the
    flash path's internal block padding are sliced away and never differ."""
    impl = _SDPA_IMPL
    if impl == "auto" and _flash_shapes_ok(q, k, mask):
        from ..ops import flash_attention as fa
        nseg = 0 if segments is None else len(segments)

        def flash_path(*args):
            qq, kk, vv = args[:3]
            segs = tuple(args[3:3 + nseg]) or None
            mm = args[3 + nseg] if len(args) > 3 + nseg else None
            return fa.flash_attention_bias(qq, kk, vv, mm, causal=causal,
                                           window=window, segments=segs)

        def xla_path(*args):
            qq, kk, vv = args[:3]
            segs = tuple(args[3:3 + nseg]) or None
            mm = args[3 + nseg] if len(args) > 3 + nseg else None
            return _sdpa_xla(qq, kk, vv, mm, causal=causal, window=window,
                             segments=segs)

        args = (q, k, v) + (tuple(segments) if segments else ())
        if mask is not None:
            args += (mask,)
        return jax.lax.platform_dependent(*args, tpu=flash_path,
                                          default=xla_path)
    if impl == "auto" and _short_shapes_ok(q, k, mask, causal, window,
                                           segments):
        # ViT-class short bidirectional shapes: VMEM-resident full-softmax
        # kernel (scores never touch HBM) — see ops/short_attention.py.
        # A key-padding mask (additive [B,1,1,L]) rides the kernel too,
        # but AUTO routes masked shapes only at L >= 384: measured r5
        # (benchmarks/encoder_train_bench.py) the masked kernel forward is
        # +17% at L=512 and -13% at L=128 vs XLA, with training a wash —
        # force impl="short" to override.
        from ..ops import short_attention as sa
        if mask is not None:
            if q.shape[2] < 384:
                return _sdpa_xla(q, k, v, mask, causal=causal,
                                 window=window, segments=segments)
            return jax.lax.platform_dependent(
                q, k, v, mask, tpu=sa.short_attention_bias,
                default=lambda qq, kk, vv, mm: _sdpa_xla(qq, kk, vv, mm))
        return jax.lax.platform_dependent(
            q, k, v, tpu=sa.short_attention,
            default=lambda qq, kk, vv: _sdpa_xla(qq, kk, vv))
    if impl == "short":
        from ..ops import short_attention as sa
        if not sa.supported(q, k, mask, causal=causal, window=window,
                            segments=segments):
            raise ValueError(
                "set_sdpa_impl('short'): unsupported call (mask/causal/"
                "window/segments/GQA or out-of-range shape) — the short "
                "kernel would silently drop them; use 'auto' or 'flash'")
        if mask is not None:
            return sa.short_attention_bias(q, k, v, mask)
        return sa.short_attention(q, k, v)
    if impl == "flash":
        from ..ops import flash_attention as fa
        return fa.flash_attention_bias(q, k, v, mask, causal=causal,
                                       window=window, segments=segments)
    return _sdpa_xla(q, k, v, mask, causal=causal, window=window,
                     segments=segments)


def _sdpa_xla(q, k, v, mask=None, *, causal: bool = False, window=None,
              segments=None):
    scale = 1.0 / (q.shape[-1] ** 0.5)
    # fp32 accumulation for <=fp32 inputs; fp64 inputs KEEP fp64 scores so
    # x64 parity runs (test_grad_parity) aren't floored at fp32 noise
    acc = jnp.promote_types(q.dtype, jnp.float32)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=acc) * scale
    if mask is not None:
        scores = scores + mask.astype(scores.dtype)
    if segments is not None:
        q_seg, kv_seg = segments
        seg_ok = q_seg[:, None, :, None] == kv_seg[:, None, None, :]
        scores = scores + jnp.where(seg_ok, 0.0, NEG_INF_F)
    if causal:
        lq, lk = q.shape[2], k.shape[2]
        q_pos = (lk - lq) + jnp.arange(lq)[:, None]
        k_pos = jnp.arange(lk)[None, :]
        ok = k_pos <= q_pos
        if window is not None:   # sliding-window band
            ok = ok & (k_pos > q_pos - window)
        scores = scores + jnp.where(ok, 0.0, NEG_INF_F)
    # Clamp so stacked masks don't overflow to -inf (keeps fully-masked
    # rows at a finite uniform softmax, matching the reference).
    scores = jnp.maximum(scores, NEG_INF_F)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


# ---------------------------------------------------------------------------
# AttentionSelfOutput: dense -> dropout -> post-LN residual add
# ---------------------------------------------------------------------------

def self_output_init(key, config, dtype=jnp.float32):
    bias = getattr(config, "attention_bias", True)
    return {
        "dense": cnn.linear_init(key, config.hidden_size, config.hidden_size,
                                 bias=bias, std=config.initializer_range,
                                 dtype=dtype),
        "layernorm": cnn.layer_norm_init(config.hidden_size, dtype=dtype),
    }


def self_output_apply(p, hidden, input_tensor, config, *, deterministic=True,
                      rng=None):
    h = cnn.linear(p["dense"], hidden)
    h = cnn.dropout(h, config.hidden_dropout_prob,
                    deterministic=deterministic, rng=rng)
    eps = getattr(config, "layer_norm_eps", 1e-6)
    return cnn.layer_norm(p["layernorm"], h + input_tensor, eps=eps)


# ---------------------------------------------------------------------------
# Projections
# ---------------------------------------------------------------------------

def _qkv_dims(config, kind: str) -> Tuple[int, int]:
    """Returns (q_out_dim, kv_out_dim)."""
    h = config.hidden_size
    if "gqa" in kind:
        head_dim = h // config.num_attention_heads
        kv = getattr(config, "num_key_value_heads", 4) * head_dim
        return h, kv
    return h, h


def attention_init(key, config, kind: str = "mha", dtype=jnp.float32):
    """kind in {mha, gqa, vision}. Cross attention shares this layout."""
    if config.hidden_size % config.num_attention_heads != 0:
        raise ValueError(
            f"The hidden size ({config.hidden_size}) is not a multiple of the "
            f"number of attention heads ({config.num_attention_heads})")
    bias = getattr(config, "attention_bias", True)
    std = config.initializer_range
    keys = jax.random.split(key, 5)
    if kind == "vision":
        return {
            "qkv": cnn.linear_init(keys[0], config.hidden_size,
                                   3 * config.hidden_size, bias=True,
                                   std=std, dtype=dtype),
            "out": self_output_init(keys[1], config, dtype=dtype),
        }
    q_dim, kv_dim = _qkv_dims(config, kind)
    if "gqa" in kind:
        nkv = getattr(config, "num_key_value_heads", 4)
        nh = config.num_attention_heads
        if nh % nkv != 0 or nh < nkv:
            raise ValueError(
                f"num_key_value_heads {nkv} should be <= num_attention_heads "
                f"{nh} and divide it evenly")
    return {
        "query": cnn.linear_init(keys[0], config.hidden_size, q_dim,
                                 bias=bias, std=std, dtype=dtype),
        "key": cnn.linear_init(keys[1], config.hidden_size, kv_dim,
                               bias=bias, std=std, dtype=dtype),
        "value": cnn.linear_init(keys[2], config.hidden_size, kv_dim,
                                 bias=bias, std=std, dtype=dtype),
        "out": self_output_init(keys[3], config, dtype=dtype),
    }


def _split_heads(x, num_heads: int):
    b, l, hd = x.shape
    return x.reshape(b, l, num_heads, hd // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, l, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * d)


def project_qkv(p, hidden, config, kind: str):
    """Project hidden -> (q [B,H,L,D], k, v [B,H_kv,L,D])."""
    head_dim = config.hidden_size // config.num_attention_heads
    if kind == "vision":
        qkv = cnn.linear(p["qkv"], hidden)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        nh = config.num_attention_heads
        return _split_heads(q, nh), _split_heads(k, nh), _split_heads(v, nh)
    q = cnn.linear(p["query"], hidden)
    k = cnn.linear(p["key"], hidden)
    v = cnn.linear(p["value"], hidden)
    nh = config.num_attention_heads
    nkv = getattr(config, "num_key_value_heads", 4) if "gqa" in kind else nh
    return (_split_heads(q, nh),
            k.reshape(k.shape[0], k.shape[1], nkv, head_dim).transpose(0, 2, 1, 3),
            v.reshape(v.shape[0], v.shape[1], nkv, head_dim).transpose(0, 2, 1, 3))


# ---------------------------------------------------------------------------
# Encoder / vision self-attention (bidirectional)
# ---------------------------------------------------------------------------

def _packed_vision_ctx(qkv, nh):
    """XLA fallback for the packed short-attention path: unpack to
    [B, H, L, D], einsum attention, merge back to [B, L, H*D]."""
    b, l, w = qkv.shape
    hd = w // (3 * nh)
    x5 = qkv.reshape(b, l, 3, nh, hd).transpose(0, 2, 3, 1, 4)
    out = _sdpa_xla(x5[:, 0], x5[:, 1], x5[:, 2])
    return _merge_heads(out)


def encoder_attention_apply(p, hidden, attention_mask, config, *,
                            kind: str = "mha", freqs=None,
                            deterministic=True, rng=None):
    if kind == "vision" and attention_mask is None and freqs is None \
            and _SDPA_IMPL in ("auto", "short"):
        # ViT-class fast path: the fused qkv projection output feeds the
        # packed short-attention kernel DIRECTLY (heads as lane ranges) —
        # no [B,H,L,D] transposes materialize in HBM on either side
        # (ops/short_attention.py; benchmarks/vit_profile.py for why)
        from ..ops import short_attention as sa
        nh = config.num_attention_heads
        qkv = cnn.linear(p["qkv"], hidden)
        if sa.supported_packed(qkv, nh):
            if _SDPA_IMPL == "short":   # forced (incl. interpret tests)
                ctx = sa.short_attention_qkv(qkv, nh)
            else:
                ctx = jax.lax.platform_dependent(
                    qkv,
                    tpu=functools.partial(sa.short_attention_qkv, nh=nh),
                    default=functools.partial(_packed_vision_ctx, nh=nh))
            return self_output_apply(p["out"], ctx, hidden, config,
                                     deterministic=deterministic, rng=rng)
    q, k, v = project_qkv(p, hidden, config, kind)
    if freqs is not None:
        q, k = apply_rotary_pos_emb(q, k, freqs)
    if "gqa" in kind:
        n_rep = config.num_attention_heads // getattr(config, "num_key_value_heads", 4)
        k = repeat_kv(k, n_rep)
        v = repeat_kv(v, n_rep)
    out = sdpa(q, k, v, attention_mask)
    out = _merge_heads(out)
    return self_output_apply(p["out"], out, hidden, config,
                             deterministic=deterministic, rng=rng)


# ---------------------------------------------------------------------------
# Decoder self-attention with static KV cache
# ---------------------------------------------------------------------------

def decoder_attention_apply(p, hidden, attention_mask, config, *,
                            kind: str = "mha", freqs=None,
                            cache_kv: Optional[Tuple] = None,
                            start_pos=0, causal: bool = False,
                            deterministic=True, rng=None, segments=None):
    """Causal self-attention.

    ``cache_kv``: optional ``(k_buf, v_buf)`` static buffers
    [B, H_kv, S_max, D]. When given, writes k/v at ``start_pos`` and attends
    over the full buffer (caller supplies a validity/causal mask over
    S_max). Returns (output, new_cache_kv).
    """
    q, k, v = project_qkv(p, hidden, config, kind)
    if freqs is not None:
        q, k = apply_rotary_pos_emb(q, k, freqs)

    if cache_kv is not None:
        k_buf, v_buf = cache_kv
        # index dtypes must match under jax.enable_x64 (int32 traced pos
        # mixed with python-int zeros would promote to int64)
        sp = jnp.asarray(start_pos, jnp.int32)
        z = jnp.zeros((), jnp.int32)
        k_buf = jax.lax.dynamic_update_slice(
            k_buf, k.astype(k_buf.dtype), (z, z, sp, z))
        v_buf = jax.lax.dynamic_update_slice(
            v_buf, v.astype(v_buf.dtype), (z, z, sp, z))
        k, v = k_buf.astype(q.dtype), v_buf.astype(q.dtype)
        cache_kv = (k_buf, v_buf)

    if "gqa" in kind:
        n_rep = config.num_attention_heads // getattr(config, "num_key_value_heads", 4)
        k = repeat_kv(k, n_rep)
        v = repeat_kv(v, n_rep)
    out = sdpa(q, k, v, attention_mask, causal=causal, segments=segments)
    out = _merge_heads(out)
    out = self_output_apply(p["out"], out, hidden, config,
                            deterministic=deterministic, rng=rng)
    return out, cache_kv


# ---------------------------------------------------------------------------
# Cross-attention (encoder-decoder) with encode-once KV
# ---------------------------------------------------------------------------

def cross_attention_kv(p, encoder_hidden, config, kind: str = "mha"):
    """Compute the cross-attention K/V once from encoder output
    (reference caches these on the first decode step,
    ``layers/attention.py:439-462``)."""
    head_dim = config.hidden_size // config.num_attention_heads
    nh = config.num_attention_heads
    nkv = getattr(config, "num_key_value_heads", 4) if "gqa" in kind else nh
    k = cnn.linear(p["key"], encoder_hidden)
    v = cnn.linear(p["value"], encoder_hidden)
    k = k.reshape(k.shape[0], k.shape[1], nkv, head_dim).transpose(0, 2, 1, 3)
    v = v.reshape(v.shape[0], v.shape[1], nkv, head_dim).transpose(0, 2, 1, 3)
    return k, v


def cross_attention_apply(p, hidden, config, *, kind: str = "mha",
                          encoder_hidden=None, encoder_attention_mask=None,
                          cached_kv: Optional[Tuple] = None,
                          deterministic=True, rng=None):
    """Q from decoder ``hidden``; K/V from ``encoder_hidden`` (or
    ``cached_kv`` when decoding). Returns (output, kv) so callers can reuse
    the projected encoder K/V across decode steps."""
    q = cnn.linear(p["query"], hidden)
    q = _split_heads(q, config.num_attention_heads)
    if cached_kv is None:
        k, v = cross_attention_kv(p, encoder_hidden, config, kind)
    else:
        k, v = cached_kv
    kv = (k, v)
    if "gqa" in kind:
        n_rep = config.num_attention_heads // getattr(config, "num_key_value_heads", 4)
        k = repeat_kv(k, n_rep)
        v = repeat_kv(v, n_rep)
    out = sdpa(q, k, v, encoder_attention_mask)
    out = _merge_heads(out)
    out = self_output_apply(p["out"], out, hidden, config,
                            deterministic=deterministic, rng=rng)
    return out, kv
