"""Modern (pre-LN / RMSNorm / SwiGLU / RoPE / GQA) decoder building blocks.

Shared by the Gemma tower of PaliGemma (reference ``paligemma.ipynb``
``GemmaForCausalLM``), the HF-compatible Qwen2-flavored CLM (reference
``models/custom_transformer.py``), and the Qwen3 serving model (reference
``simple_vllm.ipynb``, QK-norm).

Differences from the classic VyomAI blocks: pre-norm residual (plain add,
no post-LN), RMSNorm, gated SwiGLU MLP, head_dim decoupled from
hidden_size/num_heads, optional per-head QK RMSNorm, no biases.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core import nn as cnn
from .attention import repeat_kv, sdpa, _merge_heads
from .positional import apply_rotary_pos_emb


def modern_attention_init(key, config, dtype=jnp.float32):
    h = config.hidden_size
    nh = config.num_attention_heads
    nkv = config.num_key_value_heads
    hd = config.head_dim
    bias = getattr(config, "attention_bias", False)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p = {
        "q_proj": cnn.linear_init(k1, h, nh * hd, bias=bias, dtype=dtype),
        "k_proj": cnn.linear_init(k2, h, nkv * hd, bias=bias, dtype=dtype),
        "v_proj": cnn.linear_init(k3, h, nkv * hd, bias=bias, dtype=dtype),
        "o_proj": cnn.linear_init(k4, nh * hd, h, bias=bias, dtype=dtype),
    }
    if getattr(config, "qk_norm", False):
        p["q_norm"] = cnn.rms_norm_init(hd, dtype=dtype)
        p["k_norm"] = cnn.rms_norm_init(hd, dtype=dtype)
    return p


def modern_attention_apply(p, hidden, config, *, freqs=None, mask=None,
                           causal=False, cache_kv: Optional[Tuple] = None,
                           start_pos=0, rms_eps: float = 1e-6,
                           rope_scale: float = 1.0, segments=None):
    """Pre-norm attention body (caller applies the input norm + residual).
    Returns (attn_out, new_cache_kv)."""
    b, l, _ = hidden.shape
    nh, nkv, hd = (config.num_attention_heads, config.num_key_value_heads,
                   config.head_dim)
    q = cnn.linear(p["q_proj"], hidden).reshape(b, l, nh, hd)
    k = cnn.linear(p["k_proj"], hidden).reshape(b, l, nkv, hd)
    v = cnn.linear(p["v_proj"], hidden).reshape(b, l, nkv, hd)
    if "q_norm" in p:  # Qwen3-style per-head QK RMSNorm before RoPE
        q = cnn.rms_norm(p["q_norm"], q, eps=rms_eps)
        k = cnn.rms_norm(p["k_norm"], k, eps=rms_eps)
    q = q.transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    if freqs is not None:
        q, k = apply_rotary_pos_emb(q, k, freqs, scale=rope_scale)

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

    n_rep = nh // nkv
    out = sdpa(q, repeat_kv(k, n_rep), repeat_kv(v, n_rep), mask,
               causal=causal,
               window=getattr(config, "sliding_window", None)
               if causal else None, segments=segments)
    out = _merge_heads(out)
    return cnn.linear(p["o_proj"], out), cache_kv


def swiglu_init(key, config, dtype=jnp.float32):
    h, inter = config.hidden_size, config.intermediate_size
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "gate_proj": cnn.linear_init(k1, h, inter, bias=False, dtype=dtype),
        "up_proj": cnn.linear_init(k2, h, inter, bias=False, dtype=dtype),
        "down_proj": cnn.linear_init(k3, inter, h, bias=False, dtype=dtype),
    }


def swiglu_apply(p, x, act="silu"):
    gate = cnn.get_act(act)(cnn.linear(p["gate_proj"], x))
    return cnn.linear(p["down_proj"], gate * cnn.linear(p["up_proj"], x))


def modern_layer_init(key, config, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    num_experts = getattr(config, "num_experts", 0)
    if num_experts:
        from .moe import moe_init
        mlp = moe_init(k2, config, num_experts=num_experts, gated=True,
                       dtype=dtype)
    else:
        mlp = swiglu_init(k2, config, dtype=dtype)
    return {
        "input_layernorm": cnn.rms_norm_init(config.hidden_size, dtype=dtype),
        "self_attn": modern_attention_init(k1, config, dtype=dtype),
        "post_attention_layernorm": cnn.rms_norm_init(config.hidden_size,
                                                      dtype=dtype),
        "mlp": mlp,
    }


def modern_layer_apply(p, hidden, config, *, freqs=None, mask=None,
                       causal=False, cache_kv=None, start_pos=0,
                       rms_eps: float = 1e-6, rms_plus_one: bool = False,
                       mlp_act: str = "silu", moe_train: bool = False,
                       rope_scale: float = 1.0, segments=None):
    """x -> x + attn(norm(x)); h -> h + mlp(norm(h)).

    Returns ``(out, kv)`` for a dense MLP, ``(out, kv, aux_loss)`` when the
    layer's MLP is MoE (``config.num_experts > 0`` — detected from the
    params so stacked-layer vmaps stay uniform). ``moe_train=True`` enables
    capacity-based token dropping (GShard training regime); the default is
    dropless routing so cached decode is token-exact."""
    normed = cnn.rms_norm(p["input_layernorm"], hidden, eps=rms_eps,
                          plus_one=rms_plus_one)
    attn_out, new_kv = modern_attention_apply(
        p["self_attn"], normed, config, freqs=freqs, mask=mask, causal=causal,
        cache_kv=cache_kv, start_pos=start_pos, rms_eps=rms_eps,
        rope_scale=rope_scale, segments=segments)
    hidden = hidden + attn_out
    normed = cnn.rms_norm(p["post_attention_layernorm"], hidden, eps=rms_eps,
                          plus_one=rms_plus_one)
    if "router" in p["mlp"]:                       # MoE MLP
        from .moe import moe_apply
        cf = getattr(config, "moe_capacity_factor", 1.25) if moe_train \
            else None
        mlp_out, aux = moe_apply(
            p["mlp"], normed,
            top_k=getattr(config, "num_experts_per_tok", 2),
            capacity_factor=cf, act=mlp_act,
            impl=("einsum" if moe_train
                  else getattr(config, "moe_impl", "einsum")))
        return hidden + mlp_out, new_kv, aux
    hidden = hidden + swiglu_apply(p["mlp"], normed, act=mlp_act)
    return hidden, new_kv
