"""Qwen2/3-flavored causal LM — the HF-compatible ``ModelForCausalLM``
equivalent (reference ``models/custom_transformer.py:296-747`` and the
Qwen3 serving model in ``simple_vllm.ipynb``).

RMSNorm, SwiGLU MLP, GQA, per-layer RoPE, optional per-head QK-norm
(Qwen3), optional tied lm_head. Same static-cache decode machinery as the
rest of the library, so ``generate``/``speculative_generate`` work on it
directly (it exposes the ``config``, ``init_cache``, ``apply`` protocol).
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..config import QwenConfig, StructuralIdentity
from ..core import nn as cnn
from ..core.masks import causal_mask_static_kv
from ..layers import positional as pos
from ..layers.kv_cache import init_cache
from ..layers.modern import modern_layer_init, modern_layer_apply
from .outputs import CLMOutput


class ModelForCausalLM(StructuralIdentity):
    """Functional Qwen-style CLM."""

    def __init__(self, config: QwenConfig) -> None:
        self.config = config
        scaling = getattr(config, "rope_scaling", None)
        self.emb_freq = pos.rope_freqs(config.max_position_embeddings,
                                       config.head_dim,
                                       theta=config.rope_theta,
                                       scaling=scaling)
        # YaRN attention mscale (1.0 otherwise); serving reads it too
        self.rope_scale = pos.rope_attention_factor(scaling)

    def init(self, key, dtype=jnp.float32):
        cfg = self.config
        k_emb, k_layers, k_head = jax.random.split(key, 3)
        keys = jax.random.split(k_layers, cfg.num_hidden_layers)
        params = {
            "embed_tokens": cnn.embedding_init(
                k_emb, cfg.vocab_size, cfg.hidden_size, dtype=dtype),
            "layers": jax.vmap(
                lambda k: modern_layer_init(k, cfg, dtype=dtype))(keys),
            "norm": cnn.rms_norm_init(cfg.hidden_size, dtype=dtype),
        }
        if not cfg.tie_word_embeddings:
            params["lm_head"] = cnn.linear_init(
                k_head, cfg.hidden_size, cfg.vocab_size, bias=False,
                dtype=dtype)
        return params

    def init_cache(self, *, batch_size: int = 1, max_len: Optional[int] = None,
                   dtype=jnp.float32):
        cfg = self.config
        return init_cache(cfg, batch_size=batch_size,
                          max_len=max_len or 2048, dtype=dtype,
                          num_kv_heads=cfg.num_key_value_heads,
                          head_dim=cfg.head_dim)

    def apply(self, params, input_ids, attention_mask=None,
              cache: Optional[Any] = None, start_pos=0,
              train: bool = False, segment_ids=None,
              positions=None) -> CLMOutput:
        """``train=True`` enables MoE capacity dropping (GShard training
        regime); inference routing is dropless so cached decode is
        token-exact vs full-prefix forwards. For MoE configs the output
        carries ``aux_loss`` (mean Switch load-balance loss over layers).

        ``segment_ids``/``positions``: optional [B, L] int32 for PACKED
        training batches (``training.packing``) — attention is blocked
        across segments (in-kernel on the flash path) and RoPE positions
        restart per segment. Training path only (``cache`` must be None).
        """
        cfg = self.config
        if segment_ids is not None and cache is not None:
            raise ValueError("packed segment_ids are a training feature; "
                             "cached decode does not support them")
        segments = (None if segment_ids is None
                    else (segment_ids, segment_ids))
        moe = cfg.num_experts > 0
        hidden = cnn.embedding(params["embed_tokens"], input_ids,
                               pad_idx=getattr(cfg, "pad_token_id", None))
        bsz, seqlen = input_ids.shape
        if positions is not None:
            freqs = jnp.take(self.emb_freq[0], positions, axis=0)
        else:
            freqs = jax.lax.dynamic_slice_in_dim(self.emb_freq, start_pos,
                                                 seqlen, axis=1)

        causal = False
        window = getattr(cfg, "sliding_window", None)
        sinks = getattr(cfg, "attention_sinks", 0)
        if cache is not None:
            kv_cap = cache["k"].shape[3]
            mask = causal_mask_static_kv(seqlen, kv_cap, start_pos,
                                         attention_mask, batch_size=bsz,
                                         window=window, sinks=sinks)
        elif window is not None and sinks:
            # window + sinks: explicit mask (the in-kernel band has no
            # sink notch); plain SWA stays on the in-kernel fast path
            from ..core.masks import banded_causal_mask
            mask = banded_causal_mask(seqlen, window, attention_mask,
                                      sinks=sinks)
        else:
            # uncached: causal (+ sliding window) applied IN-KERNEL by
            # sdpa — no O(L^2) mask materialization; the flash path skips
            # both future and pre-window blocks
            mask = None
            if attention_mask is not None:
                from ..core.masks import bidirectional_mask
                mask = bidirectional_mask(attention_mask)
            causal = True

        def body(h, xs):
            lp, ck, cv = xs
            out = modern_layer_apply(
                lp, h, cfg, freqs=freqs, mask=mask, causal=causal,
                cache_kv=(ck, cv), start_pos=start_pos,
                rms_eps=cfg.rms_norm_eps, moe_train=train,
                rope_scale=self.rope_scale)
            if moe:
                h, kv, aux = out
                return h, (*kv, aux)
            return out

        def body_nocache(h, lp):
            out = modern_layer_apply(
                lp, h, cfg, freqs=freqs, mask=mask, causal=causal,
                rms_eps=cfg.rms_norm_eps, moe_train=train,
                rope_scale=self.rope_scale, segments=segments)
            if moe:
                return out[0], out[2]
            return out[0], None

        aux_loss = None
        if cache is not None:
            hidden, ys = jax.lax.scan(
                body, hidden, (params["layers"], cache["k"], cache["v"]))
            if moe:
                nk, nv, aux = ys
                aux_loss = jnp.mean(aux)
            else:
                nk, nv = ys
            new_cache = {"k": nk, "v": nv,
                         "length": jnp.asarray(start_pos + seqlen, jnp.int32)}
        else:
            hidden, aux = jax.lax.scan(body_nocache, hidden, params["layers"])
            if moe:
                aux_loss = jnp.mean(aux)
            new_cache = None

        hidden = cnn.rms_norm(params["norm"], hidden, eps=cfg.rms_norm_eps)
        if cfg.tie_word_embeddings:
            logits = cnn.tied_lm_head(params["embed_tokens"], hidden)
        else:
            logits = cnn.linear(params["lm_head"], hidden)
        return CLMOutput(hidden_state=hidden, logits=logits,
                         kv_cache=new_cache, aux_loss=aux_loss)

    __call__ = apply
