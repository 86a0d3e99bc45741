"""Gemma decoder (text tower of PaliGemma).

Rebuilds the reference's from-scratch ``GemmaForCausalLM``
(``paligemma.ipynb`` cells 9-20) TPU-first:
- RMSNorm in the ``x * (1 + w)`` form
- ``head_dim`` independent of ``hidden_size / num_heads`` (256)
- GQA (1 kv head), RoPE applied per layer
- input embeddings scaled by ``sqrt(hidden_size)``
- tied embeddings (lm logits = hidden @ embedding.T)
- prefix-LM mask support via ``token_type_ids`` (image+prefix bidirectional,
  suffix causal) and full-attend cached decode
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..config import GemmaConfig, StructuralIdentity
from ..core import nn as cnn
from ..core.masks import causal_mask_static_kv, prefix_lm_mask
from ..layers import positional as pos
from ..layers.kv_cache import init_cache
from ..layers.modern import modern_layer_init, modern_layer_apply
from .outputs import CLMOutput


class GemmaModel(StructuralIdentity):
    def __init__(self, config: GemmaConfig) -> None:
        self.config = config
        self.emb_freq = pos.rope_freqs(config.max_position_embeddings,
                                       config.head_dim,
                                       theta=config.rope_theta)

    def init(self, key, dtype=jnp.float32):
        cfg = self.config
        k_emb, k_layers = jax.random.split(key)
        keys = jax.random.split(k_layers, cfg.num_hidden_layers)
        return {
            "embed_tokens": cnn.embedding_init(
                k_emb, cfg.vocab_size, cfg.hidden_size, dtype=dtype),
            "layers": jax.vmap(
                lambda k: modern_layer_init(k, cfg, dtype=dtype))(keys),
            "norm": cnn.rms_norm_init(cfg.hidden_size, dtype=dtype),
        }

    def init_cache(self, *, batch_size: int = 1, max_len: Optional[int] = None,
                   dtype=jnp.float32):
        cfg = self.config
        return init_cache(cfg, batch_size=batch_size, max_len=max_len,
                          dtype=dtype, num_kv_heads=cfg.num_key_value_heads,
                          head_dim=cfg.head_dim)

    def apply(self, params, input_ids=None, attention_mask=None,
              inputs_embeds=None, prefix_len=None,
              cache: Optional[Any] = None, start_pos=0,
              position_offset: int = 0) -> CLMOutput:
        """``prefix_len`` (scalar or [B]) enables the prefix-LM regime:
        bidirectional attention over positions < prefix_len, causal after.
        ``inputs_embeds`` (already sqrt(hidden)-scaled fusion output)
        overrides token embedding. ``position_offset=1`` selects PaliGemma's
        1-indexed RoPE positions (reference ``paligemma.ipynb``
        ``position_ids = cache_position + 1``)."""
        cfg = self.config
        if inputs_embeds is None:
            hidden = cnn.embedding(params["embed_tokens"], input_ids)
            hidden = hidden * jnp.asarray(cfg.hidden_size ** 0.5, hidden.dtype)
        else:
            hidden = inputs_embeds
        bsz, seqlen = hidden.shape[:2]
        freqs = jax.lax.dynamic_slice_in_dim(
            self.emb_freq, start_pos + position_offset, seqlen, axis=1)

        causal = False
        if cache is not None:
            kv_cap = cache["k"].shape[3]
            mask = causal_mask_static_kv(seqlen, kv_cap, start_pos,
                                         attention_mask, batch_size=bsz)
            if prefix_len is not None:
                # open up bidirectional attention inside the prefix
                k_pos = jnp.arange(kv_cap)[None, None, None, :]
                plen = jnp.reshape(jnp.asarray(prefix_len), (-1, 1, 1, 1))
                in_prefix = k_pos < plen
                valid = k_pos < (start_pos + seqlen)
                mask = jnp.where(in_prefix & valid, 0.0, mask)
        elif prefix_len is not None:
            mask = prefix_lm_mask(seqlen, prefix_len, attention_mask,
                                  batch_size=bsz)
        else:
            mask = None
            causal = True

        def body(h, xs):
            lp, ck, cv = xs
            out, new_kv = modern_layer_apply(
                lp, h, cfg, freqs=freqs, mask=mask, causal=causal,
                cache_kv=(ck, cv), start_pos=start_pos,
                rms_eps=cfg.rms_norm_eps, rms_plus_one=True,
                mlp_act="gelu_pytorch_tanh")
            return out, new_kv

        def body_nocache(h, xs):
            out, _ = modern_layer_apply(
                xs, h, cfg, freqs=freqs, mask=mask, causal=causal,
                rms_eps=cfg.rms_norm_eps, rms_plus_one=True,
                mlp_act="gelu_pytorch_tanh")
            return out, None

        if cache is not None:
            hidden, (nk, nv) = jax.lax.scan(
                body, hidden, (params["layers"], cache["k"], cache["v"]))
            new_cache = {"k": nk, "v": nv,
                         "length": jnp.asarray(start_pos + seqlen, jnp.int32)}
        else:
            hidden, _ = jax.lax.scan(body_nocache, hidden, params["layers"])
            new_cache = None

        hidden = cnn.rms_norm(params["norm"], hidden, eps=cfg.rms_norm_eps,
                              plus_one=True)
        # tied lm head
        logits = cnn.tied_lm_head(params["embed_tokens"], hidden)
        return CLMOutput(hidden_state=hidden, logits=logits,
                         kv_cache=new_cache)

    __call__ = apply
