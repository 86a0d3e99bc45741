"""Vision-language model with CLS-prepend fusion
(reference ``VyomAI/models/multimodel.py``).

Fusion: at ``start_pos == 0`` the vision encoder's CLS embedding is
prepended as the first decoder token (``multimodel.py:163-169``), extending
the mask by one. The decoder is a standard causal LM stack over the fused
sequence with the static KV cache.
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..config import EncoderConfig, StructuralIdentity
from ..core import nn as cnn
from ..core.masks import bidirectional_mask, causal_mask_static_kv
from ..layers import attention as attn
from ..layers import ffn as ffn_mod
from ..layers import positional as pos
from ..layers.kv_cache import init_cache
from .encoder import lm_head_init, lm_head_apply, stacked_layers_init
from .outputs import DecoderOutput


class VisionLanguageDecoderModel(StructuralIdentity):
    """Causal decoder that prepends an image CLS embedding at step 0
    (reference ``multimodel.py:97-255``)."""

    _identity_fields = ("pos_embedding_type", "kind")

    def __init__(self, config: EncoderConfig,
                 pos_embedding_type: Optional[str] = "absolute",
                 attention_type: Optional[str] = None) -> None:
        self.config = config
        self.pos_embedding_type = pos_embedding_type
        self.kind = "gqa" if attention_type == "gqa" else "mha"
        self.is_gqa = attention_type == "gqa"
        if pos_embedding_type == "rope":
            self.emb_freq = pos.rope_freqs(config.max_position_embeddings,
                                           config.head_dim)
        elif pos_embedding_type == "sinusoidal":
            self.sin_table = pos.sinusoidal_table(
                config.max_position_embeddings, config.hidden_size)

    def init(self, key, dtype=jnp.float32):
        cfg = self.config
        k_emb, k_pos, k_layers, k_head = jax.random.split(key, 4)
        params = {
            "word_embeddings": cnn.embedding_init(
                k_emb, cfg.vocab_size, cfg.hidden_size,
                std=cfg.initializer_range,
                pad_idx=getattr(cfg, "pad_token_id", None), dtype=dtype),
            "layers": stacked_layers_init(k_layers, cfg, self.kind, dtype),
            "lm_head": lm_head_init(k_head, cfg, dtype=dtype),
        }
        if self.pos_embedding_type == "absolute":
            params["position_embeddings"] = pos.absolute_init(k_pos, cfg,
                                                              dtype=dtype)
        return params

    def init_cache(self, *, batch_size: int = 1, max_len: Optional[int] = None,
                   dtype=jnp.float32):
        cfg = self.config
        nkv = cfg.num_key_value_heads if self.is_gqa else cfg.num_attention_heads
        return init_cache(cfg, batch_size=batch_size, max_len=max_len,
                          dtype=dtype, num_kv_heads=nkv)

    def apply(self, params, input_ids, attention_mask=None,
              encoder_hidden_state=None, cache: Optional[Any] = None,
              start_pos=0, *, fuse_image: bool = True,
              deterministic: bool = True, rng=None):
        """``fuse_image=True`` prepends the image CLS embedding (only valid
        when ``start_pos == 0`` — a static Python decision, mirroring the
        reference's ``if start_pos == 0`` branch)."""
        cfg, kind = self.config, self.kind
        bsz = input_ids.shape[0]
        pad = getattr(cfg, "pad_token_id", None)
        hidden = cnn.embedding(params["word_embeddings"], input_ids,
                               pad_idx=pad)
        if fuse_image:
            hidden = jnp.concatenate(
                [encoder_hidden_state[:, None, :].astype(hidden.dtype), hidden],
                axis=1)
            if attention_mask is not None:
                attention_mask = jnp.concatenate(
                    [jnp.ones((bsz, 1), dtype=attention_mask.dtype),
                     attention_mask], axis=1)
        seqlen = hidden.shape[1]

        freqs = None
        if self.pos_embedding_type == "absolute":
            hidden = hidden + pos.absolute_slice(
                params["position_embeddings"], start_pos, seqlen,
                pad_idx=pad).astype(hidden.dtype)
        elif self.pos_embedding_type == "sinusoidal":
            tab = jax.lax.dynamic_slice_in_dim(self.sin_table, start_pos,
                                               seqlen, axis=1)
            hidden = hidden + tab.astype(hidden.dtype)
        elif self.pos_embedding_type == "rope":
            freqs = jax.lax.dynamic_slice_in_dim(self.emb_freq, start_pos,
                                                 seqlen, axis=1)

        if cache is not None:
            kv_cap = cache["k"].shape[3]
            mask = causal_mask_static_kv(seqlen, kv_cap, start_pos,
                                         attention_mask, batch_size=bsz)
            causal = False
        else:
            mask = None if attention_mask is None else \
                bidirectional_mask(attention_mask)
            causal = True

        n_layers = cfg.num_hidden_layers
        if not deterministic:
            if rng is None:
                raise ValueError(
                    "deterministic=False requires an rng key for dropout")
            layer_rngs = jax.random.split(rng, n_layers * 2).reshape(n_layers, 2, 2)
        else:
            layer_rngs = jnp.zeros((n_layers, 2, 2), dtype=jnp.uint32)

        use_cache = cache is not None

        def body(h, xs):
            if use_cache:
                lp, lrng, ck, cv = xs
                ckv = (ck, cv)
            else:
                lp, lrng = xs
                ckv = None
            a_rng = lrng[0] if not deterministic else None
            f_rng = lrng[1] if not deterministic else None
            out, new_kv = attn.decoder_attention_apply(
                lp["attention"], h, mask, cfg, kind=kind, freqs=freqs,
                cache_kv=ckv, start_pos=start_pos, causal=causal and not use_cache,
                deterministic=deterministic, rng=a_rng)
            out = ffn_mod.ffn_apply(lp["ffn"], out, h, cfg,
                                    deterministic=deterministic, rng=f_rng)
            return out, new_kv

        if use_cache:
            xs = (params["layers"], layer_rngs, cache["k"], cache["v"])
            hidden, (nk, nv) = jax.lax.scan(body, hidden, xs)
            new_cache = {"k": nk, "v": nv,
                         "length": jnp.asarray(start_pos + seqlen, jnp.int32)}
        else:
            hidden, _ = jax.lax.scan(body, hidden,
                                     (params["layers"], layer_rngs))
            new_cache = None
        logits = lm_head_apply(params["lm_head"], hidden, cfg)
        if use_cache:
            return DecoderOutput(logits=logits), new_cache
        return DecoderOutput(logits=logits)

    @classmethod
    def from_config(cls, config, pos_embedding_type="absolute",
                    attention_type=None) -> "VisionLanguageDecoderModel":
        return cls(config, pos_embedding_type, attention_type)


class VisionLanguageModel(StructuralIdentity):
    """Vision encoder + CLS-fusion decoder
    (reference ``multimodel.py:258-314``)."""

    def _identity(self) -> tuple:  # composed of sub-models, no own config
        return (type(self).__name__, self.encoder, self.decoder)

    def __init__(self, config: EncoderConfig, encoder,
                 pos_embedding_type: Optional[str] = "absolute",
                 attention_type: Optional[str] = None) -> None:
        self.is_gqa = attention_type == "gqa"
        self.encoder = encoder
        self.decoder = VisionLanguageDecoderModel(
            config, pos_embedding_type, attention_type)

    def init(self, key, dtype=jnp.float32):
        k1, k2 = jax.random.split(key)
        return {
            "encoder": self.encoder.init(k1, dtype=dtype),
            "decoder": self.decoder.init(k2, dtype=dtype),
        }

    def encode(self, params, pixel_values):
        """Vision CLS embedding [B, D] (reference ``get_encoder_output``)."""
        return self.encoder.apply(params["encoder"],
                                  pixel_values=pixel_values).logits[:, 0, :]

    def apply(self, params, pixel_values=None, decoder_input_ids=None,
              decoder_attention_mask=None, encoder_output=None,
              cache=None, start_pos=0, *, fuse_image=True,
              deterministic: bool = True, rng=None):
        if encoder_output is None:
            encoder_output = self.encode(params, pixel_values)
        return self.decoder.apply(
            params["decoder"], decoder_input_ids, decoder_attention_mask,
            encoder_hidden_state=encoder_output, cache=cache,
            start_pos=start_pos, fuse_image=fuse_image,
            deterministic=deterministic, rng=rng)

    __call__ = apply

    def get_decoder(self):
        return self.decoder

    def get_encoder_output(self, params, pixel_values):
        return self.encode(params, pixel_values)
