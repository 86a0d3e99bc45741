"""Seq2seq (BART-like) encoder-decoder (reference
``VyomAI/models/encoder_decoder.py``).

TPU-first: decoder self-attention uses the static KV cache; cross-attention
K/V are projected from the encoder output once (``precompute_cross_kv``) and
passed into decode steps as a pytree — the jittable equivalent of the
reference's first-iteration hook-cache capture
(``layers/attention.py:439-462``).

Note on the reference's ``attention_type == "gqa" == "gqa"`` expression
(``encoder_decoder.py:47-51``): Python chained comparison makes it exactly
``attention_type == "gqa"``, so cross-attention GQA selection follows the
decoder's — replicated here straightforwardly.

Parity quirk preserved: the FFN residual adds the *pre-self-attention*
hidden state (``encoder_decoder.py:82``).
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
from .encoder import EncoderModel, lm_head_init, lm_head_apply
from .outputs import Seq2SeqOutput


def _seq2seq_layer_init(key, config, kind, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "attention": attn.attention_init(k1, config, kind=kind, dtype=dtype),
        "cross_attention": attn.attention_init(k2, config, kind=kind,
                                               dtype=dtype),
        "ffn": ffn_mod.ffn_init(k3, config, dtype=dtype),
    }


class Seq2SeqDecoderModel(StructuralIdentity):
    """Decoder stack with self- + cross-attention
    (reference ``encoder_decoder.py:111-258``)."""

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
        k_emb, k_pos, k_layers = jax.random.split(key, 3)
        keys = jax.random.split(k_layers, cfg.num_hidden_layers)
        params = {
            "word_embeddings": cnn.embedding_init(
                k_emb, cfg.vocab_size, cfg.hidden_size,
                std=cfg.initializer_range,
                pad_idx=getattr(cfg, "pad_token_id", None), dtype=dtype),
            "layers": jax.vmap(
                lambda k: _seq2seq_layer_init(k, cfg, self.kind, dtype))(keys),
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

    def precompute_cross_kv(self, params, encoder_hidden):
        """Project encoder output to per-layer cross K/V once
        (encode-once decode-many). Returns stacked (k, v): [L, B, H_kv, Le, D]."""
        cfg = self.config

        def one(lp):
            return attn.cross_attention_kv(lp["cross_attention"],
                                           encoder_hidden, cfg, self.kind)
        k, v = jax.vmap(one)(params["layers"])
        return {"k": k, "v": v}

    def _embed(self, params, input_ids, start_pos):
        seqlen = input_ids.shape[1]
        pad = getattr(self.config, "pad_token_id", None)
        hidden = cnn.embedding(params["word_embeddings"], input_ids,
                               pad_idx=pad)
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
        return hidden, freqs

    def apply(self, params, input_ids, attention_mask=None,
              encoder_hidden_state=None, encoder_attention_mask=None,
              cache: Optional[Any] = None, cross_kv: Optional[Any] = None,
              start_pos=0, *, deterministic: bool = True, rng=None):
        """Returns (hidden, new_cache). ``encoder_attention_mask`` must be
        additive [B,1,1,Le] (built by ``EncoderDecoderModel.apply``)."""
        cfg, kind = self.config, self.kind
        bsz, seqlen = input_ids.shape
        hidden, freqs = self._embed(params, input_ids, start_pos)

        if cache is not None:
            kv_cap = cache["k"].shape[3]
            mask = causal_mask_static_kv(seqlen, kv_cap, start_pos,
                                         attention_mask, batch_size=bsz)
            self_causal = False
        else:
            mask = None if attention_mask is None else \
                bidirectional_mask(attention_mask)
            self_causal = True

        n_layers = cfg.num_hidden_layers
        if not deterministic:
            if rng is None:
                raise ValueError(
                    "deterministic=False requires an rng key for dropout")
            layer_rngs = jax.random.split(rng, n_layers * 3).reshape(n_layers, 3, 2)
        else:
            layer_rngs = jnp.zeros((n_layers, 3, 2), dtype=jnp.uint32)

        use_cache = cache is not None
        use_cross_kv = cross_kv is not None
        if use_cache and not use_cross_kv:
            raise ValueError(
                "cache requires cross_kv: cached decode reads the "
                "encode-once cross K/V — build both with "
                "EncoderDecoderModel.setup_cache (or precompute_cross_kv)")

        def body(h, xs):
            if use_cache:
                lp, lrng, ck, cv, xk, xv = xs
                cache_kv = (ck, cv)
            elif use_cross_kv:
                lp, lrng, xk, xv = xs
                cache_kv = None
            else:
                lp, lrng = xs
                cache_kv = None
                xk = xv = None
            r = (None, None, None) if deterministic else tuple(lrng)
            out, new_kv = attn.decoder_attention_apply(
                lp["attention"], h, mask, cfg, kind=kind, freqs=freqs,
                cache_kv=cache_kv, start_pos=start_pos,
                causal=self_causal and not use_cache,
                deterministic=deterministic, rng=r[0])
            out, _ = attn.cross_attention_apply(
                lp["cross_attention"], out, cfg, kind=kind,
                encoder_hidden=encoder_hidden_state,
                encoder_attention_mask=encoder_attention_mask,
                cached_kv=(xk, xv) if xk is not None else None,
                deterministic=deterministic, rng=r[1])
            # FFN residual uses pre-self-attention hidden (parity quirk).
            out = ffn_mod.ffn_apply(lp["ffn"], out, h, cfg,
                                    deterministic=deterministic, rng=r[2])
            return out, new_kv

        if use_cache:
            xs = (params["layers"], layer_rngs, cache["k"], cache["v"],
                  cross_kv["k"], cross_kv["v"])
            hidden, (nk, nv) = jax.lax.scan(body, hidden, xs)
            new_cache = {"k": nk, "v": nv,
                         "length": jnp.asarray(start_pos + seqlen, jnp.int32)}
        elif use_cross_kv:
            xs = (params["layers"], layer_rngs, cross_kv["k"], cross_kv["v"])
            hidden, _ = jax.lax.scan(body, hidden, xs)
            new_cache = None
        else:
            xs = (params["layers"], layer_rngs)
            hidden, _ = jax.lax.scan(body, hidden, xs)
            new_cache = None
        return hidden, new_cache

    @classmethod
    def from_config(cls, config) -> "Seq2SeqDecoderModel":
        return cls(config)


class EncoderDecoderModel(StructuralIdentity):
    """Encoder + seq2seq decoder + LM head
    (reference ``encoder_decoder.py:261-391``)."""

    def _identity(self) -> tuple:  # composed of sub-models, no own config
        return (type(self).__name__, self.encoder, self.decoder)

    def __init__(self, encoder_config, decoder_config,
                 encoder: Optional[EncoderModel] = None,
                 encoder_pos_embedding_type: Optional[str] = "absolute",
                 encoder_attention_type: Optional[str] = None,
                 decoder_pos_embedding_type: Optional[str] = "absolute",
                 decoder_attention_type: Optional[str] = None) -> None:
        self.is_gqa = decoder_attention_type == "gqa"
        self.decoder_config = decoder_config
        self.encoder = encoder if encoder is not None else EncoderModel(
            encoder_config, encoder_pos_embedding_type, encoder_attention_type)
        self.decoder = Seq2SeqDecoderModel(
            decoder_config, decoder_pos_embedding_type, decoder_attention_type)

    def init(self, key, dtype=jnp.float32):
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "encoder": self.encoder.init(k1, dtype=dtype),
            "decoder": self.decoder.init(k2, dtype=dtype),
            "lm_head": lm_head_init(k3, self.decoder_config, dtype=dtype),
        }

    def apply(self, params, input_ids=None, attention_mask=None,
              decoder_input_ids=None, decoder_attention_mask=None,
              encoder_output=None, cache=None, cross_kv=None, start_pos=0, *,
              deterministic: bool = True, rng=None) -> Seq2SeqOutput:
        if rng is not None and not deterministic:
            rng_enc, rng_dec = jax.random.split(rng)
        else:
            rng_enc = rng_dec = None
        if encoder_output is None:
            encoder_output = self.encoder.apply(
                params["encoder"], input_ids, attention_mask,
                deterministic=deterministic, rng=rng_enc).logits
        if attention_mask is None:
            b, le = encoder_output.shape[:2]
            attention_mask = jnp.ones((b, le), dtype=jnp.float32)
        encoder_attention_mask = bidirectional_mask(attention_mask)

        hidden, new_cache = self.decoder.apply(
            params["decoder"], decoder_input_ids, decoder_attention_mask,
            encoder_hidden_state=encoder_output,
            encoder_attention_mask=encoder_attention_mask,
            cache=cache, cross_kv=cross_kv, start_pos=start_pos,
            deterministic=deterministic, rng=rng_dec)
        logits = lm_head_apply(params["lm_head"], hidden, self.decoder_config)
        out = Seq2SeqOutput(logits=logits, key_value_states=encoder_output)
        if cache is not None:
            return out, new_cache
        return out

    __call__ = apply

    def get_encoder(self):
        return self.encoder

    def get_encoder_output(self, params, input_ids, attention_mask):
        return self.encoder.apply(params["encoder"], input_ids, attention_mask)

    def get_decoder(self):
        return self.decoder

    def setup_cache(self, params, encoder_output, *, batch_size: int,
                    max_len: int, dtype=jnp.float32):
        """Jit-friendly replacement for the reference's ``_setup_cache``
        hook attachment: returns (self_attn_cache, cross_kv)."""
        cache = self.decoder.init_cache(batch_size=batch_size,
                                        max_len=max_len, dtype=dtype)
        cross_kv = self.decoder.precompute_cross_kv(params["decoder"],
                                                    encoder_output)
        return cache, cross_kv

    @classmethod
    def from_config(cls, encoder_config, decoder_config, encoder=None,
                    encoder_pos_embedding_type="absolute",
                    encoder_attention_type=None,
                    decoder_pos_embedding_type="absolute",
                    decoder_attention_type=None) -> "EncoderDecoderModel":
        return cls(encoder_config, decoder_config, encoder,
                   encoder_pos_embedding_type, encoder_attention_type,
                   decoder_pos_embedding_type, decoder_attention_type)
