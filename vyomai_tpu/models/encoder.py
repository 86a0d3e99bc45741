"""BERT-style bidirectional encoder (reference ``VyomAI/models/encoder.py``).

TPU-first design: per-layer params are stacked on a leading layer axis and
the layer stack runs under ``lax.scan`` (one compiled layer body regardless
of depth). Positional dispatch matches the reference constructor contract:
``pos_embedding_type in {"absolute", "sinusoidal", "rope"}``,
``attention_type in {None ("vanila"), "gqa"}``.

Parity quirk preserved: each layer's FFN residual adds the *pre-attention*
block input (reference ``models/encoder.py:60-64``).
"""

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import EncoderConfig, StructuralIdentity
from ..core import nn as cnn
from ..core.masks import bidirectional_mask
from ..layers import attention as attn
from ..layers import ffn as ffn_mod
from ..layers import positional as pos
from .outputs import EncoderOutput, MLMOutput


def _layer_init(key, config, kind: str, dtype):
    k1, k2 = jax.random.split(key)
    return {
        "attention": attn.attention_init(k1, config, kind=kind, dtype=dtype),
        "ffn": ffn_mod.ffn_init(k2, config, dtype=dtype),
    }


def stacked_layers_init(key, config, kind: str, dtype, layer_init=_layer_init):
    """vmap the per-layer init over layer keys -> params with leading [L]."""
    keys = jax.random.split(key, config.num_hidden_layers)
    return jax.vmap(lambda k: layer_init(k, config, kind, dtype))(keys)


class EncoderModel(StructuralIdentity):
    """Functional encoder. ``init(key)`` -> params; ``apply(params, ...)``
    is pure/jittable and returns ``EncoderOutput(logits=last_hidden)``."""

    _identity_fields = ("pos_embedding_type", "kind", "remat")

    def __init__(self, config: EncoderConfig,
                 pos_embedding_type: Optional[str] = "absolute",
                 attention_type: Optional[str] = None,
                 remat: bool = False) -> None:
        self.config = config
        self.pos_embedding_type = pos_embedding_type
        self.kind = "gqa" if attention_type == "gqa" else "mha"
        # rematerialize layers in the backward pass (the jax.checkpoint
        # analogue of the reference's recompute-in-backward fused kernels).
        # True/"full" = everything recomputed (O(1)-in-depth memory);
        # "dots" = matmul outputs saved, elementwise recomputed — see
        # core.nn.remat_wrap for the MFU/memory trade.
        self.remat = remat
        # Constant tables (not params): fold into the jitted graph.
        if pos_embedding_type == "rope":
            self.emb_freq = pos.rope_freqs(config.max_position_embeddings,
                                           config.head_dim)
        elif pos_embedding_type == "sinusoidal":
            self.sin_table = pos.sinusoidal_table(
                config.max_position_embeddings, config.hidden_size)

    def init(self, key, dtype=jnp.float32):
        cfg = self.config
        k_emb, k_pos, k_layers = jax.random.split(key, 3)
        params = {
            "word_embeddings": cnn.embedding_init(
                k_emb, cfg.vocab_size, cfg.hidden_size,
                std=cfg.initializer_range,
                pad_idx=getattr(cfg, "pad_token_id", None), dtype=dtype),
            "layers": stacked_layers_init(k_layers, cfg, self.kind, dtype),
        }
        if self.pos_embedding_type == "absolute":
            params["position_embeddings"] = pos.absolute_init(k_pos, cfg,
                                                              dtype=dtype)
        return params

    def embed(self, params, input_ids):
        """Token + positional embedding; returns (hidden, freqs)."""
        seqlen = input_ids.shape[1]
        pad = getattr(self.config, "pad_token_id", None)
        hidden = cnn.embedding(params["word_embeddings"], input_ids,
                               pad_idx=pad)
        freqs = None
        if self.pos_embedding_type == "absolute":
            hidden = hidden + pos.absolute_slice(
                params["position_embeddings"], 0, seqlen,
                pad_idx=pad).astype(hidden.dtype)
        elif self.pos_embedding_type == "sinusoidal":
            hidden = hidden + self.sin_table[:, :seqlen].astype(hidden.dtype)
        elif self.pos_embedding_type == "rope":
            freqs = self.emb_freq[:, :seqlen]
        return hidden, freqs

    def run_layers(self, params, hidden, mask, freqs, *, deterministic=True,
                   rng=None):
        cfg, kind = self.config, self.kind
        n_layers = cfg.num_hidden_layers
        if not deterministic:
            if rng is None:
                raise ValueError(
                    "deterministic=False requires an rng key for dropout")
            layer_rngs = jax.random.split(rng, n_layers * 2).reshape(n_layers, 2, 2)
        else:
            layer_rngs = jnp.zeros((n_layers, 2, 2), dtype=jnp.uint32)

        def body(h, xs):
            lp, lrng = xs
            attn_rng = lrng[0] if not deterministic else None
            ffn_rng = lrng[1] if not deterministic else None
            out = attn.encoder_attention_apply(
                lp["attention"], h, mask, cfg, kind=kind, freqs=freqs,
                deterministic=deterministic, rng=attn_rng)
            # FFN residual uses the pre-attention hidden state (parity quirk).
            out = ffn_mod.ffn_apply(lp["ffn"], out, h, cfg,
                                    deterministic=deterministic, rng=ffn_rng)
            return out, None

        body = cnn.remat_wrap(body, self.remat)
        hidden, _ = jax.lax.scan(body, hidden, (params["layers"], layer_rngs))
        return hidden

    def apply(self, params, input_ids, attention_mask=None, *,
              deterministic: bool = True, rng=None) -> EncoderOutput:
        hidden, freqs = self.embed(params, input_ids)
        if attention_mask is None:
            attention_mask = jnp.ones(input_ids.shape, dtype=jnp.float32)
        mask = bidirectional_mask(attention_mask)
        hidden = self.run_layers(params, hidden, mask, freqs,
                                 deterministic=deterministic, rng=rng)
        return EncoderOutput(logits=hidden)

    __call__ = apply

    @classmethod
    def from_config(cls, config, pos_embedding_type: Optional[str] = "absolute",
                    attention_type: Optional[str] = None) -> "EncoderModel":
        return cls(config, pos_embedding_type, attention_type)


# ---------------------------------------------------------------------------
# LM head: dense -> exact GELU -> LN -> vocab projection (encoder.py:67-89)
# ---------------------------------------------------------------------------

def lm_head_init(key, config, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    std = config.initializer_range
    return {
        "dense": cnn.linear_init(k1, config.hidden_size, config.hidden_size,
                                 std=std, dtype=dtype),
        "layer_norm": cnn.layer_norm_init(config.hidden_size, dtype=dtype),
        "decoder": cnn.linear_init(k2, config.hidden_size, config.vocab_size,
                                   std=std, dtype=dtype),
    }


def lm_head_apply(p, hidden, config):
    x = cnn.linear(p["dense"], hidden)
    x = cnn.gelu(x)
    x = cnn.layer_norm(p["layer_norm"], x,
                       eps=getattr(config, "layer_norm_eps", 1e-6))
    return cnn.linear(p["decoder"], x)


class EncoderForMaskedLM(StructuralIdentity):
    """Encoder + MLM head (reference ``models/encoder.py:180-217``)."""

    _identity_fields = ("encoder",)

    def __init__(self, config: EncoderConfig,
                 pos_embedding_type: Optional[str] = "absolute",
                 attention_type: Optional[str] = None) -> None:
        self.config = config
        self.encoder = EncoderModel(config, pos_embedding_type, attention_type)

    def init(self, key, dtype=jnp.float32):
        k1, k2 = jax.random.split(key)
        return {
            "encoder": self.encoder.init(k1, dtype=dtype),
            "lm_head": lm_head_init(k2, self.config, dtype=dtype),
        }

    def apply(self, params, input_ids, attention_mask=None, *,
              deterministic: bool = True, rng=None) -> MLMOutput:
        out = self.encoder.apply(params["encoder"], input_ids, attention_mask,
                                 deterministic=deterministic, rng=rng)
        logits = lm_head_apply(params["lm_head"], out.logits, self.config)
        return MLMOutput(hidden_state=out.logits, logits=logits)

    __call__ = apply

    @classmethod
    def from_config(cls, config, pos_embedding_type: Optional[str] = "absolute",
                    attention_type: Optional[str] = None) -> "EncoderForMaskedLM":
        return cls(config, pos_embedding_type, attention_type)
