"""RPAD-style vision-language captioner (reference
``vyom-ai-accelerate-multimodel-2t4.ipynb`` — SURVEY.md §2.2 N14, and the
missing-blob RPAD workload of N17).

A ViT encoder's full patch sequence (197 tokens for ViT-base/224) replaces
an ``<image>``-token span in a right-padded prompt (the reference's
``masked_scatter``), with the prefix-LM mask: bidirectional over
image+prompt during training, causal over the caption suffix; decoding
attends the whole cached prefix. The same scatter/prefix machinery as
PaliGemma, but over the library ViT + classic DecoderModel stack."""

from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..config import EncoderConfig, StructuralIdentity
from ..core import nn as cnn
from ..core.masks import (bidirectional_mask, causal_mask_static_kv,
                          prefix_lm_mask)
from .decoder import DecoderModel
from .outputs import CLMOutput
from .vision import Vit


class RPADVisionLanguageModel(StructuralIdentity):
    """ViT + decoder with image-token scatter fusion.

    ``image_token_id`` marks the span in ``input_ids`` that receives the
    ViT patch sequence (CLS + patches, projected to the decoder width)."""

    _identity_fields = ("encoder", "decoder", "image_token_id")

    def __init__(self, config: EncoderConfig, vision_encoder: Vit,
                 image_token_id: int,
                 pos_embedding_type: Optional[str] = "rope",
                 attention_type: Optional[str] = None) -> None:
        self.config = config
        self.encoder = vision_encoder
        self.decoder = DecoderModel(config, pos_embedding_type,
                                    attention_type)
        self.image_token_id = image_token_id

    def init(self, key, dtype=jnp.float32):
        k1, k2, k3 = jax.random.split(key, 3)
        params = {
            "encoder": self.encoder.init(k1, dtype=dtype),
            "decoder": self.decoder.init(k2, dtype=dtype),
        }
        if self.encoder.config.hidden_size != self.config.hidden_size:
            params["projector"] = cnn.linear_init(
                k3, self.encoder.config.hidden_size, self.config.hidden_size,
                dtype=dtype)
        return params

    def init_cache(self, **kw):
        return self.decoder.init_cache(**kw)

    def encode_image(self, params, pixel_values):
        """Full patch sequence [B, P+1, D_dec]."""
        feats = self.encoder.apply(params["encoder"], pixel_values).logits
        if "projector" in params:
            feats = cnn.linear(params["projector"], feats)
        return feats

    def embed_fused(self, params, input_ids, pixel_values):
        text = cnn.embedding(params["decoder"]["word_embeddings"], input_ids,
                             pad_idx=getattr(self.config, "pad_token_id",
                                             None))
        img = self.encode_image(params, pixel_values).astype(text.dtype)
        is_img = input_ids == self.image_token_id
        idx = jnp.clip(jnp.cumsum(is_img, axis=1) - 1, 0, img.shape[1] - 1)
        gathered = jnp.take_along_axis(img, idx[..., None], axis=1)
        return jnp.where(is_img[..., None], gathered, text)

    def apply(self, params, input_ids, pixel_values=None,
              attention_mask=None, token_type_ids=None,
              cache: Optional[Any] = None, start_pos=0, *,
              deterministic: bool = True, rng=None) -> CLMOutput:
        """``token_type_ids``: 0 = image+prompt prefix, 1 = caption suffix
        (prefix-LM training mask, reference ``_update_causal_mask``)."""
        dec = self.decoder
        if pixel_values is not None:
            hidden = self.embed_fused(params, input_ids, pixel_values)
        else:
            hidden = cnn.embedding(params["decoder"]["word_embeddings"],
                                   input_ids,
                                   pad_idx=getattr(self.config,
                                                   "pad_token_id", None))
        seqlen = hidden.shape[1]
        bsz = hidden.shape[0]
        # positional
        freqs = None
        if dec.pos_embedding_type == "absolute":
            from ..layers import positional as pos
            hidden = hidden + pos.absolute_slice(
                params["decoder"]["position_embeddings"], start_pos, seqlen,
                pad_idx=getattr(self.config, "pad_token_id",
                                None)).astype(hidden.dtype)
        elif dec.pos_embedding_type == "rope":
            freqs = jax.lax.dynamic_slice_in_dim(dec.emb_freq, start_pos,
                                                 seqlen, axis=1)

        causal = False
        if cache is not None:
            kv_cap = cache["k"].shape[3]
            mask = causal_mask_static_kv(seqlen, kv_cap, start_pos,
                                         attention_mask, batch_size=bsz)
        elif token_type_ids is not None:
            prefix_len = jnp.sum(token_type_ids == 0, axis=1)
            mask = prefix_lm_mask(seqlen, prefix_len, attention_mask,
                                  batch_size=bsz)
        else:
            mask = None if attention_mask is None else \
                bidirectional_mask(attention_mask)
            causal = True

        hidden, new_cache = dec.run_layers(
            params["decoder"], hidden, mask, freqs, cache, start_pos,
            causal=causal, deterministic=deterministic, rng=rng)
        from .encoder import lm_head_apply
        logits = lm_head_apply(params["decoder"]["lm_head"], hidden,
                               self.config)
        return CLMOutput(hidden_state=hidden, logits=logits,
                         kv_cache=new_cache)

    __call__ = apply
