"""GOT-OCR2 reimplementation (reference ``ciphar-gocr2-0.ipynb`` — SURVEY.md
§2.2 N16): SAM-style vision encoder (window attention, decomposed relative
positions, global attention at layers [2, 5, 8, 11]) + strided conv stack
(256 -> 512 -> 1024) producing 256 image tokens + Qwen2-style CLM.

Image tokens replace an ``<imgpad>`` span in the prompt (same scatter-fusion
machinery as PaliGemma); decoding uses the standard static-cache loop, so
``generation.generate`` and the serving engine work unchanged on the text
side."""

from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..config import QwenConfig, StructuralIdentity
from ..core import nn as cnn
from .outputs import CLMOutput
from .qwen import ModelForCausalLM
from .sam_vit import ImageEncoderViT, SamVitConfig, _conv, _conv_init


@dataclass(frozen=True)
class GOTOCR2Config:
    vision_config: SamVitConfig = field(default_factory=SamVitConfig)
    text_config: QwenConfig = field(default_factory=QwenConfig)
    image_token_index: int = 151859  # <imgpad> in the reference vocab

    @property
    def num_image_tokens(self) -> int:
        # two stride-2 convs over the [grid/1] feature map -> (grid/4)^2
        return (self.vision_config.grid // 4) ** 2


class GOTOCR2Model(StructuralIdentity):
    def __init__(self, config: GOTOCR2Config):
        self.config = config
        self.vision = ImageEncoderViT(config.vision_config)
        self.language_model = ModelForCausalLM(config.text_config)

    def init(self, key, dtype=jnp.float32):
        cfg = self.config
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        oc = cfg.vision_config.out_chans
        return {
            "vision": self.vision.init(k1, dtype=dtype),
            # reference net_2/net_3: stride-2 convs 256 -> 512 -> 1024
            "net_2": _conv_init(k2, oc * 2, oc, 3, 3, dtype, bias=False),
            "net_3": _conv_init(k3, oc * 4, oc * 2, 3, 3, dtype, bias=False),
            "mm_projector": cnn.linear_init(
                k4, oc * 4, cfg.text_config.hidden_size, dtype=dtype),
            "language_model": self.language_model.init(k5, dtype=dtype),
        }

    def init_cache(self, **kw):
        return self.language_model.init_cache(**kw)

    def encode_image(self, params, pixel_values):
        """[B, 3, S, S] -> [B, num_image_tokens, text_hidden].

        The stride-2 convs use explicit symmetric (1, 1) padding — the
        reference's ``Conv2d(k=3, stride=2, padding=1)``. XLA "SAME" would
        pad (0, 1) at even sizes and shift the grid by one pixel."""
        x = self.vision.apply(params["vision"], pixel_values)
        x = _conv(params["net_2"], x, stride=2, padding=((1, 1), (1, 1)))
        x = _conv(params["net_3"], x, stride=2, padding=((1, 1), (1, 1)))
        b, c, h, w = x.shape
        x = x.reshape(b, c, h * w).transpose(0, 2, 1)    # [B, T_img, C]
        return cnn.linear(params["mm_projector"], x)

    def apply(self, params, input_ids, pixel_values=None,
              attention_mask=None, cache: Optional[Any] = None,
              start_pos=0) -> CLMOutput:
        cfg = self.config
        lm = params["language_model"]
        embeds = cnn.embedding(lm["embed_tokens"], input_ids)
        if pixel_values is not None:
            img = self.encode_image(params, pixel_values).astype(embeds.dtype)
            is_img = input_ids == cfg.image_token_index
            idx = jnp.clip(jnp.cumsum(is_img, axis=1) - 1, 0,
                           img.shape[1] - 1)
            gathered = jnp.take_along_axis(img, idx[..., None], axis=1)
            embeds = jnp.where(is_img[..., None], gathered, embeds)
        return self._lm_forward(lm, embeds, attention_mask, cache, start_pos)

    def _lm_forward(self, lm_params, embeds, attention_mask, cache,
                    start_pos):
        """Qwen forward from embeddings (the LM's apply takes ids, so the
        embedding lookup is bypassed here)."""
        model = self.language_model
        cfg = model.config
        bsz, seqlen = embeds.shape[:2]
        freqs = jax.lax.dynamic_slice_in_dim(model.emb_freq, start_pos,
                                             seqlen, axis=1)
        from ..core.masks import bidirectional_mask, causal_mask_static_kv
        from ..layers.modern import modern_layer_apply
        causal = False
        if cache is not None:
            kv_cap = cache["k"].shape[3]
            mask = causal_mask_static_kv(seqlen, kv_cap, start_pos,
                                         attention_mask, batch_size=bsz)
        else:
            mask = None if attention_mask is None else \
                bidirectional_mask(attention_mask)
            causal = True

        hidden = embeds

        def body_cache(h, xs):
            lp, ck, cv = xs
            return modern_layer_apply(lp, h, cfg, freqs=freqs, mask=mask,
                                      causal=causal, cache_kv=(ck, cv),
                                      start_pos=start_pos,
                                      rms_eps=cfg.rms_norm_eps)

        def body(h, lp):
            out, _ = modern_layer_apply(lp, h, cfg, freqs=freqs, mask=mask,
                                        causal=causal,
                                        rms_eps=cfg.rms_norm_eps)
            return out, None

        if cache is not None:
            hidden, (nk, nv) = jax.lax.scan(
                body_cache, hidden,
                (lm_params["layers"], cache["k"], cache["v"]))
            new_cache = {"k": nk, "v": nv,
                         "length": jnp.asarray(start_pos + seqlen, jnp.int32)}
        else:
            hidden, _ = jax.lax.scan(body, hidden, lm_params["layers"])
            new_cache = None

        hidden = cnn.rms_norm(lm_params["norm"], hidden,
                              eps=cfg.rms_norm_eps)
        if "lm_head" in lm_params:
            logits = cnn.linear(lm_params["lm_head"], hidden)
        else:
            logits = cnn.tied_lm_head(lm_params["embed_tokens"], hidden)
        return CLMOutput(hidden_state=hidden, logits=logits,
                         kv_cache=new_cache)

    __call__ = apply
