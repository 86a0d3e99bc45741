"""CLIP dual-encoder (reference README.md:20-27 — the ``clip.ipynb``
contrastive pretraining workload, Flickr30k).

Text tower: library EncoderModel (CLS pooled); vision tower: library Vit
(CLS pooled); linear projections to a shared space; learned temperature.
The contrastive loss lives in ``training.losses.clip_loss`` and all-gathers
negatives over the mesh's data axis for global-batch contrastive training
(BASELINE north star).
"""

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import CLIPConfig, StructuralIdentity
from ..core import nn as cnn
from .encoder import EncoderModel
from .vision import Vit


class CLIPModel(StructuralIdentity):
    _identity_fields = ("text_model",)

    def __init__(self, config: CLIPConfig,
                 text_pos_embedding_type: str = "absolute",
                 text_attention_type: Optional[str] = None) -> None:
        self.config = config
        self.text_model = EncoderModel(config.text_config,
                                       text_pos_embedding_type,
                                       text_attention_type)
        self.vision_model = Vit(config.vision_config)

    def init(self, key, dtype=jnp.float32):
        cfg = self.config
        k1, k2, k3, k4 = jax.random.split(key, 4)
        return {
            "text_model": self.text_model.init(k1, dtype=dtype),
            "vision_model": self.vision_model.init(k2, dtype=dtype),
            "text_projection": cnn.linear_init(
                k3, cfg.text_config.hidden_size, cfg.projection_dim,
                bias=False, dtype=dtype),
            "visual_projection": cnn.linear_init(
                k4, cfg.vision_config.hidden_size, cfg.projection_dim,
                bias=False, dtype=dtype),
            "logit_scale": jnp.asarray(cfg.logit_scale_init, dtype=jnp.float32),
        }

    def encode_text(self, params, input_ids, attention_mask=None, **kw):
        out = self.text_model.apply(params["text_model"], input_ids,
                                    attention_mask, **kw)
        return cnn.linear(params["text_projection"], out.logits[:, 0, :])

    def encode_image(self, params, pixel_values, **kw):
        out = self.vision_model.apply(params["vision_model"], pixel_values,
                                      **kw)
        return cnn.linear(params["visual_projection"], out.logits[:, 0, :])

    def apply(self, params, input_ids=None, pixel_values=None,
              attention_mask=None, **kw):
        """Returns (image_embeds, text_embeds, logit_scale)."""
        txt = self.encode_text(params, input_ids, attention_mask, **kw)
        img = self.encode_image(params, pixel_values, **kw)
        return img, txt, params["logit_scale"]

    __call__ = apply
