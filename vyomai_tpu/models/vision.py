"""Vision Transformer (reference ``VyomAI/models/vision_encoder.py``).

Patchify is a conv with kernel == stride == patch_size (reference
``vision_encoder.py:83-88``) expressed as ``lax.conv_general_dilated`` —
XLA lowers this to a reshape + one MXU matmul on TPU, which is the
fused-patchify the north star asks for. CLS token prepended, learned
absolute position embeddings over patches+1, then encoder layers with the
fused-qkv VisionAttention.

Note: as in the reference, the CLS/pos-embedding feature size must equal
``hidden_size`` (the reference sizes them as ``patch_dim = C*ph*pw``, which
only type-checks when ``patch_dim == hidden_size``, e.g. ViT-base 3*16*16 =
768). We size them as ``hidden_size`` directly.
"""

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import VisionConfig, StructuralIdentity
from ..core.masks import bidirectional_mask
from ..layers import attention as attn
from ..layers import ffn as ffn_mod
from ..layers import positional as pos
from .encoder import stacked_layers_init
from .outputs import EncoderOutput


def _vision_layer_init(key, config, kind, dtype):
    k1, k2 = jax.random.split(key)
    return {
        "attention": attn.attention_init(k1, config, kind="vision",
                                         dtype=dtype),
        "ffn": ffn_mod.ffn_init(k2, config, dtype=dtype),
    }


class Vit(StructuralIdentity):
    """Functional ViT. ``apply(params, pixel_values [B,C,H,W])`` ->
    ``EncoderOutput`` of shape [B, num_patches+1, hidden]."""

    _identity_fields = ("pos_embedding_type",)

    def __init__(self, config: VisionConfig,
                 pos_embedding_type: Optional[str] = "absolute") -> None:
        self.config = config
        self.pos_embedding_type = pos_embedding_type

    def init(self, key, dtype=jnp.float32):
        cfg = self.config
        k_conv, k_cls, k_pos, k_layers = jax.random.split(key, 4)
        ph, pw = cfg.patch_size
        params = {
            "pixel_seq": {
                # torch conv layout [out, in, kh, kw] for import parity
                "kernel": (jax.random.normal(
                    k_conv, (cfg.hidden_size, cfg.num_channels, ph, pw))
                    * cfg.initializer_range).astype(dtype),
                "bias": jnp.zeros((cfg.hidden_size,), dtype=dtype),
            },
            "cls_token": jax.random.normal(
                k_cls, (1, 1, cfg.hidden_size)).astype(dtype),
            "layers": stacked_layers_init(k_layers, cfg, "vision", dtype,
                                          layer_init=_vision_layer_init),
        }
        if self.pos_embedding_type == "absolute":
            params["position_embeddings"] = pos.vit_absolute_init(
                k_pos, cfg.num_patches + 1, cfg.hidden_size, dtype=dtype)
        return params

    def patchify(self, params, pixel_values):
        """[B,C,H,W] -> [B, num_patches, hidden] (conv -> flatten)."""
        kern = params["pixel_seq"]["kernel"]
        out = jax.lax.conv_general_dilated(
            pixel_values.astype(kern.dtype), kern,
            window_strides=self.config.patch_size, padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        out = out + params["pixel_seq"]["bias"][None, :, None, None]
        b, d, h, w = out.shape
        return out.reshape(b, d, h * w).transpose(0, 2, 1)

    def apply(self, params, pixel_values, attention_mask=None, *,
              deterministic: bool = True, rng=None) -> EncoderOutput:
        cfg = self.config
        hidden = self.patchify(params, pixel_values)
        bsz = hidden.shape[0]
        cls = jnp.broadcast_to(params["cls_token"],
                               (bsz, 1, cfg.hidden_size)).astype(hidden.dtype)
        hidden = jnp.concatenate([cls, hidden], axis=1)
        if self.pos_embedding_type == "absolute":
            # Parity quirk: the reference's VitAbsoluteEncoding mutates its
            # input in place (``img_seq += pos``) and returns the same
            # tensor, which the caller then adds again
            # (``vision_encoder.py:125-127`` + ``positional_embeddings.py:225``)
            # — the net effect is 2 * (patches+cls+pos). Replicated exactly.
            hidden = 2.0 * pos.vit_absolute_add(
                params["position_embeddings"], hidden)
        # no pad mask -> no additive bias at all (images are never padded;
        # skipping the [B,1,1,L] broadcast-add keeps the attention fusion
        # clean instead of streaming a zero mask through every layer)
        mask = None if attention_mask is None \
            else bidirectional_mask(attention_mask)

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
            a_rng = lrng[0] if not deterministic else None
            f_rng = lrng[1] if not deterministic else None
            out = attn.encoder_attention_apply(
                lp["attention"], h, mask, cfg, kind="vision",
                deterministic=deterministic, rng=a_rng)
            out = ffn_mod.ffn_apply(lp["ffn"], out, h, cfg,
                                    deterministic=deterministic, rng=f_rng)
            return out, None

        hidden, _ = jax.lax.scan(body, hidden, (params["layers"], layer_rngs))
        return EncoderOutput(logits=hidden)

    __call__ = apply

    @classmethod
    def from_config(cls, config,
                    pos_embedding_type: Optional[str] = "absolute") -> "Vit":
        return cls(config, pos_embedding_type)
