"""SigLIP vision tower (reference ``paligemma.ipynb`` ``SiglipVisionModel``).

Conv patchify + learned position embeddings (no CLS token), pre-LN
transformer blocks with tanh-GELU MLP, final post-LayerNorm. Patchify
lowers to a single MXU matmul under XLA.
"""

import jax
import jax.numpy as jnp

from ..config import SiglipVisionConfig, StructuralIdentity
from ..core import nn as cnn
from ..layers.attention import sdpa, _merge_heads


def _siglip_attention_init(key, cfg, dtype):
    h = cfg.hidden_size
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "q_proj": cnn.linear_init(k1, h, h, dtype=dtype),
        "k_proj": cnn.linear_init(k2, h, h, dtype=dtype),
        "v_proj": cnn.linear_init(k3, h, h, dtype=dtype),
        "out_proj": cnn.linear_init(k4, h, h, dtype=dtype),
    }


def _siglip_layer_init(key, cfg, dtype):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "layer_norm1": cnn.layer_norm_init(cfg.hidden_size, dtype=dtype),
        "self_attn": _siglip_attention_init(k1, cfg, dtype),
        "layer_norm2": cnn.layer_norm_init(cfg.hidden_size, dtype=dtype),
        "mlp": {
            "fc1": cnn.linear_init(k2, cfg.hidden_size,
                                   cfg.intermediate_size, dtype=dtype),
            "fc2": cnn.linear_init(k3, cfg.intermediate_size,
                                   cfg.hidden_size, dtype=dtype),
        },
    }


class SiglipVisionModel(StructuralIdentity):
    def __init__(self, config: SiglipVisionConfig) -> None:
        self.config = config

    def init(self, key, dtype=jnp.float32):
        cfg = self.config
        k_conv, k_pos, k_layers = jax.random.split(key, 3)
        keys = jax.random.split(k_layers, cfg.num_hidden_layers)
        return {
            "patch_embedding": {
                "kernel": (jax.random.normal(
                    k_conv, (cfg.hidden_size, cfg.num_channels,
                             cfg.patch_size, cfg.patch_size)) * 0.02
                    ).astype(dtype),
                "bias": jnp.zeros((cfg.hidden_size,), dtype=dtype),
            },
            "position_embedding": cnn.embedding_init(
                k_pos, cfg.num_patches, cfg.hidden_size, dtype=dtype),
            "layers": jax.vmap(
                lambda k: _siglip_layer_init(k, cfg, dtype))(keys),
            "post_layernorm": cnn.layer_norm_init(cfg.hidden_size,
                                                  dtype=dtype),
        }

    def apply(self, params, pixel_values):
        """[B, C, H, W] -> [B, num_patches, hidden]."""
        cfg = self.config
        kern = params["patch_embedding"]["kernel"]
        out = jax.lax.conv_general_dilated(
            pixel_values.astype(kern.dtype), kern,
            window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        out = out + params["patch_embedding"]["bias"][None, :, None, None]
        b, d, hh, ww = out.shape
        hidden = out.reshape(b, d, hh * ww).transpose(0, 2, 1)
        hidden = hidden + params["position_embedding"]["weight"][None]

        nh = cfg.num_attention_heads
        hd = cfg.head_dim
        eps = cfg.layer_norm_eps

        def body(h, lp):
            normed = cnn.layer_norm(lp["layer_norm1"], h, eps=eps)
            q = cnn.linear(lp["self_attn"]["q_proj"], normed)
            k = cnn.linear(lp["self_attn"]["k_proj"], normed)
            v = cnn.linear(lp["self_attn"]["v_proj"], normed)
            bsz, l, _ = q.shape
            q = q.reshape(bsz, l, nh, hd).transpose(0, 2, 1, 3)
            k = k.reshape(bsz, l, nh, hd).transpose(0, 2, 1, 3)
            v = v.reshape(bsz, l, nh, hd).transpose(0, 2, 1, 3)
            a = _merge_heads(sdpa(q, k, v))
            h = h + cnn.linear(lp["self_attn"]["out_proj"], a)
            normed = cnn.layer_norm(lp["layer_norm2"], h, eps=eps)
            m = cnn.linear(lp["mlp"]["fc1"], normed)
            m = cnn.gelu_tanh(m)
            h = h + cnn.linear(lp["mlp"]["fc2"], m)
            return h, None

        hidden, _ = jax.lax.scan(body, hidden, params["layers"])
        return cnn.layer_norm(params["post_layernorm"], hidden, eps=eps)

    __call__ = apply
