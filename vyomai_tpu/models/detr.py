"""DETR-style object detector (reference README.md:20-27 ``detr.ipynb``
workload — SURVEY.md §2.2 N17, Global Wheat detection).

CNN backbone (the OCR family's residual encoder) -> transformer encoder ->
non-causal query decoder (learned object queries, bidirectional self-attn +
cross-attn) -> class + box heads. The Hungarian matching of the set loss is
host-side (``scipy.optimize.linear_sum_assignment``), standard even for GPU
DETR; the loss itself is jittable given the assignment
(``training.detection``)."""

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..config import EncoderConfig, StructuralIdentity
from ..core import nn as cnn
from ..layers import attention as attn
from ..layers import ffn as ffn_mod
from .ocr import DeepResNetEncoder


@dataclass(frozen=True)
class DETRConfig:
    num_classes: int = 1            # Global Wheat: single foreground class
    num_queries: int = 100
    hidden_size: int = 256
    num_attention_heads: int = 8
    num_encoder_layers: int = 3
    num_decoder_layers: int = 3
    intermediate_size: int = 1024
    hidden_dropout_prob: float = 0.0
    layer_norm_eps: float = 1e-5
    initializer_range: float = 0.02
    hidden_act: str = "gelu"
    attention_bias: bool = True
    num_key_value_heads: int = 8

    @property
    def head_dim(self):
        return self.hidden_size // self.num_attention_heads


class DETRModel(StructuralIdentity):
    _identity_fields = ("in_channels",)

    def __init__(self, config: DETRConfig, in_channels: int = 3):
        self.config = config
        enc_cfg = EncoderConfig(
            hidden_size=config.hidden_size,
            num_attention_heads=config.num_attention_heads,
            num_hidden_layers=config.num_encoder_layers,
            intermediate_size=config.intermediate_size,
            hidden_dropout_prob=config.hidden_dropout_prob,
            layer_norm_eps=config.layer_norm_eps,
            hidden_act=config.hidden_act)
        self.enc_cfg = enc_cfg
        self.backbone = DeepResNetEncoder(enc_cfg, in_channels=in_channels)

    def init(self, key, dtype=jnp.float32):
        cfg = self.config
        keys = jax.random.split(key, 8)
        ecfg = self.enc_cfg

        def enc_layer(k):
            k1, k2 = jax.random.split(k)
            return {"attention": attn.attention_init(k1, ecfg, dtype=dtype),
                    "ffn": ffn_mod.ffn_init(k2, ecfg, dtype=dtype)}

        def dec_layer(k):
            k1, k2, k3 = jax.random.split(k, 3)
            return {"self_attention": attn.attention_init(k1, ecfg, dtype=dtype),
                    "cross_attention": attn.attention_init(k2, ecfg, dtype=dtype),
                    "ffn": ffn_mod.ffn_init(k3, ecfg, dtype=dtype)}

        ekeys = jax.random.split(keys[1], cfg.num_encoder_layers)
        dkeys = jax.random.split(keys[2], cfg.num_decoder_layers)
        h = cfg.hidden_size
        return {
            "backbone": self.backbone.init(keys[0], dtype=dtype),
            "encoder_layers": jax.vmap(enc_layer)(ekeys),
            "decoder_layers": jax.vmap(dec_layer)(dkeys),
            "query_embed": (jax.random.normal(keys[3],
                                              (cfg.num_queries, h))
                            * 0.02).astype(dtype),
            "class_head": cnn.linear_init(keys[4], h, cfg.num_classes + 1,
                                          dtype=dtype),
            "bbox_head": {
                "l1": cnn.linear_init(keys[5], h, h, dtype=dtype),
                "l2": cnn.linear_init(keys[6], h, h, dtype=dtype),
                "l3": cnn.linear_init(keys[7], h, 4, dtype=dtype),
            },
        }

    def apply(self, params, pixel_values, *, deterministic=True, rng=None):
        """Returns (class_logits [B, Q, C+1], boxes [B, Q, 4] in cxcywh)."""
        cfg, ecfg = self.config, self.enc_cfg
        mem = self.backbone.apply(params["backbone"], pixel_values)

        def enc_body(hidden, lp):
            out = attn.encoder_attention_apply(lp["attention"], hidden, None,
                                               ecfg)
            out = ffn_mod.ffn_apply(lp["ffn"], out, hidden, ecfg)
            return out, None

        mem, _ = jax.lax.scan(enc_body, mem, params["encoder_layers"])

        bsz = mem.shape[0]
        queries = jnp.broadcast_to(params["query_embed"][None],
                                   (bsz, cfg.num_queries,
                                    cfg.hidden_size)).astype(mem.dtype)

        def dec_body(hidden, lp):
            # bidirectional self-attention over queries (no mask)
            out = attn.encoder_attention_apply(lp["self_attention"], hidden,
                                               None, ecfg)
            out, _ = attn.cross_attention_apply(lp["cross_attention"], out,
                                                ecfg, encoder_hidden=mem,
                                                encoder_attention_mask=None)
            out = ffn_mod.ffn_apply(lp["ffn"], out, hidden, ecfg)
            return out, None

        queries, _ = jax.lax.scan(dec_body, queries,
                                  params["decoder_layers"])
        class_logits = cnn.linear(params["class_head"], queries)
        b = jax.nn.relu(cnn.linear(params["bbox_head"]["l1"], queries))
        b = jax.nn.relu(cnn.linear(params["bbox_head"]["l2"], b))
        boxes = jax.nn.sigmoid(cnn.linear(params["bbox_head"]["l3"], b))
        return class_logits, boxes

    __call__ = apply
