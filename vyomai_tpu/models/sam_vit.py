"""SAM-style ImageEncoderViT with window attention and decomposed relative
positions (reference ``ciphar-gocr2-0.ipynb`` cell 2 — SURVEY.md §2.2 N16).

TPU-first notes:
- window partition/unpartition are pure reshape/transposes (XLA fuses them);
- decomposed relative positions are two small einsums added to the scores;
- attention is an explicit einsum (windows are 14x14=196 tokens; the global
  blocks at ``global_attn_indexes`` attend over the full grid, matching the
  reference's materialized-attention behavior);
- the neck + GOT's strided conv stack (256 -> 512 -> 1024) lower to MXU
  matmuls.
"""

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import StructuralIdentity

from ..core import nn as cnn


@dataclass(frozen=True)
class SamVitConfig:
    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    out_chans: int = 256
    window_size: int = 14
    global_attn_indexes: Tuple[int, ...] = (2, 5, 8, 11)
    use_rel_pos: bool = True
    layer_norm_eps: float = 1e-6

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size


def _conv_init(key, out_ch, in_ch, kh, kw, dtype, bias=True):
    p = {"kernel": (jax.random.normal(key, (out_ch, in_ch, kh, kw))
                    * 0.02).astype(dtype)}
    if bias:
        p["bias"] = jnp.zeros((out_ch,), dtype=dtype)
    return p


def _conv(p, x, stride=1, padding="SAME"):
    out = jax.lax.conv_general_dilated(
        x.astype(p["kernel"].dtype), p["kernel"],
        window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    if "bias" in p:
        out = out + p["bias"][None, :, None, None]
    return out


def layer_norm_2d(p, x, eps=1e-6):
    """Channel LayerNorm over NCHW (reference ``LayerNorm2d``)."""
    mean = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=1, keepdims=True)
    x = (x - mean) * jax.lax.rsqrt(var + eps)
    return x * p["weight"][None, :, None, None] + \
        p["bias"][None, :, None, None]


def window_partition(x, ws: int):
    """[B, H, W, C] -> [B*nW, ws, ws, C] with padding. Returns (win, (Hp, Wp))."""
    b, h, w, c = x.shape
    pad_h = (ws - h % ws) % ws
    pad_w = (ws - w % ws) % ws
    x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c)
    win = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c)
    return win, (hp, wp)


def window_unpartition(win, ws: int, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = win.shape[0] // (hp * wp // ws // ws)
    x = win.reshape(b, hp // ws, wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def get_rel_pos(q_size: int, k_size: int, rel_pos):
    """Slice the relative-position table for (q_size, k_size)
    (reference ``get_rel_pos``; equal sizes in this model — no interp)."""
    max_rel = 2 * max(q_size, k_size) - 1
    # table is created at the right length; gather relative offsets
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(jnp.int32)]               # [q, k, head_dim]


def add_decomposed_rel_pos(attn, q, rel_h, rel_w, q_hw, k_hw):
    """attn: [B*, qh*qw, kh*kw]; q: [B*, qh*qw, dim]."""
    qh, qw = q_hw
    kh, kw = k_hw
    rh = get_rel_pos(qh, kh, rel_h)                     # [qh, kh, dim]
    rw = get_rel_pos(qw, kw, rel_w)
    b = q.shape[0]
    r_q = q.reshape(b, qh, qw, -1)
    rel_h_term = jnp.einsum("bhwc,hkc->bhwk", r_q, rh)
    rel_w_term = jnp.einsum("bhwc,wkc->bhwk", r_q, rw)
    attn = attn.reshape(b, qh, qw, kh, kw) + \
        rel_h_term[:, :, :, :, None] + rel_w_term[:, :, :, None, :]
    return attn.reshape(b, qh * qw, kh * kw)


def _attention_apply(p, x, num_heads: int, use_rel_pos: bool):
    """x: [B, H, W, C] -> [B, H, W, C] (reference SAM ``Attention``)."""
    b, h, w, c = x.shape
    hd = c // num_heads
    qkv = cnn.linear(p["qkv"], x.reshape(b, h * w, c))
    qkv = qkv.reshape(b, h * w, 3, num_heads, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = [t.reshape(b * num_heads, h * w, hd) for t in qkv]
    scale = hd ** -0.5
    attn = jnp.einsum("bqd,bkd->bqk", q * scale, k,
                      preferred_element_type=jnp.float32)
    if use_rel_pos:
        attn = add_decomposed_rel_pos(attn, q.astype(jnp.float32),
                                      p["rel_pos_h"], p["rel_pos_w"],
                                      (h, w), (h, w))
    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    out = jnp.einsum("bqk,bkd->bqd", attn, v)
    out = out.reshape(b, num_heads, h, w, hd).transpose(0, 2, 3, 1, 4)
    out = out.reshape(b, h, w, c)
    return cnn.linear(p["proj"], out)


class ImageEncoderViT(StructuralIdentity):
    def __init__(self, config: SamVitConfig):
        self.config = config

    def init(self, key, dtype=jnp.float32):
        cfg = self.config
        keys = jax.random.split(key, cfg.depth + 4)
        g = cfg.grid
        params = {
            "patch_embed": _conv_init(keys[0], cfg.embed_dim, 3,
                                      cfg.patch_size, cfg.patch_size, dtype),
            "pos_embed": jnp.zeros((1, g, g, cfg.embed_dim), dtype=dtype),
            "neck": {
                "conv1": _conv_init(keys[1], cfg.out_chans, cfg.embed_dim,
                                    1, 1, dtype, bias=False),
                "ln1": cnn.layer_norm_init(cfg.out_chans, dtype=dtype),
                "conv2": _conv_init(keys[2], cfg.out_chans, cfg.out_chans,
                                    3, 3, dtype, bias=False),
                "ln2": cnn.layer_norm_init(cfg.out_chans, dtype=dtype),
            },
        }
        blocks = []
        for i in range(cfg.depth):
            k1, k2, k3 = jax.random.split(keys[3 + i], 3)
            ws = cfg.window_size if i not in cfg.global_attn_indexes else 0
            size = ws if ws > 0 else g
            blk = {
                "norm1": cnn.layer_norm_init(cfg.embed_dim, dtype=dtype),
                "attn": {
                    "qkv": cnn.linear_init(k1, cfg.embed_dim,
                                           3 * cfg.embed_dim, dtype=dtype),
                    "proj": cnn.linear_init(k2, cfg.embed_dim, cfg.embed_dim,
                                            dtype=dtype),
                },
                "norm2": cnn.layer_norm_init(cfg.embed_dim, dtype=dtype),
                "mlp": {
                    "lin1": cnn.linear_init(
                        k3, cfg.embed_dim,
                        int(cfg.embed_dim * cfg.mlp_ratio), dtype=dtype),
                    "lin2": cnn.linear_init(
                        jax.random.fold_in(k3, 1),
                        int(cfg.embed_dim * cfg.mlp_ratio), cfg.embed_dim,
                        dtype=dtype),
                },
            }
            if cfg.use_rel_pos:
                hd = cfg.embed_dim // cfg.num_heads
                blk["attn"]["rel_pos_h"] = jnp.zeros((2 * size - 1, hd),
                                                     dtype=dtype)
                blk["attn"]["rel_pos_w"] = jnp.zeros((2 * size - 1, hd),
                                                     dtype=dtype)
            blocks.append(blk)
        params["blocks"] = blocks  # heterogeneous (window sizes): python list
        return params

    def apply(self, params, pixel_values):
        """[B, 3, H, W] -> [B, out_chans, H/16, W/16]."""
        cfg = self.config
        x = _conv(params["patch_embed"], pixel_values,
                  stride=cfg.patch_size, padding="VALID")
        x = x.transpose(0, 2, 3, 1)                     # [B, H', W', C]
        x = x + params["pos_embed"].astype(x.dtype)
        eps = cfg.layer_norm_eps
        for i, blk in enumerate(params["blocks"]):
            ws = cfg.window_size if i not in cfg.global_attn_indexes else 0
            shortcut = x
            xn = cnn.layer_norm(blk["norm1"], x, eps=eps)
            if ws > 0:
                h, w = xn.shape[1], xn.shape[2]
                win, pad_hw = window_partition(xn, ws)
                win = _attention_apply(blk["attn"], win, cfg.num_heads,
                                       cfg.use_rel_pos)
                xn = window_unpartition(win, ws, pad_hw, (h, w))
            else:
                xn = _attention_apply(blk["attn"], xn, cfg.num_heads,
                                      cfg.use_rel_pos)
            x = shortcut + xn
            xn = cnn.layer_norm(blk["norm2"], x, eps=eps)
            xn = cnn.linear(blk["mlp"]["lin1"], xn)
            xn = cnn.gelu(xn)
            xn = cnn.linear(blk["mlp"]["lin2"], xn)
            x = x + xn
        x = x.transpose(0, 3, 1, 2)                     # [B, C, H', W']
        x = _conv(params["neck"]["conv1"], x, padding="VALID")
        x = layer_norm_2d(params["neck"]["ln1"], x, eps=1e-6)
        x = _conv(params["neck"]["conv2"], x, padding="SAME")
        x = layer_norm_2d(params["neck"]["ln2"], x, eps=1e-6)
        return x

    __call__ = apply
