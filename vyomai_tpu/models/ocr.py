"""OCR seq2seq ("ciphar") model (reference ``ciphar-model-latest.ipynb`` —
SURVEY.md §2.2 N15): residual CNN image encoder + 2-D sinusoidal patch
positions + the library's cross-attention seq2seq decoder reading digit
strings from images.

The decoder is the standard ``Seq2SeqDecoderModel`` (static KV + encode-once
cross K/V), so ``generate_seq2seq`` works unchanged with the CNN encoder
output."""

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import EncoderConfig, StructuralIdentity
from ..core import nn as cnn
from .encoder import lm_head_init, lm_head_apply
from .encoder_decoder import Seq2SeqDecoderModel
from .outputs import Seq2SeqOutput


def sinusoidal_2d(h: int, w: int, dim: int, dtype=jnp.float32):
    """2-D sinusoidal positional table [h*w, dim]: half the channels encode
    row position, half encode column (the reference's 2-D patch encoding)."""
    assert dim % 4 == 0
    half = dim // 2

    def table(n, d):
        pos = jnp.arange(n, dtype=jnp.float32)[:, None]
        div = jnp.exp(jnp.arange(0, d, 2, dtype=jnp.float32)
                      * -(math.log(10000.0) / d))
        t = jnp.zeros((n, d))
        t = t.at[:, 0::2].set(jnp.sin(pos * div))
        t = t.at[:, 1::2].set(jnp.cos(pos * div))
        return t

    rows = table(h, half)[:, None, :].repeat(w, axis=1)    # [h, w, half]
    cols = table(w, half)[None, :, :].repeat(h, axis=0)    # [h, w, half]
    return jnp.concatenate([rows, cols], axis=-1).reshape(h * w, dim).astype(dtype)


def _conv_init(key, out_ch, in_ch, k, dtype):
    fan_in = in_ch * k * k
    std = (2.0 / fan_in) ** 0.5
    return {"kernel": (jax.random.normal(key, (out_ch, in_ch, k, k))
                       * std).astype(dtype),
            "bias": jnp.zeros((out_ch,), dtype=dtype)}


def _conv(p, x, stride=1, padding="SAME"):
    out = jax.lax.conv_general_dilated(
        x.astype(p["kernel"].dtype), p["kernel"],
        window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out + p["bias"][None, :, None, None]


class DeepResNetEncoder(StructuralIdentity):
    """Residual CNN image encoder -> patch sequence with 2-D sinusoidal
    positions (reference ``DeepResNetEncoder``)."""

    _identity_fields = ("in_channels", "channels")

    def __init__(self, config: EncoderConfig, in_channels: int = 1,
                 channels: Tuple[int, ...] = (32, 64, 128)):
        self.config = config
        self.in_channels = in_channels
        self.channels = channels

    def init(self, key, dtype=jnp.float32):
        keys = jax.random.split(key, 2 * len(self.channels) + 2)
        params = {"stem": _conv_init(keys[0], self.channels[0],
                                     self.in_channels, 3, dtype)}
        in_ch = self.channels[0]
        blocks = []
        for i, ch in enumerate(self.channels):
            blocks.append({
                "conv1": _conv_init(keys[2 * i + 1], ch, in_ch, 3, dtype),
                "conv2": _conv_init(keys[2 * i + 2], ch, ch, 3, dtype),
                "proj": (_conv_init(keys[2 * i + 2], ch, in_ch, 1, dtype)
                         if in_ch != ch else None),
            })
            in_ch = ch
        params["blocks"] = blocks
        params["proj"] = cnn.linear_init(keys[-1], self.channels[-1],
                                         self.config.hidden_size, dtype=dtype)
        return params

    def apply(self, params, pixel_values):
        """[B, C, H, W] -> [B, (H/2^n)*(W/2^n), hidden] with 2-D positions."""
        x = jax.nn.relu(_conv(params["stem"], pixel_values))
        for bp in params["blocks"]:
            h = jax.nn.relu(_conv(bp["conv1"], x, stride=2))
            h = _conv(bp["conv2"], h)
            shortcut = x[:, :, ::2, ::2]
            if bp["proj"] is not None:
                shortcut = _conv(bp["proj"], shortcut)
            x = jax.nn.relu(h + shortcut)
        b, c, hh, ww = x.shape
        seq = x.reshape(b, c, hh * ww).transpose(0, 2, 1)
        seq = cnn.linear(params["proj"], seq)
        pos = sinusoidal_2d(hh, ww, self.config.hidden_size,
                            dtype=seq.dtype)
        return seq + pos[None]


class OCRModel(StructuralIdentity):
    """CNN encoder + seq2seq decoder + LM head (char-level OCR)."""

    _identity_fields = ("encoder", "decoder")

    def __init__(self, config: EncoderConfig, in_channels: int = 1,
                 decoder_pos_embedding_type: str = "absolute",
                 decoder_attention_type: Optional[str] = None):
        self.config = config
        self.encoder = DeepResNetEncoder(config, in_channels=in_channels)
        self.decoder = Seq2SeqDecoderModel(config,
                                           decoder_pos_embedding_type,
                                           decoder_attention_type)

    def init(self, key, dtype=jnp.float32):
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "encoder": self.encoder.init(k1, dtype=dtype),
            "decoder": self.decoder.init(k2, dtype=dtype),
            "lm_head": lm_head_init(k3, self.config, dtype=dtype),
        }

    def get_encoder_output(self, params, pixel_values):
        return self.encoder.apply(params["encoder"], pixel_values)

    def setup_cache(self, params, encoder_output, *, batch_size: int,
                    max_len: int, dtype=jnp.float32):
        cache = self.decoder.init_cache(batch_size=batch_size,
                                        max_len=max_len, dtype=dtype)
        cross_kv = self.decoder.precompute_cross_kv(params["decoder"],
                                                    encoder_output)
        return cache, cross_kv

    def apply(self, params, pixel_values=None, decoder_input_ids=None,
              decoder_attention_mask=None, encoder_output=None,
              attention_mask=None, cache=None, cross_kv=None, start_pos=0,
              *, deterministic=True, rng=None):
        if encoder_output is None:
            encoder_output = self.encoder.apply(params["encoder"],
                                                pixel_values)
        hidden, new_cache = self.decoder.apply(
            params["decoder"], decoder_input_ids, decoder_attention_mask,
            encoder_hidden_state=encoder_output,
            encoder_attention_mask=None, cache=cache, cross_kv=cross_kv,
            start_pos=start_pos, deterministic=deterministic, rng=rng)
        logits = lm_head_apply(params["lm_head"], hidden, self.config)
        out = Seq2SeqOutput(logits=logits, key_value_states=encoder_output)
        if cache is not None:
            return out, new_cache
        return out

    __call__ = apply
