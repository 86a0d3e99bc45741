"""Feed-forward block: linear(4x) -> act -> linear -> dropout -> post-LN
residual (reference ``VyomAI/layers/ffn.py:18-40``).

Parity note: the residual added before the LayerNorm is whatever the caller
passes as ``input_tensor`` — in the reference's encoder/decoder layers this
is the *pre-attention* block input, not the attention output
(``models/encoder.py:60-64``, ``models/decoder.py:241-250``). That quirk is
preserved by the model code calling ``ffn_apply(p, attn_out, block_input)``.
"""

import jax
import jax.numpy as jnp

from ..core import nn as cnn


def ffn_init(key, config, multiplier: float = 4, dtype=jnp.float32):
    inter = int(multiplier) * config.hidden_size
    k1, k2 = jax.random.split(key)
    std = config.initializer_range
    return {
        "intermediate": cnn.linear_init(k1, config.hidden_size, inter,
                                        std=std, dtype=dtype),
        "out": cnn.linear_init(k2, inter, config.hidden_size, std=std,
                               dtype=dtype),
        "layernorm": cnn.layer_norm_init(config.hidden_size, dtype=dtype),
    }


def ffn_apply(p, hidden, input_tensor, config, *, deterministic=True, rng=None):
    act = cnn.get_act(getattr(config, "hidden_act", None))
    h = cnn.linear(p["intermediate"], hidden)
    h = act(h)
    h = cnn.linear(p["out"], h)
    h = cnn.dropout(h, config.hidden_dropout_prob,
                    deterministic=deterministic, rng=rng)
    return cnn.layer_norm(p["layernorm"], h + input_tensor,
                          eps=config.layer_norm_eps)
