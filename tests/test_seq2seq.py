"""Seq2seq shape + cache parity tests (pattern from reference
``tests/test_encoder_decoder.py``, with strict assertions)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vyomai_tpu as vt
from vyomai_tpu import generate_seq2seq

CFG = vt.EncoderConfig(hidden_size=64, num_attention_heads=4,
                       num_key_value_heads=2, num_hidden_layers=2,
                       vocab_size=128, max_position_embeddings=64,
                       intermediate_size=256, hidden_dropout_prob=0.0)

ALL_TYPES = [(pe, at) for pe in ("absolute", "rope")
             for at in (None, "gqa")]


@pytest.mark.parametrize("pe,at", ALL_TYPES)
def test_seq2seq_shapes(pe, at):
    model = vt.EncoderDecoderModel(CFG, CFG,
                                   decoder_pos_embedding_type=pe,
                                   decoder_attention_type=at)
    params = model.init(jax.random.PRNGKey(0))
    enc_ids = jnp.ones((3, 17), dtype=jnp.int32)
    dec_ids = jnp.ones((3, 9), dtype=jnp.int32)
    out = model.apply(params, enc_ids, jnp.ones_like(enc_ids), dec_ids,
                      jnp.ones_like(dec_ids))
    assert out.logits.shape == (3, 9, 128)
    assert out.key_value_states.shape == (3, 17, 64)


@pytest.mark.parametrize("pe,at", ALL_TYPES)
def test_seq2seq_generate_cache_parity(pe, at):
    """Greedy generate with static cache + precomputed cross-KV must match
    the no-cache loop exactly."""
    model = vt.EncoderDecoderModel(CFG, CFG,
                                   decoder_pos_embedding_type=pe,
                                   decoder_attention_type=at)
    params = model.init(jax.random.PRNGKey(1))
    enc_ids = jnp.array([[5, 9, 14, 23, 2], [7, 11, 2, 1, 1]], dtype=jnp.int32)
    enc_mask = (enc_ids != 1).astype(jnp.int32)
    eo = model.get_encoder_output(params, enc_ids, enc_mask).logits
    start = jnp.zeros((2, 1), dtype=jnp.int32)
    t1 = generate_seq2seq(model, params, eo, enc_mask, start,
                          max_new_tokens=5, use_cache=True)
    t2 = generate_seq2seq(model, params, eo, enc_mask, start,
                          max_new_tokens=5, use_cache=False)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    assert t1.shape == (2, 6)


def test_encoder_skipped_when_output_given():
    model = vt.EncoderDecoderModel(CFG, CFG)
    params = model.init(jax.random.PRNGKey(0))
    eo = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 64))
    dec_ids = jnp.ones((2, 4), dtype=jnp.int32)
    out = model.apply(params, encoder_output=eo, decoder_input_ids=dec_ids,
                      decoder_attention_mask=jnp.ones_like(dec_ids))
    assert out.logits.shape == (2, 4, 128)
    np.testing.assert_array_equal(np.asarray(out.key_value_states),
                                  np.asarray(eo))
