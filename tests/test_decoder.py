"""Decoder shape + KV-cache parity tests.

The reference's cache-parity assertions were weak (allclose equality of
booleans — SURVEY.md §4.2); here every pairwise comparison is asserted
directly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vyomai_tpu as vt

CFG = vt.EncoderConfig(hidden_size=64, num_attention_heads=4,
                       num_key_value_heads=2, num_hidden_layers=2,
                       vocab_size=128, max_position_embeddings=64,
                       intermediate_size=256, hidden_dropout_prob=0.0,
                       pad_token_id=1, eos_token_id=2)

ALL_TYPES = [(pe, at) for pe in ("absolute", "sinusoidal", "rope")
             for at in (None, "gqa")]


@pytest.fixture(scope="module")
def token_batch():
    ids = jnp.array([[0, 5, 10, 15, 20, 25, 30, 33],
                     [0, 7, 12, 13, 17, 21, 29, 31],
                     [0, 9, 14, 19, 23, 27, 35, 37]], dtype=jnp.int32)
    mask = jnp.ones_like(ids)
    return ids, mask


@pytest.mark.parametrize("pe,at", ALL_TYPES)
def test_clm_shapes(pe, at, token_batch):
    ids, mask = token_batch
    model = vt.DecoderModel(CFG, pos_embedding_type=pe, attention_type=at)
    params = model.init(jax.random.PRNGKey(0))
    out = model.apply(params, ids, mask)
    assert out.logits.shape == (3, 8, 128)
    assert jnp.all(jnp.isfinite(out.logits))


@pytest.mark.parametrize("pe,at", ALL_TYPES)
def test_incremental_cache_matches_full_forward(pe, at, token_batch):
    """Feeding tokens one-at-a-time through the static cache must reproduce
    the full-sequence forward logits position by position."""
    ids, mask = token_batch
    model = vt.DecoderModel(CFG, pos_embedding_type=pe, attention_type=at)
    params = model.init(jax.random.PRNGKey(0))
    full = model.apply(params, ids, mask).logits

    cache = model.init_cache(batch_size=3, max_len=16)
    # prefill first 4, then 4 single-token steps
    out = model.apply(params, ids[:, :4], mask[:, :4], cache=cache, start_pos=0)
    np.testing.assert_allclose(np.asarray(out.logits),
                               np.asarray(full[:, :4]), atol=1e-5)
    cache = out.kv_cache
    # Single-token steps are a mathematically identical but differently
    # ordered fp32 reduction; the residual post-LN stack amplifies the
    # ~1e-7 reorder noise to ~1e-3 on logits (verified exact at 5e-8 in
    # float64). Assert loose logits closeness + exact argmax agreement.
    for t in range(4, 8):
        out = model.apply(params, ids[:, t:t + 1], cache=cache, start_pos=t)
        cache = out.kv_cache
        np.testing.assert_allclose(np.asarray(out.logits[:, 0]),
                                   np.asarray(full[:, t]), atol=1e-2)
        np.testing.assert_array_equal(
            np.asarray(jnp.argmax(out.logits[:, 0], -1)),
            np.asarray(jnp.argmax(full[:, t], -1)))


@pytest.mark.parametrize("pe", ["absolute", "rope"])
def test_generate_cache_parity(pe, token_batch):
    """Greedy generate with and without cache must produce identical tokens
    (strict assertion — fixes the reference's weak allclose pattern)."""
    ids, mask = token_batch
    model = vt.DecoderModel(CFG, pos_embedding_type=pe)
    params = model.init(jax.random.PRNGKey(0))
    t_cache = model.generate(params, ids, mask, max_len=6, use_cache=True)
    t_nocache = model.generate(params, ids, mask, max_len=6, use_cache=False)
    assert t_cache.shape == (3, 14)
    np.testing.assert_array_equal(np.asarray(t_cache), np.asarray(t_nocache))
    # prompt is preserved
    np.testing.assert_array_equal(np.asarray(t_cache[:, :8]), np.asarray(ids))


def test_cache_rollback_trim():
    """Trimming the static cache (speculative rollback) = length rewind."""
    from vyomai_tpu.layers.kv_cache import trim
    model = vt.DecoderModel(CFG, pos_embedding_type="rope")
    params = model.init(jax.random.PRNGKey(0))
    ids = jnp.arange(6, dtype=jnp.int32)[None, :] + 3
    cache = model.init_cache(batch_size=1, max_len=16)
    out = model.apply(params, ids, cache=cache, start_pos=0)
    full = out.logits

    # roll back last 2 tokens, re-run them; logits must match
    cache2 = trim(out.kv_cache, 2)
    assert int(cache2["length"]) == 4
    out2 = model.apply(params, ids[:, 4:6], cache=cache2, start_pos=4)
    np.testing.assert_allclose(np.asarray(out2.logits),
                               np.asarray(full[:, 4:6]), atol=1e-2)
    np.testing.assert_array_equal(
        np.asarray(jnp.argmax(out2.logits, -1)),
        np.asarray(jnp.argmax(full[:, 4:6], -1)))
