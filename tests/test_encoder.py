"""Encoder shape-matrix tests (pattern from reference ``tests/test_encoder.py``:
cartesian product {absolute, sinusoidal, rope} x {None, gqa})."""

import jax
import jax.numpy as jnp
import pytest

import vyomai_tpu as vt

CFG = vt.EncoderConfig(hidden_size=64, num_attention_heads=4,
                       num_key_value_heads=2, num_hidden_layers=2,
                       vocab_size=128, max_position_embeddings=64,
                       intermediate_size=256, hidden_dropout_prob=0.0)

ALL_TYPES = [(pe, at) for pe in ("absolute", "sinusoidal", "rope")
             for at in (None, "gqa")]


@pytest.fixture(scope="module")
def token_batch():
    ids = jnp.array([[0, 5, 10, 15, 20, 25, 30, 2],
                     [0, 7, 12, 2, 1, 1, 1, 1],
                     [0, 9, 14, 19, 2, 1, 1, 1]], dtype=jnp.int32)
    mask = (ids != 1).astype(jnp.int32)
    return ids, mask


@pytest.mark.parametrize("pe,at", ALL_TYPES)
def test_encoder_shapes(pe, at, token_batch):
    ids, mask = token_batch
    model = vt.EncoderModel(CFG, pos_embedding_type=pe, attention_type=at)
    params = model.init(jax.random.PRNGKey(0))
    out = model.apply(params, ids, mask)
    assert out.logits.shape == (3, 8, 64)
    assert jnp.all(jnp.isfinite(out.logits))


@pytest.mark.parametrize("pe,at", ALL_TYPES)
def test_mlm_shapes(pe, at, token_batch):
    ids, mask = token_batch
    model = vt.EncoderForMaskedLM(CFG, pos_embedding_type=pe, attention_type=at)
    params = model.init(jax.random.PRNGKey(0))
    out = model.apply(params, ids, mask)
    assert out.logits.shape == (3, 8, 128)
    assert out.hidden_state.shape == (3, 8, 64)


def test_jit_matches_eager(token_batch):
    ids, mask = token_batch
    model = vt.EncoderModel(CFG, pos_embedding_type="rope", attention_type="gqa")
    params = model.init(jax.random.PRNGKey(0))
    eager = model.apply(params, ids, mask)
    jitted = jax.jit(model.apply)(params, ids, mask)
    assert jnp.allclose(eager.logits, jitted.logits, atol=1e-6)


def test_pad_tokens_do_not_affect_others(token_batch):
    """Changing a padded position must not change unpadded outputs."""
    ids, mask = token_batch
    model = vt.EncoderModel(CFG, pos_embedding_type="absolute")
    params = model.init(jax.random.PRNGKey(0))
    out1 = model.apply(params, ids, mask)
    ids2 = ids.at[1, 5].set(99)  # padded slot
    out2 = model.apply(params, ids2, mask)
    assert jnp.allclose(out1.logits[0], out2.logits[0], atol=1e-6)
    assert jnp.allclose(out1.logits[2], out2.logits[2], atol=1e-6)


def test_dropout_rng_changes_output(token_batch):
    ids, mask = token_batch
    cfg = CFG.replace(hidden_dropout_prob=0.5)
    model = vt.EncoderModel(cfg, pos_embedding_type="absolute")
    params = model.init(jax.random.PRNGKey(0))
    o1 = model.apply(params, ids, mask, deterministic=False,
                     rng=jax.random.PRNGKey(1))
    o2 = model.apply(params, ids, mask, deterministic=False,
                     rng=jax.random.PRNGKey(2))
    assert not jnp.allclose(o1.logits, o2.logits)
    d1 = model.apply(params, ids, mask)
    d2 = model.apply(params, ids, mask)
    assert jnp.allclose(d1.logits, d2.logits)
