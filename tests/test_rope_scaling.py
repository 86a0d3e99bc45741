"""Long-context RoPE scaling (HF ``rope_scaling`` convention — linear /
dynamic-NTK / YaRN; beyond the reference): frequency-table math vs the
published formulas (and vs HF transformers' own implementation where
available), plus the cached-decode and serving invariants under scaling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vyomai_tpu as vt
from vyomai_tpu.layers import positional as pos

DIM, THETA = 64, 10000.0


def _unscaled(max_len):
    return np.asarray(pos.rope_freqs(max_len, DIM, theta=THETA))[0]


def test_linear_scaling_is_position_interpolation():
    f = 4.0
    base = _unscaled(64)
    scaled = np.asarray(pos.rope_freqs(
        256, DIM, theta=THETA,
        scaling={"rope_type": "linear", "factor": f}))[0]
    # angle at position p*f under scaling == angle at p unscaled
    for p in (1, 7, 63):
        np.testing.assert_allclose(scaled[int(p * f)], base[p],
                                   rtol=1e-5, atol=1e-6)


def test_dynamic_ntk_base_rescale():
    """HF dynamic-NTK convention: identity within the original window,
    length-rescaled base beyond it (evaluated at the static table len)."""
    f, l0, table = 2.0, 64, 256
    scaling = {"rope_type": "dynamic", "factor": f,
               "original_max_position_embeddings": l0}
    scaled = np.asarray(pos.rope_freqs(table, DIM, theta=THETA,
                                       scaling=scaling))[0]
    base_prime = THETA * (f * table / l0 - (f - 1)) ** (DIM / (DIM - 2))
    inv = 1.0 / (base_prime ** (np.arange(0, DIM, 2) / DIM))
    np.testing.assert_allclose(scaled[3], 3 * inv, rtol=1e-5)
    # highest frequency (dim 0) is preserved, lowest stretched
    base = _unscaled(table)
    np.testing.assert_allclose(scaled[3, 0], base[3, 0], rtol=1e-6)
    assert scaled[3, -1] < base[3, -1]
    # identity when the table fits in the original window (HF: no rescale
    # at seq_len <= max_position_embeddings)
    within = np.asarray(pos.rope_freqs(
        l0, DIM, theta=THETA,
        scaling={"rope_type": "dynamic", "factor": f,
                 "original_max_position_embeddings": l0}))[0]
    np.testing.assert_allclose(within, _unscaled(l0), rtol=1e-6)


def test_dynamic_ntk_matches_hf_transformers():
    """Inverse frequencies vs HF's own dynamic-NTK rope init."""
    try:
        from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS
    except ImportError:
        pytest.skip("transformers rope utils unavailable")

    class _Cfg:
        rope_theta = THETA
        head_dim = DIM
        hidden_size = DIM * 4
        num_attention_heads = 4
        max_position_embeddings = 64
        rope_scaling = {"rope_type": "dynamic", "factor": 2.0}

    table = 256
    hf_inv, _ = ROPE_INIT_FUNCTIONS["dynamic"](_Cfg(), device="cpu",
                                               seq_len=table)
    ours = np.asarray(pos.rope_freqs(
        table, DIM, theta=THETA,
        scaling={"rope_type": "dynamic", "factor": 2.0,
                 "original_max_position_embeddings": 64}))[0]
    np.testing.assert_allclose(ours[1], hf_inv.numpy(), rtol=1e-5)


def test_yarn_matches_hf_transformers():
    """Inverse frequencies and attention factor vs HF's own yarn code."""
    try:
        from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS
        import torch
    except ImportError:
        pytest.skip("transformers rope utils unavailable")

    class _Cfg:
        rope_theta = THETA
        head_dim = DIM
        hidden_size = DIM * 4
        num_attention_heads = 4
        max_position_embeddings = 2048
        rope_scaling = {"rope_type": "yarn", "factor": 8.0,
                        "original_max_position_embeddings": 2048,
                        "beta_fast": 32, "beta_slow": 1}

    hf_inv, hf_attn = ROPE_INIT_FUNCTIONS["yarn"](_Cfg(), device="cpu")
    ours = np.asarray(pos.rope_freqs(
        4, DIM, theta=THETA, scaling=_Cfg.rope_scaling))[0]
    np.testing.assert_allclose(ours[1], hf_inv.numpy(), rtol=1e-4)
    np.testing.assert_allclose(
        pos.rope_attention_factor(_Cfg.rope_scaling), float(hf_attn),
        rtol=1e-6)


def test_rope_scaled_model_invariants():
    """A YaRN-scaled model keeps the framework invariants: cached greedy ==
    uncached greedy, engine greedy == dense greedy; scaling changes logits
    vs the unscaled model (it actually engages)."""
    from vyomai_tpu.serving import ContinuousBatchEngine
    kw = dict(vocab_size=64, hidden_size=32, intermediate_size=64,
              num_hidden_layers=2, num_attention_heads=2,
              num_key_value_heads=2, head_dim=16,
              max_position_embeddings=256)
    cfg = vt.QwenConfig(**kw, rope_scaling={
        "rope_type": "yarn", "factor": 4.0,
        "original_max_position_embeddings": 64})
    model = vt.ModelForCausalLM(cfg)
    params = model.init(jax.random.PRNGKey(0), dtype=jnp.float32)
    assert model.rope_scale != 1.0
    prompt = [3, 17, 42, 9]

    from vyomai_tpu.generation import generate
    cached = generate(model, params, jnp.asarray([prompt]),
                      max_new_tokens=8, use_cache=True)
    uncached = generate(model, params, jnp.asarray([prompt]),
                        max_new_tokens=8, use_cache=False)
    np.testing.assert_array_equal(np.asarray(cached), np.asarray(uncached))

    eng = ContinuousBatchEngine(model, params, num_blocks=32, block_size=8,
                                max_batch=2, max_new_tokens=8,
                                dtype=jnp.float32)
    sid = eng.submit(prompt)
    assert eng.run()[sid] == np.asarray(cached)[0, len(prompt):].tolist()

    plain = vt.ModelForCausalLM(vt.QwenConfig(**kw))
    lp = plain.apply(params, jnp.asarray([prompt])).logits
    ls = model.apply(params, jnp.asarray([prompt])).logits
    assert not np.allclose(np.asarray(lp), np.asarray(ls), atol=1e-4)
