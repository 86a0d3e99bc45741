"""Beam search: token-exact parity vs HF ``generate(num_beams=N)`` on a
tiny Qwen2 checkpoint (VERDICT r1 missing #1 — the reference's
``ModelForCausalLM`` exists so HF beam generation works on it,
``custom_transformer.py:606-747``)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import vyomai_tpu as vt
from vyomai_tpu.generation import beam_search_generate
from vyomai_tpu.interop.hf_import import import_qwen


def _tiny_pair(seed=0, tie=False):
    """Matching (HF Qwen2 double model, our ModelForCausalLM + params)."""
    from transformers import Qwen2Config, Qwen2ForCausalLM
    hf_cfg = Qwen2Config(
        vocab_size=160, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0,
        rms_norm_eps=1e-6, tie_word_embeddings=tie,
        bos_token_id=0, eos_token_id=1, pad_token_id=1,
        attention_dropout=0.0)
    torch.manual_seed(seed)
    hf = Qwen2ForCausalLM(hf_cfg).double().eval()

    cfg = vt.QwenConfig(
        vocab_size=160, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, rope_theta=10000.0,
        rms_norm_eps=1e-6, qk_norm=False, tie_word_embeddings=tie,
        eos_token_id=1)
    model = vt.ModelForCausalLM(cfg)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    with jax.enable_x64(True):  # import at full fp64 (strict parity)
        params = import_qwen(sd, cfg)
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float64)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
    return hf, model, params


@pytest.mark.parametrize("num_beams,max_new,tie", [(4, 12, False),
                                                   (3, 20, True)])
def test_beam_matches_hf_generate(num_beams, max_new, tie):
    hf, model, params = _tiny_pair(seed=num_beams, tie=tie)
    prompts = torch.tensor([[3, 17, 42, 9, 21], [5, 11, 8, 30, 12]])
    with torch.no_grad():
        hf_out = hf.generate(
            prompts, num_beams=num_beams, do_sample=False,
            max_new_tokens=max_new, pad_token_id=1).numpy()

    with jax.enable_x64(True):
        seqs, scores = beam_search_generate(
            model, params, jnp.asarray(prompts.numpy()),
            num_beams=num_beams, max_new_tokens=max_new,
            eos_token_id=1, pad_token_id=1)
    seqs = np.asarray(seqs)
    assert seqs.shape == hf_out.shape, (seqs.shape, hf_out.shape)
    np.testing.assert_array_equal(seqs, hf_out)
    assert bool(jnp.all(jnp.isfinite(scores)))


def test_beam_on_decoder_model_protocol():
    """beam_search_generate speaks the library model protocol — it runs on
    DecoderModel too, returning sorted finite scores."""
    cfg = vt.EncoderConfig(hidden_size=64, num_attention_heads=4,
                           num_key_value_heads=2, num_hidden_layers=2,
                           vocab_size=128, max_position_embeddings=64,
                           intermediate_size=128, hidden_dropout_prob=0.0)
    model = vt.DecoderModel(cfg, pos_embedding_type="rope",
                            attention_type="gqa")
    params = model.init(jax.random.PRNGKey(0))
    ids = jnp.asarray([[3, 17, 42, 9]], dtype=jnp.int32)
    seqs, scores = beam_search_generate(
        model, params, ids, num_beams=4, max_new_tokens=8,
        eos_token_id=-1, num_return_sequences=4)
    assert seqs.shape == (4, 12)
    s = np.asarray(scores)
    assert np.all(np.diff(s) <= 1e-6)  # best-first
    # prompt preserved on every returned beam
    np.testing.assert_array_equal(np.asarray(seqs[:, :4]),
                                  np.broadcast_to(np.asarray(ids), (4, 4)))


def test_num_return_sequences_validated():
    import pytest
    import vyomai_tpu as vt
    cfg = vt.EncoderConfig(vocab_size=64, hidden_size=32,
                           num_attention_heads=4, num_hidden_layers=1,
                           intermediate_size=64, max_position_embeddings=32,
                           hidden_dropout_prob=0.0)
    model = vt.DecoderModel(cfg, pos_embedding_type="rope")
    params = model.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="num_return_sequences"):
        vt.beam_search_generate(model, params, jnp.ones((1, 3), jnp.int32),
                                num_beams=2, num_return_sequences=4,
                                max_new_tokens=2)


def test_beam_sample_low_temperature_is_deterministic():
    """At near-zero temperature the sharpened log-probs dominate the Gumbel
    noise, so beam sampling becomes deterministic: different seeds give the
    same output. (Temperature warps the ACCUMULATED scores too — the HF
    semantics — so equality with plain beam search is not expected.)"""
    _, model, params = _tiny_pair(seed=3)
    from vyomai_tpu.generation import beam_sample_generate
    ids = jnp.array([[5, 9, 23]], dtype=jnp.int32)
    with jax.enable_x64(True):
        a, _ = beam_sample_generate(
            model, params, ids, num_beams=3, max_new_tokens=10,
            temperature=1e-4, rng=jax.random.PRNGKey(0))
        b, _ = beam_sample_generate(
            model, params, ids, num_beams=3, max_new_tokens=10,
            temperature=1e-4, rng=jax.random.PRNGKey(123))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_beam_sample_is_stochastic_and_valid():
    _, model, params = _tiny_pair(seed=4)
    from vyomai_tpu.generation import beam_sample_generate
    ids = jnp.array([[5, 9, 23]], dtype=jnp.int32)
    with jax.enable_x64(True):
        outs = [np.asarray(beam_sample_generate(
            model, params, ids, num_beams=3, max_new_tokens=12,
            temperature=5.0, rng=jax.random.PRNGKey(s))[0])
            for s in range(4)]
    assert all(o.shape[1] <= 15 for o in outs)
    # at a hot temperature, some pair of seeds must differ
    assert any(not (outs[0].shape == o.shape and (outs[0] == o).all())
               for o in outs[1:])


@pytest.mark.parametrize("groups", [2, 3])
def test_group_beam_zero_penalty_reduces_to_plain_beam(groups):
    """With diversity_penalty=0 every group runs the identical search, so
    group beam must return plain beam search's hypotheses (the
    HF-token-exact-validated path) duplicated once per group. (Direct HF
    parity is untestable here: this transformers version moved group beam
    to a remote-code hub repo — no egress on this rig.)"""
    _, model, params = _tiny_pair(seed=5)
    from vyomai_tpu.generation import group_beam_search_generate
    ids = jnp.array([[5, 9, 23, 31]], dtype=jnp.int32)
    kg = 3
    with jax.enable_x64(True):
        plain, plain_scores = beam_search_generate(
            model, params, ids, num_beams=kg, max_new_tokens=10,
            eos_token_id=1, pad_token_id=1, num_return_sequences=kg)
        grp, grp_scores = group_beam_search_generate(
            model, params, ids, num_beams=kg * groups,
            num_beam_groups=groups, diversity_penalty=0.0,
            max_new_tokens=10, eos_token_id=1, pad_token_id=1,
            num_return_sequences=kg * groups)
    plain, grp = np.asarray(plain), np.asarray(grp)
    width = min(plain.shape[1], grp.shape[1])
    for i in range(kg):
        for g in range(groups):
            np.testing.assert_array_equal(
                grp[i * groups + g, :width], plain[i, :width],
                err_msg=f"hypothesis {i}, copy {g}")
    np.testing.assert_allclose(
        np.asarray(grp_scores).reshape(kg, groups),
        np.asarray(plain_scores)[:, None].repeat(groups, 1), atol=1e-9)


def test_group_beam_diversity_changes_output():
    """A positive diversity penalty must be able to change which
    hypotheses the groups explore vs plain beam search with the same
    total beam count."""
    _, model, params = _tiny_pair(seed=6)
    from vyomai_tpu.generation import group_beam_search_generate
    ids = jnp.array([[5, 9, 23]], dtype=jnp.int32)
    with jax.enable_x64(True):
        a, _ = group_beam_search_generate(
            model, params, ids, num_beams=4, num_beam_groups=2,
            diversity_penalty=0.0, max_new_tokens=8,
            num_return_sequences=4)
        b, _ = group_beam_search_generate(
            model, params, ids, num_beams=4, num_beam_groups=2,
            diversity_penalty=5.0, max_new_tokens=8,
            num_return_sequences=4)
    assert a.shape[0] == b.shape[0] == 4
    assert not (a.shape == b.shape and bool((a == b).all()))
