"""On-chip speculative decoding: single jitted round program, scalar-only
host syncs (reference ``speculative_decoding.py:85-245``; VERDICT r1 #5),
plus the VLM entry point (SURVEY §7 stage 7: speculative captioning)."""

import jax
import jax.numpy as jnp
import numpy as np

import vyomai_tpu as vt
from vyomai_tpu.generation import (GreedyProcessor, speculative_generate,
                                   speculative_generate_multimodel,
                                   speculative_generate_onchip)

CFG = vt.EncoderConfig(vocab_size=128, hidden_size=32, num_attention_heads=4,
                       num_hidden_layers=2, intermediate_size=64,
                       max_position_embeddings=64, hidden_dropout_prob=0.0)

VCFG = vt.SiglipVisionConfig(hidden_size=64, intermediate_size=128,
                             num_hidden_layers=2, num_attention_heads=4,
                             image_size=32, patch_size=8)
TCFG = vt.GemmaConfig(vocab_size=512, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=1, head_dim=32,
                      max_position_embeddings=128)
PGCFG = vt.PaliGemmaConfig(vision_config=VCFG, text_config=TCFG,
                           projection_dim=64, image_token_index=500)


def test_onchip_same_model_matches_greedy():
    """Drafter == target + greedy: every draft accepted (p == q so the
    accept ratio is exactly 1), output token-exact vs plain greedy."""
    model = vt.DecoderModel(CFG, pos_embedding_type="rope")
    params = model.init(jax.random.PRNGKey(4))
    prompt = jnp.array([[3, 17, 42]])
    toks, acc = speculative_generate_onchip(
        prompt, model, params, model, params, gamma=3,
        logits_processor=GreedyProcessor(), max_gen_len=10,
        eos_tokens_id=999, pad_token_id=1)
    ref = model.generate(params, prompt, max_len=10, use_cache=True)
    assert toks == ref[0, 3:].tolist()
    assert acc == 1.0


def test_onchip_matches_host_loop_same_model():
    """Host-loop and on-chip variants agree when sampling is deterministic
    (greedy, drafter == target): both reduce to plain greedy decoding."""
    model = vt.DecoderModel(CFG, pos_embedding_type="rope")
    params = model.init(jax.random.PRNGKey(4))
    prompt = jnp.array([[3, 17, 42, 5]])
    host, _ = speculative_generate(
        prompt, model, params, model, params, gamma=3,
        logits_processor=GreedyProcessor(), max_gen_len=9,
        eos_tokens_id=999, pad_token_id=1)
    chip, _ = speculative_generate_onchip(
        prompt, model, params, model, params, gamma=3,
        logits_processor=GreedyProcessor(), max_gen_len=9,
        eos_tokens_id=999, pad_token_id=1)
    assert host == chip


def test_onchip_different_drafter_valid():
    model = vt.DecoderModel(CFG, pos_embedding_type="rope")
    params = model.init(jax.random.PRNGKey(4))
    drafter_params = model.init(jax.random.PRNGKey(99))
    prompt = jnp.array([[3, 17, 42]])
    toks, acc = speculative_generate_onchip(
        prompt, model, drafter_params, model, params, gamma=3,
        logits_processor=GreedyProcessor(), max_gen_len=8,
        eos_tokens_id=999, pad_token_id=1)
    assert len(toks) == 8
    assert 0.0 <= acc <= 1.0
    assert all(0 <= t < CFG.vocab_size for t in toks)


def test_onchip_eos_stops():
    model = vt.DecoderModel(CFG, pos_embedding_type="rope")
    params = model.init(jax.random.PRNGKey(4))
    prompt = jnp.array([[3, 17, 42]])
    ref = model.generate(params, prompt, max_len=10, use_cache=True)
    eos = int(ref[0, 5])  # token that will be generated 3rd
    toks, _ = speculative_generate_onchip(
        prompt, model, params, model, params, gamma=3,
        logits_processor=GreedyProcessor(), max_gen_len=10,
        eos_tokens_id=eos, pad_token_id=1)
    assert toks[-1] == eos
    assert len(toks) <= 4


def test_onchip_gamma_one():
    """gamma=1 skips the drafter scan entirely (static-shape edge)."""
    model = vt.DecoderModel(CFG, pos_embedding_type="rope")
    params = model.init(jax.random.PRNGKey(4))
    prompt = jnp.array([[3, 17, 42]])
    toks, acc = speculative_generate_onchip(
        prompt, model, params, model, params, gamma=1,
        logits_processor=GreedyProcessor(), max_gen_len=6,
        eos_tokens_id=999, pad_token_id=1)
    ref = model.generate(params, prompt, max_len=6, use_cache=True)
    assert toks == ref[0, 3:].tolist()
    assert acc == 1.0


def test_vlm_speculative_matches_caption_greedy():
    """PaliGemma target + PaliGemma drafter (same params, same image):
    speculative captioning reproduces the model's own greedy captions."""
    model = vt.PaliGemmaForConditionalGeneration(PGCFG)
    params = model.init(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)
    pix = jax.random.normal(rng, (1, 3, 32, 32), dtype=jnp.float32)
    n_img = (32 // 8) ** 2
    prompt = jnp.concatenate([
        jnp.full((1, n_img), PGCFG.image_token_index, dtype=jnp.int32),
        jnp.array([[2, 7, 11]], dtype=jnp.int32)], axis=1)

    ref = model.generate(params, prompt, pix, max_new_tokens=8)
    toks, acc = speculative_generate_multimodel(
        prompt, pix, model, params, model, params,
        drafter_pixel_values=pix, gamma=3,
        logits_processor=GreedyProcessor(), max_gen_len=8,
        eos_tokens_id=9999, pad_token_id=0)
    assert toks == np.asarray(ref[0, prompt.shape[1]:]).tolist()
    assert acc == 1.0


def test_vlm_speculative_text_drafter():
    """Text-only Gemma drafter under a PaliGemma target: valid output."""
    model = vt.PaliGemmaForConditionalGeneration(PGCFG)
    params = model.init(jax.random.PRNGKey(0))
    drafter = model.language_model
    drafter_params = params["language_model"]
    pix = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 32, 32))
    n_img = (32 // 8) ** 2
    prompt = jnp.concatenate([
        jnp.full((1, n_img), PGCFG.image_token_index, dtype=jnp.int32),
        jnp.array([[2, 7, 11]], dtype=jnp.int32)], axis=1)
    toks, acc = speculative_generate_multimodel(
        prompt, pix, drafter, drafter_params, model, params, gamma=3,
        logits_processor=GreedyProcessor(), max_gen_len=6,
        eos_tokens_id=9999, pad_token_id=0)
    assert len(toks) == 6
    assert 0.0 <= acc <= 1.0


def test_onchip_near_context_limit_uses_tail_steps():
    """When the context limit caps the round slack, the remaining tokens
    come from single-token target steps — nothing generatable is forfeited
    (code-review r2: the old clamp returned [] / truncated output)."""
    cfg = CFG.replace(max_position_embeddings=16)
    model = vt.DecoderModel(cfg, pos_embedding_type="rope")
    params = model.init(jax.random.PRNGKey(4))
    prompt = jnp.array([[3, 17, 42, 5, 9, 1, 2, 6, 8, 7, 11, 13]])  # len 12
    toks, _ = speculative_generate_onchip(
        prompt, model, params, model, params, gamma=5,
        logits_processor=GreedyProcessor(), max_gen_len=10,
        eos_tokens_id=999, pad_token_id=1)
    ref = model.generate(params, prompt, max_len=4, use_cache=True)
    assert toks == ref[0, 12:].tolist()  # all 4 in-limit tokens produced


def test_onchip_prompt_at_limit_returns_empty():
    cfg = CFG.replace(max_position_embeddings=8)
    model = vt.DecoderModel(cfg, pos_embedding_type="rope")
    params = model.init(jax.random.PRNGKey(4))
    prompt = jnp.array([[3, 17, 42, 5, 9, 1, 2, 6]])  # len == max_pos
    toks, acc = speculative_generate_onchip(
        prompt, model, params, model, params, gamma=3,
        logits_processor=GreedyProcessor(), max_gen_len=5,
        eos_tokens_id=999, pad_token_id=1)
    assert toks == [] and acc == 0.0
    host, hacc = speculative_generate(
        prompt, model, params, model, params, gamma=3,
        logits_processor=GreedyProcessor(), max_gen_len=5,
        eos_tokens_id=999, pad_token_id=1)
    assert host == [] and hacc == 0.0


def test_host_use_cache_false_matches_true():
    """use_cache=False is API parity only: the rollback still happens, so
    both settings produce identical output (code-review r2: skipping the
    rewind desynchronized cache positions)."""
    model = vt.DecoderModel(CFG, pos_embedding_type="rope")
    params = model.init(jax.random.PRNGKey(4))
    drafter_params = model.init(jax.random.PRNGKey(99))
    prompt = jnp.array([[3, 17, 42]])
    kw = dict(gamma=3, logits_processor=GreedyProcessor(), max_gen_len=8,
              eos_tokens_id=999, pad_token_id=1)
    a, acc_a = speculative_generate(
        prompt, model, drafter_params, model, params, use_cache=True, **kw)
    b, acc_b = speculative_generate(
        prompt, model, drafter_params, model, params, use_cache=False, **kw)
    assert a == b and acc_a == acc_b


def test_vlm_drafter_rejects_image_token_tail():
    model = vt.PaliGemmaForConditionalGeneration(PGCFG)
    params = model.init(jax.random.PRNGKey(0))
    pix = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 32, 32))
    prompt = jnp.full((1, 16), PGCFG.image_token_index, dtype=jnp.int32)
    import pytest
    with pytest.raises(ValueError, match="text token"):
        speculative_generate_multimodel(
            prompt, pix, model, params, model, params,
            drafter_pixel_values=pix, gamma=2, max_gen_len=4)


def test_onchip_vocab_mismatch_asserts():
    model = vt.DecoderModel(CFG, pos_embedding_type="rope")
    params = model.init(jax.random.PRNGKey(4))
    small = vt.DecoderModel(CFG.replace(vocab_size=64),
                            pos_embedding_type="rope")
    small_params = small.init(jax.random.PRNGKey(5))
    import pytest
    with pytest.raises(AssertionError, match="vocab"):
        speculative_generate_onchip(
            jnp.array([[3, 17]]), small, small_params, model, params,
            gamma=2, max_gen_len=4)
