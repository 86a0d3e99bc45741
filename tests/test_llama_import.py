"""Llama / Mistral checkpoint import: the modern decoder stack serves both
families (beyond the reference's Qwen2-flavor ``custom_transformer.py`` —
same HF-compatible role, wider model coverage). fp64 logits parity vs HF
transformers' own implementations. atol 1e-5: an order tighter than
the BASELINE 1e-4 bar, loose enough for the axon backend's fp64
reduction-order jitter (observed ~3e-7)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import vyomai_tpu as vt
from vyomai_tpu.interop.hf_import import (import_llama, import_mistral,
                                          llama_config_from_hf)


def _import_fp64(sd, cfg, importer):
    with jax.enable_x64(True):
        params = importer({k: v.detach().numpy() for k, v in sd.items()},
                          cfg)
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float64)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, params)


def test_llama_config_mapping():
    hf = {"model_type": "llama", "vocab_size": 1000, "hidden_size": 64,
          "intermediate_size": 128, "num_hidden_layers": 2,
          "num_attention_heads": 4, "num_key_value_heads": 2,
          "sliding_window": 4096}
    cfg = llama_config_from_hf(hf)
    assert cfg.head_dim == 16 and cfg.qk_norm is False
    assert cfg.rope_theta == 10000.0
    assert cfg.sliding_window is None        # llama: gated off by default
    mcfg = llama_config_from_hf({**hf, "model_type": "mistral"})
    assert mcfg.sliding_window == 4096       # mistral: active whenever set


def test_llama_logits_parity_fp64():
    from transformers import LlamaConfig, LlamaForCausalLM
    hf_cfg = LlamaConfig(
        vocab_size=160, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0, rms_norm_eps=1e-6,
        tie_word_embeddings=False, attention_dropout=0.0,
        bos_token_id=0, eos_token_id=1, pad_token_id=1)
    torch.manual_seed(0)
    hf = LlamaForCausalLM(hf_cfg).double().eval()
    cfg = llama_config_from_hf(hf_cfg.to_dict())
    model = vt.ModelForCausalLM(cfg)
    params = _import_fp64(hf.state_dict(), cfg, import_llama)

    ids = torch.tensor([[3, 17, 42, 9, 21, 7], [5, 11, 8, 30, 12, 2]])
    with torch.no_grad():
        ref = hf(ids).logits.numpy()
    with jax.enable_x64(True):
        out = model.apply(params, jnp.asarray(ids.numpy())).logits
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_mistral_logits_parity_fp64_sliding_window():
    """Mistral with an ACTIVE sliding window (smaller than the sequence) —
    the banded mask must match HF's convention position-for-position."""
    from transformers import MistralConfig, MistralForCausalLM
    hf_cfg = MistralConfig(
        vocab_size=160, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0, rms_norm_eps=1e-6,
        sliding_window=4, tie_word_embeddings=False, attention_dropout=0.0,
        bos_token_id=0, eos_token_id=1, pad_token_id=1)
    torch.manual_seed(1)
    hf = MistralForCausalLM(hf_cfg).double().eval()
    hf.config._attn_implementation = "eager"
    cfg = llama_config_from_hf(hf_cfg.to_dict())
    assert cfg.sliding_window == 4
    model = vt.ModelForCausalLM(cfg)
    params = _import_fp64(hf.state_dict(), cfg, import_mistral)

    ids = torch.tensor([[3, 17, 42, 9, 21, 7, 30, 2, 5, 11]])
    with torch.no_grad():
        ref = hf(ids).logits.numpy()
    with jax.enable_x64(True):
        out = model.apply(params, jnp.asarray(ids.numpy())).logits
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_export_roundtrip_into_hf():
    """export_llama writes our params into the HF layout: loading them
    into transformers' LlamaForCausalLM reproduces our logits (fp64)."""
    from transformers import LlamaConfig, LlamaForCausalLM
    from vyomai_tpu.interop.hf_export import export_llama
    hf_cfg = LlamaConfig(
        vocab_size=160, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0, rms_norm_eps=1e-6,
        tie_word_embeddings=False, attention_dropout=0.0,
        bos_token_id=0, eos_token_id=1, pad_token_id=1)
    cfg = llama_config_from_hf(hf_cfg.to_dict())
    model = vt.ModelForCausalLM(cfg)
    with jax.enable_x64(True):
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float64)
            if jnp.issubdtype(x.dtype, jnp.floating) else x,
            model.init(jax.random.PRNGKey(7)))
        sd = export_llama(params, cfg)

    hf = LlamaForCausalLM(hf_cfg).double().eval()
    missing, unexpected = hf.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in
         sd.items()}, strict=False)
    assert not unexpected
    # rotary_emb.inv_freq style buffers may be "missing" — no weights may be
    assert all("inv_freq" in m for m in missing)

    ids = torch.tensor([[3, 17, 42, 9, 21, 7]])
    with torch.no_grad():
        ref = hf(ids).logits.numpy()
    with jax.enable_x64(True):
        out = model.apply(params, jnp.asarray(ids.numpy())).logits
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_llama_greedy_generate_matches_hf():
    from transformers import LlamaConfig, LlamaForCausalLM
    hf_cfg = LlamaConfig(
        vocab_size=160, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0, rms_norm_eps=1e-6,
        tie_word_embeddings=True, attention_dropout=0.0,
        bos_token_id=0, eos_token_id=1, pad_token_id=1)
    torch.manual_seed(2)
    hf = LlamaForCausalLM(hf_cfg).double().eval()
    cfg = llama_config_from_hf(hf_cfg.to_dict())
    model = vt.ModelForCausalLM(cfg)
    params = _import_fp64(hf.state_dict(), cfg, import_llama)

    prompts = torch.tensor([[3, 17, 42, 9, 21]])
    with torch.no_grad():
        ref = hf.generate(prompts, do_sample=False, max_new_tokens=12,
                          pad_token_id=1).numpy()
    from vyomai_tpu.generation import generate_hf
    with jax.enable_x64(True):
        out = generate_hf(model, params, jnp.asarray(prompts.numpy()),
                          max_new_tokens=12, eos_token_id=1, pad_token_id=1)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_llama3_eos_list_maps_and_engine_stops_on_any():
    """Llama-3 configs carry a LIST of eos ids; the mapping keeps all of
    them and the engine stops on ANY (the secondary ids finish host-side
    at commit time)."""
    hf = {"model_type": "llama", "vocab_size": 512, "hidden_size": 64,
          "intermediate_size": 128, "num_hidden_layers": 2,
          "num_attention_heads": 4, "num_key_value_heads": 2,
          "head_dim": 32, "eos_token_id": [9998, 9999]}
    cfg = llama_config_from_hf(hf)
    assert cfg.eos_token_id == (9998, 9999)

    from vyomai_tpu.serving import ContinuousBatchEngine
    model = vt.ModelForCausalLM(cfg)
    mparams = model.init(jax.random.PRNGKey(2), dtype=jnp.float32)

    def run(eos):
        eng = ContinuousBatchEngine(
            model, mparams, num_blocks=64, block_size=8, max_batch=2,
            max_new_tokens=10, dtype=jnp.float32, decode_horizon=4,
            eos_token_id=eos)
        sid = eng.submit([3, 17, 42, 9])
        return eng.run()[sid]

    free = run(eos=[9998, 9999])       # config ids: outside vocab
    assert len(free) == 10
    tok = free[5]                       # force a SECONDARY eos mid-horizon
    stopped = run(eos=[9998, tok])
    assert stopped == free[:free.index(tok) + 1]
    # primary id (in-graph lane kill): identical truncation
    assert run(eos=[tok, 9998]) == stopped


def test_export_rejects_quantized_tree():
    """quantize_params trees must be caught by the export guard (the
    markers live on LEAF dicts — kernel_q/..._scale), not crash in _lin."""
    from vyomai_tpu.interop.hf_export import export_qwen
    cfg = vt.QwenConfig(vocab_size=128, hidden_size=32,
                        intermediate_size=64, num_hidden_layers=2,
                        num_attention_heads=2, num_key_value_heads=1,
                        head_dim=16, max_position_embeddings=64,
                        qk_norm=False, tie_word_embeddings=True)
    model = vt.ModelForCausalLM(cfg)
    qp = vt.quantize_params(model.init(jax.random.PRNGKey(0),
                                       dtype=jnp.float32))
    with pytest.raises(ValueError, match="quantized"):
        export_qwen(qp, cfg)
