"""Prompt-lookup (n-gram) speculative serving: drafter-free speculation
with the bigram proposer running in-graph (``paged_model.ngram_horizon``).
Core invariant: greedy output is TOKEN-EXACT vs the plain engine — every
proposal is verified by the target's own argmax (the acceptance rule of
reference ``speculative_decoding.py:85-245`` with the drafter replaced by
suffix matching over the sequence's own history)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vyomai_tpu as vt
from vyomai_tpu.serving import ContinuousBatchEngine

QCFG = vt.QwenConfig(vocab_size=512, hidden_size=64, intermediate_size=128,
                     num_hidden_layers=2, num_attention_heads=4,
                     num_key_value_heads=2, head_dim=32,
                     max_position_embeddings=256, qk_norm=True,
                     eos_token_id=9999, tie_word_embeddings=True)

PROMPTS = [[3, 17, 42, 9], [5, 11], [7, 7, 7, 7, 7, 7]]


@pytest.fixture(scope="module")
def qwen():
    model = vt.ModelForCausalLM(QCFG)
    params = model.init(jax.random.PRNGKey(2), dtype=jnp.float32)
    return model, params


def _run(model, params, prompts, **kw):
    kw.setdefault("dtype", jnp.float32)
    eng = ContinuousBatchEngine(model, params, num_blocks=64, block_size=8,
                                max_batch=4, max_new_tokens=12, **kw)
    sids = [eng.submit(p) for p in prompts]
    out = eng.run()
    return [out[s] for s in sids], eng


def test_ngram_engine_token_exact(qwen):
    """Mixed prompts, multiple ticks: ngram engine greedy == plain engine
    greedy, with nonzero acceptance (greedy outputs self-repeat) and fewer
    device round-trips than tokens generated."""
    model, params = qwen
    ref, _ = _run(model, params, PROMPTS)
    got, eng = _run(model, params, PROMPTS,
                    ngram_speculation=True, gamma=4, spec_rounds=2)
    assert got == ref
    assert eng.spec_stats["speculated"] > 0
    assert eng.spec_stats["accepted"] > 0, \
        "repetitive greedy output must produce bigram hits"
    total = sum(len(t) for t in got)
    assert eng.metrics()["spec_ticks"] < total, \
        "speculation must emit >1 token per tick on this workload"


def test_ngram_gamma_rounds_grid(qwen):
    """Token-exactness holds across (gamma, rounds) shapes, including
    gamma=1 (single proposed token) and rounds=1 (one round per tick)."""
    model, params = qwen
    ref, _ = _run(model, params, PROMPTS)
    for gamma, rounds in [(1, 1), (2, 3), (6, 1)]:
        got, _ = _run(model, params, PROMPTS, ngram_speculation=True,
                      gamma=gamma, spec_rounds=rounds)
        assert got == ref, (gamma, rounds)


def test_ngram_eos_finish(qwen):
    """A sequence hitting EOS mid-round finishes exactly like the plain
    engine (mid-block emitted tokens after EOS are never surfaced)."""
    model, params = qwen
    ref, _ = _run(model, params, PROMPTS)
    eos = ref[1][4]  # a token the greedy continuation actually emits
    cfg = vt.QwenConfig(**{**QCFG.__dict__, "eos_token_id": int(eos)})
    m2 = vt.ModelForCausalLM(cfg)
    r2, _ = _run(m2, params, PROMPTS)
    g2, _ = _run(m2, params, PROMPTS, ngram_speculation=True,
                 gamma=3, spec_rounds=2)
    assert g2 == r2
    assert any(t and t[-1] == eos for t in g2), "EOS must actually fire"


def test_ngram_per_request_params_and_stop(qwen):
    """Per-request max_new_tokens and stop sequences compose with ngram
    speculation (host-side truncation over device-emitted blocks)."""
    model, params = qwen
    ref, _ = _run(model, params, PROMPTS)
    stop = [ref[0][2:4]]

    def both(**sub):
        out = []
        for spec in (False, True):
            eng = ContinuousBatchEngine(
                model, params, num_blocks=64, block_size=8, max_batch=4,
                max_new_tokens=12, dtype=jnp.float32,
                **({"ngram_speculation": True} if spec else {}))
            sid = eng.submit(PROMPTS[0], **sub)
            out.append(eng.run()[sid])
        return out

    plain, spec = both(max_new_tokens=5)
    assert plain == spec and len(spec) <= 5
    plain, spec = both(stop=stop)
    assert plain == spec


def test_ngram_int8_pool(qwen):
    """Ngram speculation over an int8-quantized KV pool stays token-exact
    vs the plain engine on the same pool dtype."""
    model, params = qwen
    ref, _ = _run(model, params, PROMPTS, dtype=jnp.int8)
    got, eng = _run(model, params, PROMPTS, dtype=jnp.int8,
                    ngram_speculation=True, gamma=4, spec_rounds=2)
    assert got == ref
    assert eng.spec_stats["accepted"] > 0


def test_ngram_incompatibilities(qwen):
    """Sampling, grammars, adapters, logprobs, penalties and a second
    speculator are rejected up front (verification is greedy and emits
    multi-token blocks without per-step distributions)."""
    model, params = qwen
    kw = dict(num_blocks=32, block_size=8, max_batch=2, max_new_tokens=4,
              dtype=jnp.float32, ngram_speculation=True)
    with pytest.raises(ValueError, match="greedy-only"):
        ContinuousBatchEngine(model, params, do_sample=True, **kw)
    with pytest.raises(ValueError, match="ONE speculator"):
        ContinuousBatchEngine(model, params, draft_model=model,
                              draft_params=params, **kw)
    with pytest.raises(ValueError, match="guided"):
        from vyomai_tpu.generation.constrained import TokenFSM
        fsm = TokenFSM(np.full((1, QCFG.vocab_size), -1, np.int32),
                       np.array([True]))
        ContinuousBatchEngine(model, params, fsms=[fsm], **kw)
    with pytest.raises(ValueError, match="logprobs"):
        ContinuousBatchEngine(model, params, return_logprobs=True, **kw)
    with pytest.raises(ValueError, match="multi-LoRA"):
        from vyomai_tpu.layers.adapters import inject_lora
        lora = inject_lora(params, jax.random.PRNGKey(0), rank=2)
        ContinuousBatchEngine(model, params, loras=[lora], **kw)
    eng = ContinuousBatchEngine(model, params, **kw)
    with pytest.raises(ValueError, match="penalt"):
        eng.submit(PROMPTS[0], presence_penalty=0.5)


def test_ngram_small_pool_fallback(qwen):
    """Under pool pressure the tick falls back to plain horizon decode;
    output stays token-exact (budget shrink + preemption still work)."""
    model, params = qwen
    ref, _ = _run(model, params, PROMPTS)

    eng = ContinuousBatchEngine(model, params, num_blocks=10, block_size=8,
                                max_batch=4, max_new_tokens=12,
                                dtype=jnp.float32, ngram_speculation=True,
                                gamma=4, spec_rounds=2)
    sids = [eng.submit(p) for p in PROMPTS]
    out = eng.run()
    assert [out[s] for s in sids] == ref


def test_ngram_tp_matches_single_chip(qwen):
    """Ngram speculation composes with tensor-parallel serving: the bigram
    proposer is elementwise over replicated history, verification runs
    SPMD — greedy tokens match the single-chip ngram engine exactly."""
    from jax.sharding import Mesh
    cpus = jax.devices("cpu")
    if len(cpus) < 2:
        pytest.skip("needs 2 virtual CPU devices")
    model, params = qwen

    def run(mesh):
        eng = ContinuousBatchEngine(model, params, num_blocks=64,
                                    block_size=8, max_batch=4,
                                    max_blocks_per_seq=8, max_new_tokens=6,
                                    dtype=jnp.float32,
                                    prefill_buckets=(8, 16), mesh=mesh,
                                    ngram_speculation=True, gamma=3,
                                    spec_rounds=2)
        sids = [eng.submit(p) for p in PROMPTS]
        out = eng.run()
        return [out[s] for s in sids]

    with jax.default_device(cpus[0]):
        single = run(None)
        mesh = Mesh(np.asarray(cpus[:2]).reshape(1, 2), ("data", "model"))
        assert run(mesh) == single
