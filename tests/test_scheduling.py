"""Scheduler policy tests: capped prefill-per-tick interleaving (the
bounded-stall answer to the reference's mixed prefill+decode step,
``simple_vllm.ipynb`` ``_prepare_inference_data``), cache-aware admission,
and the radix observability counters surfaced through ``engine.metrics()``."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vyomai_tpu as vt
from vyomai_tpu.serving import ContinuousBatchEngine, PagedKVManager
from vyomai_tpu.serving.kv_manager import SequenceState

QCFG = vt.QwenConfig(vocab_size=512, hidden_size=64, intermediate_size=128,
                     num_hidden_layers=2, num_attention_heads=4,
                     num_key_value_heads=2, head_dim=32,
                     max_position_embeddings=256, qk_norm=True,
                     eos_token_id=9999, tie_word_embeddings=True)


@pytest.fixture(scope="module")
def qwen():
    model = vt.ModelForCausalLM(QCFG)
    params = model.init(jax.random.PRNGKey(2), dtype=jnp.float32)
    return model, params


def _engine(model, params, **kw):
    defaults = dict(num_blocks=128, block_size=8, max_batch=8,
                    max_blocks_per_seq=8, max_new_tokens=6,
                    dtype=jnp.float32, prefill_buckets=(8, 16),
                    decode_horizon=2, prefill_group=1)
    defaults.update(kw)
    return ContinuousBatchEngine(model, params, **defaults)


PROMPTS = [[3, 17, 42, 9], [5, 11, 7], [2, 4, 6, 8, 10], [1, 9, 8],
           [7, 7, 3, 1], [12, 13], [40, 41, 42], [100, 101, 102, 103]]


def test_max_prefill_per_tick_interleaves(qwen):
    """With the cap set, a tick stops prefilling once sequences are live:
    decodes run while admissions still wait, so running sequences' stall
    per tick is bounded by the cap."""
    model, params = qwen
    eng = _engine(model, params, max_prefill_per_tick=1)
    for p in PROMPTS:
        eng.submit(p, ignore_eos=True)
    eng.step()   # tick 1: no actives yet -> prefills drain freely
    interleaved = False
    while eng.waiting or eng.active or eng.needs_prefill:
        if eng.needs_prefill and any(len(s.tokens) > s.prompt_len + 1
                                     for s in eng.active.values()):
            interleaved = True   # decode progressed with prefills pending
        eng.step()
    assert interleaved
    out = {sid: s for sid, s in eng.finished.items()}
    assert len(out) == len(PROMPTS)


def test_max_prefill_per_tick_token_exact(qwen):
    """The cap is a scheduling policy, not a numerics change: outputs are
    identical to the drain-all engine."""
    model, params = qwen
    eng_a = _engine(model, params)                          # drain-all
    eng_b = _engine(model, params, max_prefill_per_tick=1)  # capped
    for p in PROMPTS:
        eng_a.submit(p, ignore_eos=True)
        eng_b.submit(p, ignore_eos=True)
    out_a, out_b = eng_a.run(), eng_b.run()
    assert out_a.keys() == out_b.keys()
    for sid in out_a:
        assert out_a[sid] == out_b[sid], sid


def test_cache_aware_admission_prefers_cached_prefix(qwen):
    """With ``cache_aware_admission`` and a serialized engine
    (max_batch=1), a request whose prefix is radix-cached jumps ahead of
    an earlier novel request; outputs stay correct for both."""
    model, params = qwen
    shared = list(range(1, 17))   # 2 full blocks at block_size=8
    eng = _engine(model, params, max_batch=1, cache_aware_admission=True,
                  kv_backend="python")
    warm = eng.submit(shared + [20], ignore_eos=True)
    eng.run()   # deposits the shared prefix into the radix tree
    novel = eng.submit([200, 201, 202, 203, 204], ignore_eos=True)
    cached = eng.submit(shared + [21], ignore_eos=True)
    order = []
    while eng.waiting or eng.active or eng.needs_prefill:
        eng.step()
        for sid in eng.finished:
            if sid not in order:
                order.append(sid)
    assert order.index(cached) < order.index(novel)
    m = eng.metrics()
    assert m["radix_hits"] >= 1
    assert m["radix_hit_blocks"] >= 2
    assert m["cached_prompt_tokens"] >= 16


def test_cache_aware_skip_cap_prevents_starvation(qwen):
    """A request passed over ``_admission_skip_cap`` times is admitted
    next regardless of cache status (anti-starvation guard)."""
    model, params = qwen
    eng = _engine(model, params, max_batch=1, cache_aware_admission=True,
                  kv_backend="python")
    starved = SequenceState(991, [200, 201, 202, 203])
    starved.prefill_len = 4
    starved.admission_skips = eng._admission_skip_cap
    lucky = SequenceState(992, [1, 2, 3, 4])
    lucky.prefill_len = 4
    eng.waiting.extend([starved, lucky])
    eng._select_admission()
    assert eng.waiting[0] is starved


def test_metrics_expose_radix_counters(qwen):
    model, params = qwen
    eng = _engine(model, params)
    eng.submit([3, 17, 42, 9, 5, 4, 3, 2, 1], ignore_eos=True)
    eng.run()
    m = eng.metrics()
    for key in ("radix_lookups", "radix_hits", "radix_hit_blocks",
                "radix_evictions"):
        assert key in m
    assert m["radix_lookups"] >= 1


def test_peek_prefix_no_side_effects():
    kv = PagedKVManager(num_blocks=8, block_size=4)
    s = SequenceState(0, list(range(9)))
    kv.allocate(s, 9)
    kv.free(s)
    free0 = kv.num_free()
    assert kv.peek_prefix(list(range(8)) + [99]) == 8
    assert kv.peek_prefix(list(range(8))) == 4    # whole-prompt cap
    assert kv.peek_prefix([50, 51, 52, 53]) == 0
    assert kv.num_free() == free0
    # peek acquired nothing: a real match still works and refcounts balance
    probe = SequenceState(1, list(range(8)) + [99])
    assert kv.match_prefix(probe) == 8
    kv.release_sequence(probe)
    assert kv.num_free() == free0
