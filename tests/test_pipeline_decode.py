"""Pipelined decode-tick equivalence: an engine with ``pipeline_decode``
(chained device-carry ticks — the r5 answer to the measured ~3 ms/step
host+fetch tax, ``benchmarks/decode_step_profile.py``) must be TOKEN-EXACT
against the synchronous engine across eos exits, max_new edges, staggered
admissions, block-cap exits, and seeded sampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vyomai_tpu as vt
from vyomai_tpu.serving import ContinuousBatchEngine

CFG = vt.QwenConfig(vocab_size=512, hidden_size=64, intermediate_size=128,
                    num_hidden_layers=2, num_attention_heads=4,
                    num_key_value_heads=2, head_dim=32,
                    max_position_embeddings=256, qk_norm=True,
                    eos_token_id=7, tie_word_embeddings=True)


@pytest.fixture(scope="module")
def qwen():
    model = vt.ModelForCausalLM(CFG)
    params = model.init(jax.random.PRNGKey(2), dtype=jnp.float32)
    return model, params


def _engine(qwen, pipeline, **kw):
    model, params = qwen
    kw.setdefault("num_blocks", 128)
    kw.setdefault("block_size", 8)
    kw.setdefault("max_batch", 4)
    kw.setdefault("max_blocks_per_seq", 8)
    kw.setdefault("max_new_tokens", 24)
    kw.setdefault("dtype", jnp.float32)
    kw.setdefault("prefill_buckets", (16, 32))
    kw.setdefault("decode_horizon", 6)
    return ContinuousBatchEngine(model, params, eos_token_id=7,
                                 pipeline_decode=pipeline, **kw)


def _prompts(n, rng, lo=4, hi=30):
    return [list(rng.integers(10, 500, size=int(rng.integers(lo, hi))))
            for _ in range(n)]


def _run_both(qwen, prompts, submit_kw=None, **engine_kw):
    outs = []
    for pipeline in (False, True):
        eng = _engine(qwen, pipeline, **engine_kw)
        sids = [eng.submit(list(p), **(submit_kw or {})) for p in prompts]
        out = eng.run()
        outs.append({i: out[s] for i, s in enumerate(sids)})
        if pipeline:
            chained = eng.counters.get("chained_ticks", 0)
    return outs[0], outs[1], chained


def test_pipeline_matches_sync_greedy(qwen):
    rng = np.random.default_rng(0)
    sync, piped, chained = _run_both(qwen, _prompts(6, rng))
    assert piped == sync
    assert chained > 0, "pipeline never engaged on a plain greedy workload"


def test_pipeline_matches_sync_ignore_eos_max_new(qwen):
    """All lanes run to max_new (the throughput-bench regime)."""
    rng = np.random.default_rng(1)
    sync, piped, chained = _run_both(qwen, _prompts(5, rng),
                                     submit_kw={"ignore_eos": True})
    assert piped == sync
    assert all(len(v) == 24 for v in piped.values())
    assert chained > 0


def test_pipeline_matches_sync_block_cap(qwen):
    """Lanes that exhaust the per-sequence block table exit out_of_blocks;
    the chain must drain before that harvest (the freed-block hazard)."""
    rng = np.random.default_rng(2)
    prompts = _prompts(4, rng, lo=20, hi=30)
    sync, piped, _ = _run_both(qwen, prompts,
                               submit_kw={"ignore_eos": True},
                               max_blocks_per_seq=5, max_new_tokens=40)
    assert piped == sync


def test_pipeline_matches_sync_staggered_submit(qwen):
    """Admissions mid-stream break the chain (composition change) and the
    engine must resync without drift."""
    rng = np.random.default_rng(3)
    prompts = _prompts(6, rng)
    outs = []
    for pipeline in (False, True):
        eng = _engine(qwen, pipeline, max_batch=3)
        sids = [eng.submit(list(p)) for p in prompts[:3]]
        for _ in range(3):
            eng.step()
        sids += [eng.submit(list(p)) for p in prompts[3:]]
        out = eng.run()
        outs.append({i: out[s] for i, s in enumerate(sids)})
    assert outs[0] == outs[1]


def test_pipeline_matches_sync_seeded_sampling(qwen):
    """Per-request seeded sampling: the chained tick's gen_base arithmetic
    must reproduce the synchronous draw stream exactly."""
    rng = np.random.default_rng(4)
    prompts = _prompts(4, rng)
    outs = []
    for pipeline in (False, True):
        eng = _engine(qwen, pipeline, do_sample=True, temperature=0.9,
                      top_p=0.95)
        sids = [eng.submit(list(p), seed=100 + i, ignore_eos=True)
                for i, p in enumerate(prompts)]
        out = eng.run()
        outs.append({i: out[s] for i, s in enumerate(sids)})
    assert outs[0] == outs[1]


def test_pipeline_falls_back_on_stop_sequences(qwen):
    """stop-sequence lanes are host-finished: the engine must not chain
    (and stays token-exact)."""
    rng = np.random.default_rng(5)
    prompts = _prompts(3, rng)
    outs, counters = [], []
    for pipeline in (False, True):
        eng = _engine(qwen, pipeline)
        sids = [eng.submit(list(p), stop=[[11, 12]]) for p in prompts]
        out = eng.run()
        outs.append({i: out[s] for i, s in enumerate(sids)})
        counters.append(eng.counters.get("chained_ticks", 0))
    assert outs[0] == outs[1]
    assert counters[1] == 0, "chained despite host-side stop sequences"


def test_pipeline_under_pool_pressure_preemption(qwen):
    """A pool too small for all lanes forces allocation failures and
    preemption: the chain path must refuse to dispatch (falling back to
    the sync path, which preempts) and stay token-exact."""
    rng = np.random.default_rng(7)
    prompts = _prompts(4, rng, lo=8, hi=16)
    outs = []
    for pipeline in (False, True):
        # 24 blocks x 8 = 192 token slots for 4 lanes x (16+24+1) tokens:
        # tight enough to force grant-shrinking and preemption
        eng = _engine(qwen, pipeline, num_blocks=24)
        sids = [eng.submit(list(p), ignore_eos=True) for p in prompts]
        out = eng.run()
        outs.append({i: out[s] for i, s in enumerate(sids)})
    assert outs[0] == outs[1]


def test_pipeline_radix_promotion_after_finish(qwen):
    """Finished lanes promote their blocks into the radix cache while a
    chained (all-dead) tick may still be in flight; a second wave sharing
    the same prompt prefix must reuse the cache and match the sync
    engine."""
    rng = np.random.default_rng(8)
    shared = list(rng.integers(10, 500, size=12))
    outs, hits = [], []
    for pipeline in (False, True):
        eng = _engine(qwen, pipeline)
        a = [eng.submit(shared + list(rng.integers(10, 500, size=4)))
             for rng in [np.random.default_rng(9)] for _ in range(2)]
        eng.run()
        b = [eng.submit(shared + [7 + i, 11, 13]) for i in range(2)]
        out = eng.run()
        outs.append([out[s] for s in b])
        hits.append(eng.counters.get("cached_prompt_tokens", 0))
    assert outs[0] == outs[1]
    assert hits[1] > 0, "radix never hit under pipelining"


def test_pipeline_reuse_after_drain(qwen):
    """A leftover in-flight tick (everything finished while it was
    dispatched) must not corrupt a later submission wave."""
    rng = np.random.default_rng(6)
    eng = _engine(qwen, True)
    ref = _engine(qwen, False)
    for wave in range(3):
        prompts = _prompts(3, rng)
        a = [eng.submit(list(p)) for p in prompts]
        b = [ref.submit(list(p)) for p in prompts]
        oa, ob = eng.run(), ref.run()
        assert [oa[x] for x in a] == [ob[x] for x in b], f"wave {wave}"
