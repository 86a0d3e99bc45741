"""Sliding-window attention (Mistral-style; beyond the reference): banded
masks across the dense, static-cache and paged-serving paths, triangulated
by cross-path token-exactness."""

import jax
import jax.numpy as jnp
import numpy as np

import vyomai_tpu as vt
from vyomai_tpu.core.masks import banded_causal_mask, causal_mask_static_kv
from vyomai_tpu.generation import generate
from vyomai_tpu.serving import ContinuousBatchEngine

KW = dict(vocab_size=64, hidden_size=32, intermediate_size=64,
          num_hidden_layers=2, num_attention_heads=2,
          num_key_value_heads=2, head_dim=16, max_position_embeddings=128)


def _model(window):
    cfg = vt.QwenConfig(**KW, sliding_window=window)
    m = vt.ModelForCausalLM(cfg)
    return m, m.init(jax.random.PRNGKey(0), dtype=jnp.float32)


def test_banded_mask_matches_numpy():
    L, W = 7, 3
    add = np.asarray(banded_causal_mask(L, W))[0, 0]
    for i in range(L):
        for j in range(L):
            want = (j <= i) and (j > i - W)
            assert (add[i, j] == 0.0) == want, (i, j)
    # static-kv variant agrees on the band
    skv = np.asarray(causal_mask_static_kv(L, L, 0, window=W))[0, 0]
    np.testing.assert_array_equal(add == 0.0, skv == 0.0)


def test_window_wider_than_context_is_full_causal():
    ids = jnp.array([[3, 17, 42, 9, 5, 11]], dtype=jnp.int32)
    m_full, params = _model(None)
    m_win, _ = _model(100)      # window >> context
    lf = np.asarray(m_full.apply(params, ids).logits)
    lw = np.asarray(m_win.apply(params, ids).logits)
    np.testing.assert_allclose(lw, lf, rtol=2e-5, atol=2e-5)


def test_window_engages_beyond_width():
    ids = jnp.arange(1, 25)[None] % 63 + 1
    m_full, params = _model(None)
    m_win, _ = _model(4)
    lf = np.asarray(m_full.apply(params, ids).logits)
    lw = np.asarray(m_win.apply(params, ids).logits)
    # first `window` positions see identical context; later ones differ
    np.testing.assert_allclose(lw[:, :4], lf[:, :4], rtol=2e-5, atol=2e-5)
    assert not np.allclose(lw[:, -1], lf[:, -1], atol=1e-4)


def test_swa_cached_equals_uncached():
    """The windowed static-cache decode implements the SAME band as the
    uncached banded forward: greedy generations are token-exact."""
    m, params = _model(4)
    ids = jnp.array([[3, 17, 42, 9, 5, 11, 2, 8]], dtype=jnp.int32)
    cached = generate(m, params, ids, max_new_tokens=10, use_cache=True)
    uncached = generate(m, params, ids, max_new_tokens=10, use_cache=False)
    np.testing.assert_array_equal(np.asarray(cached), np.asarray(uncached))


def test_swa_engine_matches_dense():
    """Paged-serving SWA (banded prefill mask + windowed decode attention,
    Pallas bypassed) emits exactly the dense cached-greedy tokens."""
    m, params = _model(5)
    prompts = [[3, 17, 42, 9, 5, 11, 2], [4, 8, 1]]
    eng = ContinuousBatchEngine(m, params, num_blocks=64, block_size=8,
                                max_batch=2, max_new_tokens=8,
                                dtype=jnp.float32)
    sids = [eng.submit(p) for p in prompts]
    out = eng.run()
    for sid, p in zip(sids, prompts):
        dense = generate(m, params, jnp.asarray([p]), max_new_tokens=8,
                         use_cache=True)
        assert out[sid] == np.asarray(dense)[0, len(p):].tolist()


def test_qwen_config_from_hf():
    from vyomai_tpu.interop.hf_import import qwen_config_from_hf
    hf = {"vocab_size": 151936, "hidden_size": 2048,
          "intermediate_size": 11008, "num_hidden_layers": 36,
          "num_attention_heads": 16, "num_key_value_heads": 2,
          "max_position_embeddings": 40960, "rms_norm_eps": 1e-6,
          "rope_theta": 1000000.0, "model_type": "qwen3",
          "tie_word_embeddings": True, "eos_token_id": 151645,
          "sliding_window": 4096, "use_sliding_window": False,
          "rope_scaling": {"rope_type": "yarn", "factor": 4.0,
                           "original_max_position_embeddings": 32768},
          "head_dim": 128}
    cfg = qwen_config_from_hf(hf)
    assert cfg.head_dim == 128 and cfg.qk_norm and cfg.tie_word_embeddings
    assert cfg.sliding_window is None        # gate off -> inactive
    assert cfg.rope_scaling["rope_type"] == "yarn"
    cfg2 = qwen_config_from_hf({**hf, "use_sliding_window": True})
    assert cfg2.sliding_window == 4096
    # models build and scale from it
    m = vt.ModelForCausalLM(cfg)
    assert m.rope_scale > 1.0


def test_attention_sinks_streaming_invariants():
    """StreamingLLM sinks: cached == uncached, engine == dense, sink
    positions attendable from everywhere (logits differ from plain SWA),
    and a pure-window model differs once context exceeds the window."""
    cfg = vt.QwenConfig(**KW, sliding_window=4, attention_sinks=2)
    m = vt.ModelForCausalLM(cfg)
    params = m.init(jax.random.PRNGKey(0), dtype=jnp.float32)
    ids = jnp.array([[3, 17, 42, 9, 5, 11, 2, 8, 4, 1]], dtype=jnp.int32)

    cached = generate(m, params, ids, max_new_tokens=8, use_cache=True)
    uncached = generate(m, params, ids, max_new_tokens=8, use_cache=False)
    np.testing.assert_array_equal(np.asarray(cached), np.asarray(uncached))

    eng = ContinuousBatchEngine(m, params, num_blocks=64, block_size=8,
                                max_batch=2, max_new_tokens=8,
                                dtype=jnp.float32)
    sid = eng.submit(np.asarray(ids)[0].tolist())
    assert eng.run()[sid] == np.asarray(cached)[0, 10:].tolist()

    plain = vt.ModelForCausalLM(vt.QwenConfig(**KW, sliding_window=4))
    lp = np.asarray(plain.apply(params, ids).logits[0, -1])
    ls = np.asarray(m.apply(params, ids).logits[0, -1])
    assert not np.allclose(lp, ls, atol=1e-4), "sinks must change attention"


def test_release_prewindow_manager_unit():
    """Manager-level: prewindow release frees owned blocks only (cached
    prefix + sink blocks survive), leaves -1 holes, disables radix deposit,
    and the final free() never double-frees."""
    from vyomai_tpu.serving.kv_manager import PagedKVManager, SequenceState
    kv = PagedKVManager(num_blocks=12, block_size=4)
    s = SequenceState(0, list(range(1, 17)))     # 16 tokens = 4 blocks
    assert kv.allocate(s, 16)
    free_before = kv.num_free()
    # free blocks 1.. before block 3, keeping 1 sink block
    n = kv.release_prewindow(s, first_live_block=3, keep_blocks=1)
    assert n == 2 and s.has_holes
    assert s.block_table[1] == -1 and s.block_table[2] == -1
    assert s.block_table[0] >= 0 and s.block_table[3] >= 0
    assert kv.num_free() == free_before + 2
    n2 = kv.release_prewindow(s, first_live_block=3, keep_blocks=1)
    assert n2 == 0                                # idempotent
    kv.free(s)                                    # no deposit, no doublefree
    assert kv.num_free() == 12
    assert not kv.radix_root.children             # holed: nothing cached


def test_window_freeing_bounds_pool_usage():
    """Two concurrent long generations whose FULL-attention footprint
    exceeds the pool run preemption-free under a window (out-of-band
    blocks recycle), and stay token-exact vs dense windowed decode."""
    cfg = vt.QwenConfig(**KW, sliding_window=16)
    m = vt.ModelForCausalLM(cfg)
    params = m.init(jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.default_rng(3)
    prompts = [list(rng.integers(1, 60, size=40)) for _ in range(2)]

    def run(model):
        eng = ContinuousBatchEngine(model, params, num_blocks=14,
                                    block_size=8, max_batch=2,
                                    max_blocks_per_seq=12,
                                    max_new_tokens=40, decode_horizon=4,
                                    dtype=jnp.float32, kv_backend="python",
                                    prefill_buckets=(64,))
        sids = [eng.submit(p) for p in prompts]
        out = eng.run()
        return [out[s] for s in sids], eng

    outs, eng = run(m)
    assert eng.counters["preemptions"] == 0, \
        "window freeing should prevent pool thrash"
    assert eng.kv.num_free() == 14
    for toks, p in zip(outs, prompts):
        dense = generate(m, params, jnp.asarray([p]), max_new_tokens=40,
                         use_cache=True)
        assert toks == np.asarray(dense)[0, len(p):].tolist(), \
            "freeing changed tokens"
    # same pool WITHOUT a window: footprint 2 x 10 blocks > 14 forces
    # preemption (both still finish, serially)
    m_full = vt.ModelForCausalLM(vt.QwenConfig(**KW))
    outs_full, eng_full = run(m_full)
    assert eng_full.counters["preemptions"] > 0
    assert all(len(t) == 40 for t in outs_full)


def test_window_freeing_with_sinks_and_radix():
    """A radix-cached shared prefix survives another sequence's prewindow
    reclaim (cached nodes are never freed as holes), while that sequence's
    OWN out-of-band blocks do recycle; everything stays dense-exact.

    Deposit rules: a sequence that ever holed never deposits, so the
    prefix enters the cache via a SHORT request that finishes inside its
    window."""
    cfg = vt.QwenConfig(**KW, sliding_window=24)
    m = vt.ModelForCausalLM(cfg)
    params = m.init(jax.random.PRNGKey(0), dtype=jnp.float32)
    shared = list(range(1, 27))                   # 3 whole blocks at bs=8
    eng = ContinuousBatchEngine(m, params, num_blocks=32, block_size=8,
                                max_batch=2, max_blocks_per_seq=10,
                                max_new_tokens=40, decode_horizon=4,
                                dtype=jnp.float32, kv_backend="python")
    a = eng.submit(shared + [30, 31], max_new_tokens=2)   # stays in-window
    out_a = eng.run()[a]
    # long request: radix-matches the prefix, then holes its own blocks
    b = eng.submit(shared + [40, 41])
    free_mid = None
    sid_state = None
    while eng.waiting or eng.active or eng.needs_prefill:
        eng.step()
        for st in eng.active.values():
            sid_state = st
    out_b = eng.finished[b].tokens[28:]
    eng.finished.clear()
    assert sid_state is not None and sid_state.has_holes, \
        "long windowed sequence should have reclaimed blocks"
    for sid_out, tail, n in ((out_a, [30, 31], 2), (out_b, [40, 41], 40)):
        dense = generate(m, params, jnp.asarray([shared + tail]),
                         max_new_tokens=n, use_cache=True)
        assert sid_out == np.asarray(dense)[0, 28:].tolist()
    # the shared prefix is still radix-cached (holes freed only OWNED
    # blocks, never the cached nodes)
    from vyomai_tpu.serving.kv_manager import SequenceState
    st = SequenceState(99, shared + [50])
    assert eng.kv.match_prefix(st) >= 16
    eng.kv.release_sequence(st)


def test_swa_composes_with_tp_and_int8_pool():
    """Compose matrix: windowed model on a (1,2) TP mesh and on an int8
    paged pool both emit the single-chip bf16-pool engine's greedy tokens."""
    from jax.sharding import Mesh
    cpus = jax.devices("cpu")
    if len(cpus) < 2:
        import pytest
        pytest.skip("needs 2 virtual CPU devices")
    cfg = vt.QwenConfig(**KW, sliding_window=6, attention_sinks=2)
    m = vt.ModelForCausalLM(cfg)
    params = m.init(jax.random.PRNGKey(0), dtype=jnp.float32)
    prompts = [[3, 17, 42, 9, 5, 11, 2, 8], [4, 8, 1]]

    def run(**kw):
        kw.setdefault("dtype", jnp.float32)
        eng = ContinuousBatchEngine(m, params, num_blocks=64, block_size=8,
                                    max_batch=2, max_blocks_per_seq=8,
                                    max_new_tokens=6,
                                    prefill_buckets=(8, 16), **kw)
        sids = [eng.submit(p) for p in prompts]
        out = eng.run()
        return [out[s] for s in sids]

    with jax.default_device(cpus[0]):
        base = run()
        mesh = Mesh(np.asarray(cpus[:2]).reshape(1, 2), ("data", "model"))
        assert run(mesh=mesh) == base
        assert run(dtype=jnp.int8) == base
