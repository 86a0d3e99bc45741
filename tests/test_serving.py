"""Serving engine tests: paged KV manager, radix prefix cache, engine
greedy parity vs the dense static-cache decode path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vyomai_tpu as vt
from vyomai_tpu.generation import generate
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


def test_kv_manager_allocate_free():
    kv = PagedKVManager(num_blocks=8, block_size=4)
    s = SequenceState(0, [1, 2, 3, 4, 5])
    assert kv.allocate(s, 5)
    assert len(s.block_table) == 2
    assert kv.num_free() == 6
    s.tokens += [6, 7, 8]  # 8 tokens = 2 full blocks
    kv.free(s)
    # both full blocks became evictable radix entries; still reusable
    assert kv.num_free() == 8


def test_radix_prefix_match():
    kv = PagedKVManager(num_blocks=8, block_size=4)
    s = SequenceState(0, list(range(9)))
    kv.allocate(s, 9)
    kv.free(s)  # caches blocks for tokens [0..3] and [4..7]
    s2 = SequenceState(1, list(range(8)) + [99])
    covered = kv.match_prefix(s2)
    assert covered == 8
    assert len(s2.block_table) == 2
    # a diverging prompt matches only the first block
    s3 = SequenceState(2, [0, 1, 2, 3, 50, 51, 52, 53, 54])
    assert kv.match_prefix(s3) == 4


def test_radix_never_covers_whole_prompt():
    kv = PagedKVManager(num_blocks=8, block_size=4)
    s = SequenceState(0, list(range(8)))
    kv.allocate(s, 8)
    kv.free(s)
    s2 = SequenceState(1, list(range(8)))  # identical prompt
    covered = kv.match_prefix(s2)
    assert covered == 4  # one block held back for prefill logits


def test_lru_eviction_frees_blocks():
    kv = PagedKVManager(num_blocks=4, block_size=4)
    s = SequenceState(0, list(range(8)))
    kv.allocate(s, 8)
    kv.free(s)
    assert kv.num_free() == 4
    # pool exhausted via fresh allocations -> evicts cached leaves
    s2 = SequenceState(1, [90 + i for i in range(16)])
    assert kv.allocate(s2, 16)
    assert len(s2.block_table) == 4


def test_engine_matches_dense_greedy(qwen):
    model, params = qwen
    prompts = [[3, 17, 42, 9], [5, 11], [3, 17, 42, 9, 21, 33]]
    eng = ContinuousBatchEngine(model, params, num_blocks=64, block_size=8,
                                max_batch=4, max_blocks_per_seq=8,
                                max_new_tokens=6, dtype=jnp.float32,
                                prefill_buckets=(8, 16))
    sids = [eng.submit(p) for p in prompts]
    out = eng.run()
    for sid, prompt in zip(sids, prompts):
        ref = generate(model, params, jnp.asarray([prompt], dtype=jnp.int32),
                       max_new_tokens=6, use_cache=True)
        assert out[sid] == ref[0, len(prompt):].tolist(), f"seq {sid}"


def test_engine_prefix_cache_reuse(qwen):
    model, params = qwen
    eng = ContinuousBatchEngine(model, params, num_blocks=64, block_size=8,
                                max_batch=4, max_blocks_per_seq=8,
                                max_new_tokens=4, dtype=jnp.float32,
                                prefill_buckets=(8, 16))
    p1 = [3, 17, 42, 9, 21, 33, 40, 2, 7, 1]
    sid1 = eng.submit(p1)
    out1 = eng.run()
    # identical prompt again: prefix blocks come from the radix cache
    sid2 = eng.submit(list(p1))
    out2 = eng.run()
    assert out1[sid1] == out2[sid2]
    # all blocks recovered afterwards
    assert eng.kv.num_free() == 64


def test_engine_more_requests_than_batch(qwen):
    model, params = qwen
    eng = ContinuousBatchEngine(model, params, num_blocks=64, block_size=8,
                                max_batch=2, max_blocks_per_seq=8,
                                max_new_tokens=3, dtype=jnp.float32,
                                prefill_buckets=(8,))
    sids = [eng.submit([i + 1, i + 2, i + 3]) for i in range(5)]
    out = eng.run()
    assert set(out.keys()) == set(sids)
    assert all(len(v) == 3 for v in out.values())


def test_engine_rejects_oversized_prompt(qwen):
    model, params = qwen
    eng = ContinuousBatchEngine(model, params, num_blocks=64, block_size=8,
                                max_batch=2, max_blocks_per_seq=8,
                                max_new_tokens=2, dtype=jnp.float32,
                                prefill_buckets=(8,))
    eng.submit(list(range(3, 20)))  # 17 tokens > largest bucket 8
    with pytest.raises(ValueError, match="prefill bucket"):
        eng.run()
