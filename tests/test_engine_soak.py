"""Feature-INTERACTION soak (VERDICT r3 #8): 1k+ requests through
preemption + radix eviction + int4 KV pool + sliding-window reclaim +
per-request params + aborts + cache-aware admission + capped
prefill-per-tick SIMULTANEOUSLY (the other stress tests exercise these
separately).

Token values are NOT asserted against a dense reference here — the int4
pool is documented lossy (see test_int4_pool) — the soak asserts the
engine's structural invariants survive the interaction:

- every non-aborted request finishes, within its token budget;
- the scheduler always drains (bounded steps per wave);
- the pool returns to exactly its initial free-block count after the
  final drain (no leaked/double-freed blocks across preemption x radix
  eviction x sliding-window reclaim x int4);
- the radix counters move (hits and evictions both occur), and the
  preemption path was actually exercised.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vyomai_tpu as vt
from vyomai_tpu.serving import ContinuousBatchEngine

CFG = vt.QwenConfig(vocab_size=96, hidden_size=64, intermediate_size=128,
                    num_hidden_layers=2, num_attention_heads=2,
                    num_key_value_heads=2, head_dim=128,
                    max_position_embeddings=256, eos_token_id=-1,
                    sliding_window=40, attention_sinks=8)

N_REQUESTS = 1024
WAVE = 128
MAX_NEW = 10


@pytest.fixture(scope="module")
def model():
    m = vt.ModelForCausalLM(CFG)
    return m, m.init(jax.random.PRNGKey(0), dtype=jnp.float32)


def test_engine_soak_all_features(model):
    m, params = model
    rng = np.random.default_rng(42)
    eng = ContinuousBatchEngine(
        m, params, num_blocks=24, block_size=8, max_batch=6,
        max_blocks_per_seq=6, max_new_tokens=MAX_NEW, decode_horizon=3,
        dtype="int4", prefill_buckets=(8, 32),
        kv_backend="python",              # sliding-window reclaim path
        cache_aware_admission=True, max_prefill_per_tick=1)
    free0 = eng.kv.num_free()

    shared = [list(rng.integers(1, 96, size=17)) for _ in range(3)]
    submitted, aborted, results = {}, set(), {}
    n_sent = 0
    while n_sent < N_REQUESTS or eng.waiting or eng.active \
            or eng.needs_prefill:
        # submit in waves so admission pressure stays high the whole run
        while n_sent < N_REQUESTS and len(eng.waiting) < WAVE:
            if rng.random() < 0.25:
                prompt = shared[int(rng.integers(3))][:] + list(
                    rng.integers(1, 96, size=rng.integers(1, 8)))
            else:
                # LONG prompts (3-6 blocks each): six admitted lanes
                # demand more than the 24-block pool, so decode-time
                # growth must preempt (probed: ~8 preemptions / 256 reqs)
                prompt = list(rng.integers(1, 96, size=rng.integers(24, 41)))
            kw = {}
            r = rng.random()
            if r < 0.2:
                kw = dict(max_new_tokens=int(rng.integers(1, MAX_NEW)))
            elif r < 0.35:
                kw = dict(stop=[[int(t)]
                                for t in rng.integers(1, 96, size=2)])
            elif r < 0.5:
                kw = dict(frequency_penalty=4.0)
            elif r < 0.6:
                kw = dict(repetition_penalty=1.7)
            elif r < 0.7:
                kw = dict(logit_bias={int(rng.integers(1, 96)): 6.0},
                          min_tokens=int(rng.integers(0, 3)))
            sid = eng.submit(prompt, **kw)
            submitted[sid] = kw
            n_sent += 1
        steps = 0
        # drain each wave down to half; after the LAST submission, drain
        # everything (target 0 and no waiting-length early exit)
        draining = n_sent >= N_REQUESTS
        target = 0 if draining else max(0, len(eng.waiting) - WAVE // 2)
        while (eng.waiting or eng.active or eng.needs_prefill) and \
                (draining or len(eng.waiting) > target):
            eng.step()
            steps += 1
            if steps % 7 == 0 and rng.random() < 0.25:
                live = [s for s in eng.active if s not in aborted]
                if live:
                    victim = int(rng.choice(live))
                    if eng.abort(victim):
                        aborted.add(victim)
            assert steps < 5000, "scheduler failed to make progress"
        for sid, s in eng.finished.items():
            results.setdefault(sid, s.tokens[s.prompt_len:])
        eng.finished.clear()

    for sid, kw in submitted.items():
        if sid in aborted and sid not in results:
            continue
        assert sid in results, sid
        limit = kw.get("max_new_tokens", MAX_NEW)
        floor = 0 if "stop" in kw else 1
        assert floor <= len(results[sid]) <= limit, (sid, kw)

    assert eng.kv.num_free() == free0, "leaked blocks after full drain"
    mets = eng.metrics()
    assert mets["requests_submitted"] == N_REQUESTS
    assert mets["radix_hits"] > 0, "shared prefixes never hit the cache"
    assert mets["radix_evictions"] > 0, "tiny pool must evict"
    assert mets["preemptions"] > 0, "pool pressure must preempt"
    assert mets["tokens_generated"] > N_REQUESTS // 2
