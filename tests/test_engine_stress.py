"""Randomized serving-engine stress: many requests with mixed per-request
features (stop sequences, penalties, max_new overrides, aborts mid-flight)
through a SMALL pool (forced preemptions + radix churn). Invariants:

- every non-aborted request finishes with 1..max_new tokens;
- plain greedy lanes are token-exact vs the dense cached-greedy reference
  regardless of batch composition, preemption, or who else ran alongside;
- aborted requests never surface;
- the pool returns to fully-free after the drain (no leaked blocks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vyomai_tpu as vt
from vyomai_tpu.generation import generate
from vyomai_tpu.serving import ContinuousBatchEngine

CFG = vt.QwenConfig(vocab_size=96, hidden_size=32, intermediate_size=64,
                    num_hidden_layers=2, num_attention_heads=2,
                    num_key_value_heads=2, head_dim=16,
                    max_position_embeddings=256)


@pytest.fixture(scope="module")
def model():
    m = vt.ModelForCausalLM(CFG)
    return m, m.init(jax.random.PRNGKey(0), dtype=jnp.float32)


@pytest.mark.parametrize("backend", ["python", "auto"])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_engine_randomized_schedule(model, seed, backend):
    m, params = model
    rng = np.random.default_rng(seed)
    # tiny pool: 24 blocks x 8 = 192 token slots across up to 4 lanes of
    # up to ~44-token contexts -> admission pressure + preemptions
    # (backend "auto" runs the native C++ radix/allocator when built)
    eng = ContinuousBatchEngine(m, params, num_blocks=24, block_size=8,
                                max_batch=4, max_blocks_per_seq=8,
                                max_new_tokens=12, decode_horizon=3,
                                dtype=jnp.float32, kv_backend=backend)
    free0 = eng.kv.num_free()

    shared = list(rng.integers(1, 96, size=11))  # radix-shareable prefix
    reqs = {}
    for i in range(14):
        if rng.random() < 0.4:
            prompt = shared + list(rng.integers(1, 96,
                                                size=rng.integers(1, 9)))
        else:
            prompt = list(rng.integers(1, 96, size=rng.integers(2, 28)))
        kw, kind = {}, "plain"
        r = rng.random()
        if r < 0.2:
            kw = dict(max_new_tokens=int(rng.integers(1, 12)))
        elif r < 0.35:
            kw = dict(stop=[[int(t)] for t in rng.integers(1, 96, size=2)])
            kind = "stop"
        elif r < 0.5:
            kw = dict(frequency_penalty=5.0)
            kind = "penalty"
        elif r < 0.62:
            kw = dict(repetition_penalty=2.0)
            kind = "penalty"
        elif r < 0.74:
            kw = dict(logit_bias={int(rng.integers(1, 96)): 8.0},
                      min_tokens=int(rng.integers(0, 4)))
            kind = "bias"
        sid = eng.submit(prompt, **kw)
        reqs[sid] = (prompt, kind, kw)

    aborted = set()
    steps = 0
    while eng.waiting or eng.active or eng.needs_prefill:
        eng.step()
        steps += 1
        if steps % 3 == 0 and rng.random() < 0.5:
            # abort a random not-yet-finished request
            live = [s for s in reqs if s not in aborted
                    and s not in eng.finished]
            if live:
                victim = int(rng.choice(live))
                if eng.abort(victim):
                    aborted.add(victim)
        assert steps < 500, "scheduler failed to drain"

    out = {sid: s.tokens[s.prompt_len:] for sid, s in eng.finished.items()}
    for sid, (prompt, kind, kw) in reqs.items():
        if sid in aborted and sid not in out:
            continue          # aborted before finishing: must not surface
        assert sid in out, (sid, kind)
        toks = out[sid]
        limit = kw.get("max_new_tokens", 12)
        # stop-kind can LEGITIMATELY produce zero tokens: a first-token
        # stop match truncates to empty (vLLM exclusion semantics)
        floor = 0 if kind == "stop" else 1
        assert floor <= len(toks) <= limit, (sid, kind, toks)
        if kind == "plain" and "max_new_tokens" not in kw:
            dense = generate(m, params, jnp.asarray([prompt]),
                             max_new_tokens=12, use_cache=True)
            assert toks == np.asarray(dense)[0, len(prompt):].tolist(), \
                (sid, "preemption/radix corrupted a plain lane")
        if kind == "stop":
            for seq in kw["stop"]:
                assert toks[-len(seq):] != seq, "stop suffix not excluded"

    eng.finished.clear()
    assert eng.kv.num_free() == free0, "leaked blocks after full drain"
    mets = eng.metrics()
    assert mets["requests_submitted"] == 14
