"""Medusa self-speculative decoding (``layers.medusa`` +
``paged_model.medusa_horizon``, arXiv:2401.10774).

Core invariant (same as the draft-model and ngram flavors): greedy serving
output is TOKEN-EXACT vs the plain engine for ANY head weights — every
proposal is verified by the target's own argmax (the acceptance rule of
reference ``speculative_decoding.py:85-245`` with the drafter replaced by
the model's own trained heads). Head quality moves only the acceptance
rate."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vyomai_tpu as vt
from vyomai_tpu.layers.medusa import (medusa_init, medusa_hidden,
                                      medusa_propose)
from vyomai_tpu.training.losses import medusa_loss
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


@pytest.fixture(scope="module")
def heads(qwen):
    """Heads with a small random perturbation (zero-init would collapse
    every head to the lm_head — exercise distinct proposals per head)."""
    m = medusa_init(None, QCFG.hidden_size, 4)
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    return {
        "w1": m["w1"] + 0.05 * jax.random.normal(k1, m["w1"].shape),
        "b1": m["b1"] + 0.05 * jax.random.normal(k2, m["b1"].shape),
    }


def _run(model, params, prompts, **kw):
    kw.setdefault("dtype", jnp.float32)
    eng = ContinuousBatchEngine(model, params, num_blocks=64, block_size=8,
                                max_batch=4, max_new_tokens=12, **kw)
    sids = [eng.submit(p) for p in prompts]
    out = eng.run()
    return [out[s] for s in sids], eng


def test_zero_init_heads_equal_lm_head(qwen):
    """Zero-initialised heads pass the hidden state through unchanged, so
    every head's logits equal the base lm_head's (the paper's init
    property, obtained here by reusing lm_head as the vocab projection)."""
    model, params = qwen
    m = medusa_init(None, QCFG.hidden_size, 3)
    h = jax.random.normal(jax.random.PRNGKey(0), (2, 5, QCFG.hidden_size))
    hk = medusa_hidden(m, h)
    assert hk.shape == (2, 5, 3, QCFG.hidden_size)
    np.testing.assert_allclose(np.asarray(hk),
                               np.broadcast_to(np.asarray(h)[:, :, None],
                                               hk.shape))
    logits = medusa_propose(params, m, h)          # [2, 5, 3, V]
    base = np.asarray(h) @ np.asarray(
        params["embed_tokens"]["weight"]).T        # tied head
    np.testing.assert_allclose(np.asarray(logits[:, :, 1]), base, atol=1e-5)


def test_medusa_loss_trains_heads_only(qwen):
    """A few Adam steps on the HEADS ALONE reduce the per-offset CE on a
    deterministic batch; target params receive zero gradient (frozen)."""
    import optax
    model, params = qwen
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, QCFG.vocab_size, size=(2, 32)), jnp.int32)
    hidden = model.apply(params, ids).hidden_state
    m = medusa_init(None, QCFG.hidden_size, 3)

    def loss_fn(mp):
        return medusa_loss(params, mp, hidden, ids, chunk_size=64)

    opt = optax.adam(1e-2)
    st = opt.init(m)
    first = float(loss_fn(m))
    step = jax.jit(lambda mp, st_: (lambda g: opt.update(g, st_, mp))(
        jax.grad(loss_fn)(mp)))
    for _ in range(20):
        upd, st = step(m, st)
        m = optax.apply_updates(m, upd)
    assert float(loss_fn(m)) < first - 0.1
    # frozen target: grad of the joint loss w.r.t. params is exactly zero
    gp = jax.grad(lambda p: medusa_loss(p, m, hidden, ids, chunk_size=64))(
        params)
    assert all(float(jnp.abs(x).max()) == 0.0
               for x in jax.tree_util.tree_leaves(gp))


def test_medusa_loss_rejects_quantized_head(qwen):
    """Head training needs an fp vocab projection: int8- and int4-quantized
    param trees are rejected with the friendly error, not a KeyError."""
    model, params = qwen
    ids = jnp.asarray(np.random.default_rng(1).integers(
        0, QCFG.vocab_size, size=(1, 16)), jnp.int32)
    hidden = model.apply(params, ids).hidden_state
    m = medusa_init(None, QCFG.hidden_size, 2)
    for bits in (8, 4):
        qp = vt.quantize_params(params, bits=bits)
        with pytest.raises(ValueError, match="quantizing"):
            medusa_loss(qp, m, hidden, ids)


def test_medusa_engine_token_exact(qwen, heads):
    """Mixed prompts, multiple ticks: medusa engine greedy == plain engine
    greedy; the proposer runs (speculated > 0) without a draft model."""
    model, params = qwen
    ref, _ = _run(model, params, PROMPTS)
    got, eng = _run(model, params, PROMPTS,
                    medusa_params=heads, gamma=4, spec_rounds=2)
    assert got == ref
    assert eng.spec_stats["speculated"] > 0


def test_medusa_gamma_rounds_grid(qwen, heads):
    """Token-exactness across (gamma, rounds) shapes, incl. gamma < K and
    rounds=1 (bootstrap round only)."""
    model, params = qwen
    ref, _ = _run(model, params, PROMPTS)
    for gamma, rounds in [(1, 1), (2, 3), (4, 1)]:
        got, _ = _run(model, params, PROMPTS, medusa_params=heads,
                      gamma=gamma, spec_rounds=rounds)
        assert got == ref, (gamma, rounds)


def test_medusa_eos_finish(qwen, heads):
    """A sequence hitting EOS mid-round finishes exactly like the plain
    engine."""
    model, params = qwen
    ref, _ = _run(model, params, PROMPTS)
    eos = ref[1][4]  # a token the greedy continuation actually emits
    cfg = vt.QwenConfig(**{**QCFG.__dict__, "eos_token_id": int(eos)})
    m2 = vt.ModelForCausalLM(cfg)
    r2, _ = _run(m2, params, PROMPTS)
    g2, _ = _run(m2, params, PROMPTS, medusa_params=heads,
                 gamma=3, spec_rounds=2)
    assert g2 == r2
    assert any(t and t[-1] == eos for t in g2), "EOS must actually fire"


def test_medusa_int8_pool(qwen, heads):
    """Medusa speculation over an int8-quantized KV pool stays token-exact
    vs the plain engine on the same pool dtype."""
    model, params = qwen
    ref, _ = _run(model, params, PROMPTS, dtype=jnp.int8)
    got, _ = _run(model, params, PROMPTS, dtype=jnp.int8,
                  medusa_params=heads, gamma=4, spec_rounds=2)
    assert got == ref


def test_medusa_validation(qwen, heads):
    """gamma > K, second speculator, and the shared speculative
    incompatibilities are rejected up front."""
    model, params = qwen
    kw = dict(num_blocks=32, block_size=8, max_batch=2, max_new_tokens=4,
              dtype=jnp.float32)
    with pytest.raises(ValueError, match="heads"):
        ContinuousBatchEngine(model, params, medusa_params=heads,
                              gamma=8, **kw)
    with pytest.raises(ValueError, match="ONE speculator"):
        ContinuousBatchEngine(model, params, medusa_params=heads,
                              ngram_speculation=True, **kw)
    with pytest.raises(ValueError, match="greedy-only"):
        ContinuousBatchEngine(model, params, medusa_params=heads,
                              do_sample=True, **kw)
    eng = ContinuousBatchEngine(model, params, medusa_params=heads, **kw)
    with pytest.raises(ValueError, match="penalt"):
        eng.submit(PROMPTS[0], presence_penalty=0.5)


def test_medusa_pool_pressure_stress(qwen, heads):
    """Tiny pool + mixed prompt lengths + mid-flight aborts: spec-grant
    shrinking, plain-tick fallback, and preemption must keep every
    surviving lane token-exact vs the dense cached-greedy reference and
    leak no blocks."""
    from vyomai_tpu.generation import generate
    model, params = qwen
    rng = np.random.default_rng(3)
    eng = ContinuousBatchEngine(model, params, num_blocks=24, block_size=8,
                                max_batch=4, max_blocks_per_seq=8,
                                max_new_tokens=10, dtype=jnp.float32,
                                medusa_params=heads, gamma=3, spec_rounds=2)
    free0 = eng.kv.num_free()
    reqs = {}
    for _ in range(10):
        prompt = list(rng.integers(1, QCFG.vocab_size,
                                   size=rng.integers(2, 40)))
        reqs[eng.submit(prompt)] = prompt
    aborted = set()
    steps = 0
    while eng.waiting or eng.active or eng.needs_prefill:
        eng.step()
        steps += 1
        if steps % 4 == 0:
            live = [s for s in reqs if s not in aborted
                    and s not in eng.finished]
            if live:
                victim = int(rng.choice(live))
                if eng.abort(victim):
                    aborted.add(victim)
        assert steps < 400, "scheduler failed to drain"
    out = {sid: s.tokens[s.prompt_len:] for sid, s in eng.finished.items()}
    for sid, prompt in reqs.items():
        if sid not in out:
            continue  # aborted before finishing
        dense = generate(model, params, jnp.asarray([prompt]),
                         max_new_tokens=10, use_cache=True)
        assert out[sid] == np.asarray(dense)[0, len(prompt):].tolist(), sid
    eng.finished.clear()
    assert eng.kv.num_free() == free0, "leaked blocks after full drain"


def test_medusa_tp_matches_single_chip(qwen, heads):
    """Medusa heads are replicated; verification runs SPMD — greedy tokens
    match the single-chip medusa engine exactly."""
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
                                    medusa_params=heads, gamma=3,
                                    spec_rounds=2)
        sids = [eng.submit(p) for p in PROMPTS]
        out = eng.run()
        return [out[s] for s in sids]

    with jax.default_device(cpus[0]):
        single = run(None)
        mesh = Mesh(np.asarray(cpus[:2]).reshape(1, 2), ("data", "model"))
        assert run(mesh) == single
