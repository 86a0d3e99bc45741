"""Multi-LoRA serving: stacked per-adapter factors (embed_multi_lora),
the per-lane nn.lora_lanes context, and per-request lora_id in the
continuous-batching engine — multi-tenant adapter serving (S-LoRA style,
beyond the reference). Correctness bar: each guided lane is token-exact
vs a single-tenant engine running merge_adapters(params, that_adapter),
and base lanes are token-exact vs the plain engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vyomai_tpu as vt
from vyomai_tpu.core import nn as cnn
from vyomai_tpu.layers.adapters import (embed_multi_lora, inject_lora,
                                        merge_adapters)
from vyomai_tpu.serving import ContinuousBatchEngine

CFG = vt.QwenConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                    num_hidden_layers=2, num_attention_heads=2,
                    num_key_value_heads=2, head_dim=16,
                    max_position_embeddings=128, eos_token_id=None)


@pytest.fixture(scope="module")
def setup():
    m = vt.ModelForCausalLM(CFG)
    params = m.init(jax.random.PRNGKey(0), dtype=jnp.float32)
    adapters = []
    for i in range(2):
        ad = inject_lora(params, jax.random.PRNGKey(10 + i), rank=4,
                         alpha=2.0)
        # inject_lora zeros lora_b (delta starts at 0): randomize so the
        # adapters actually CHANGE the model
        ad["tree"] = jax.tree_util.tree_map(
            lambda x: (jax.random.normal(
                jax.random.fold_in(jax.random.PRNGKey(77 + i), x.size),
                x.shape) * 0.05).astype(x.dtype),
            ad["tree"])
        adapters.append(ad)
    return m, params, adapters


def test_embed_multi_lora_shapes(setup):
    _, params, adapters = setup
    multi = embed_multi_lora(params, adapters)
    node = multi["layers"]["self_attn"]["q_proj"]
    L = CFG.num_hidden_layers
    # adapter axis AFTER the stacked-layer axis (lax.scan slices axis 0)
    assert node["mlora_a"].shape == (L, 2, CFG.hidden_size, 4)
    assert node["mlora_b"].shape[1] == 2
    # base kernels untouched
    np.testing.assert_array_equal(
        node["kernel"], params["layers"]["self_attn"]["q_proj"]["kernel"])


def test_lora_lanes_linear_math(setup):
    """nn.linear under the lane context == per-lane manual LoRA math."""
    _, params, adapters = setup
    multi = embed_multi_lora(params, adapters)
    node = jax.tree_util.tree_map(
        lambda x: x[0], multi["layers"]["self_attn"]["q_proj"])  # layer 0
    base = jax.tree_util.tree_map(
        lambda x: x[0], params["layers"]["self_attn"]["q_proj"])
    x = jax.random.normal(jax.random.PRNGKey(3), (3, CFG.hidden_size))
    lanes = jnp.array([0, -1, 1], dtype=jnp.int32)
    with cnn.lora_lanes(lanes):
        got = cnn.linear(node, x)
    y0 = cnn.linear(base, x)
    for row, lane in enumerate(lanes):
        if lane < 0:
            np.testing.assert_allclose(got[row], y0[row], rtol=1e-6)
        else:
            ad = jax.tree_util.tree_map(
                lambda t: t[0],
                adapters[int(lane)]["tree"]["layers"]["self_attn"]["q_proj"])
            want = y0[row] + 2.0 * (x[row] @ ad["lora_a"]) @ ad["lora_b"]
            np.testing.assert_allclose(got[row], want, rtol=2e-5, atol=1e-5)


def test_multilora_params_without_context_raise(setup):
    _, params, adapters = setup
    multi = embed_multi_lora(params, adapters)
    node = jax.tree_util.tree_map(
        lambda x: x[0], multi["layers"]["self_attn"]["q_proj"])
    with pytest.raises(RuntimeError):
        cnn.linear(node, jnp.ones((2, CFG.hidden_size)))


def test_engine_multilora_token_exact(setup):
    """Every lane in one multi-tenant batch matches its single-tenant
    reference engine (greedy argmax tolerance: merged-kernel vs two-path
    LoRA differ only in fp summation order)."""
    m, params, adapters = setup
    prompts = [[3, 17, 42, 9], [5, 2], [11, 4, 8]]
    ref = {}
    for tag, p in [("base", params),
                   ("ad0", merge_adapters(params, adapters[0])),
                   ("ad1", merge_adapters(params, adapters[1]))]:
        eng = ContinuousBatchEngine(m, p, num_blocks=64, block_size=8,
                                    max_batch=4, max_new_tokens=10,
                                    dtype=jnp.float32)
        sids = [eng.submit(pr) for pr in prompts]
        out = eng.run()
        ref[tag] = [out[s] for s in sids]

    eng = ContinuousBatchEngine(m, params, num_blocks=64, block_size=8,
                                max_batch=4, max_new_tokens=10,
                                dtype=jnp.float32, loras=adapters)
    s0 = eng.submit(prompts[0], lora_id=0)
    s_base = eng.submit(prompts[1])
    s1 = eng.submit(prompts[2], lora_id=1)
    out = eng.run()
    assert out[s_base] == ref["base"][1]
    assert out[s0] == ref["ad0"][0]
    assert out[s1] == ref["ad1"][2]
    # the three references disagree (the adapters actually do something)
    assert not (ref["base"][0] == ref["ad0"][0] == ref["ad1"][0])


def test_engine_multilora_prefix_isolation(setup):
    """Same prompt under different adapters must NOT share radix-cached
    prefixes (adapter KV differs); same adapter twice MAY share."""
    m, params, adapters = setup
    prompt = list(range(1, 20))  # > 2 blocks at block_size 8
    eng = ContinuousBatchEngine(m, params, num_blocks=64, block_size=8,
                                max_batch=2, max_new_tokens=6,
                                dtype=jnp.float32, loras=adapters,
                                kv_backend="python")
    sid_a = eng.submit(prompt, lora_id=0)
    out_a = eng.run()[sid_a]
    # second submit with the OTHER adapter: a shared prefix would reuse
    # adapter-0 KV and corrupt the output vs a fresh engine
    sid_b = eng.submit(prompt, lora_id=1)
    out_b = eng.run()[sid_b]
    fresh = ContinuousBatchEngine(m, params, num_blocks=64, block_size=8,
                                  max_batch=2, max_new_tokens=6,
                                  dtype=jnp.float32, loras=adapters)
    fid = fresh.submit(prompt, lora_id=1)
    assert out_b == fresh.run()[fid]
    # and same-adapter resubmission (cache hit path) is also token-exact
    sid_c = eng.submit(prompt, lora_id=0)
    assert eng.run()[sid_c] == out_a


def test_engine_multilora_validation(setup):
    m, params, adapters = setup
    eng = ContinuousBatchEngine(m, params, num_blocks=32, block_size=8,
                                max_batch=2, dtype=jnp.float32,
                                loras=adapters)
    with pytest.raises(ValueError):
        eng.submit([1, 2], lora_id=5)
    plain = ContinuousBatchEngine(m, params, num_blocks=32, block_size=8,
                                  max_batch=2, dtype=jnp.float32)
    with pytest.raises(ValueError):
        plain.submit([1, 2], lora_id=0)
    with pytest.raises(ValueError):   # DoRA can't share one base matmul
        from vyomai_tpu.layers.adapters import inject_dora
        embed_multi_lora(params, [inject_dora(params,
                                              jax.random.PRNGKey(0))])


def test_engine_multilora_tp_matches_single_chip(setup):
    """Multi-LoRA composes with tensor-parallel serving: replicated stacked
    factors + Megatron-sharded base on a (1, 2) virtual CPU mesh emit
    exactly the single-chip multi-tenant tokens."""
    from jax.sharding import Mesh
    cpus = jax.devices("cpu")
    if len(cpus) < 2:
        pytest.skip("needs 2 virtual CPU devices")
    m, params, adapters = setup
    prompts = [[3, 17, 42, 9], [5, 11, 2]]

    def run(mesh):
        eng = ContinuousBatchEngine(m, params, num_blocks=64, block_size=8,
                                    max_batch=2, max_blocks_per_seq=8,
                                    max_new_tokens=6, dtype=jnp.float32,
                                    prefill_buckets=(8, 16), mesh=mesh,
                                    loras=adapters)
        sids = [eng.submit(prompts[0], lora_id=1), eng.submit(prompts[1])]
        out = eng.run()
        return [out[s] for s in sids]

    with jax.default_device(cpus[0]):
        single = run(None)
        mesh = Mesh(np.asarray(cpus[:2]).reshape(1, 2), ("data", "model"))
        assert run(mesh) == single


def test_engine_score_with_adapter(setup):
    """score(lora_id=i) == dense scoring under merge_adapters(params, i)."""
    m, params, adapters = setup
    eng = ContinuousBatchEngine(m, params, num_blocks=32, block_size=8,
                                max_batch=2, dtype=jnp.float32,
                                prefill_buckets=(8, 16), loras=adapters)
    prompt = [3, 17, 42, 9, 5]
    lps = eng.score(prompt, lora_id=1)
    merged = merge_adapters(params, adapters[1])
    logits = m.apply(merged, jnp.asarray([prompt])).logits[0]
    dist = np.asarray(jax.nn.log_softmax(logits.astype(np.float32), -1))
    for i in range(4):
        assert abs(lps[i] - dist[i, prompt[i + 1]]) < 1e-3
    # base scoring differs from adapter scoring
    assert not np.allclose(eng.score(prompt), lps, atol=1e-3)
