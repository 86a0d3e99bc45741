"""Mixture-of-Experts FFN + expert parallelism (GShard-style dispatch).

Beyond-reference scaling extension (SURVEY §2.4: EP n/a in VyomAI)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

import vyomai_tpu as vt
from vyomai_tpu.core import nn as cnn
from vyomai_tpu.layers import moe

CFG = vt.EncoderConfig(hidden_size=32, intermediate_size=64,
                       num_attention_heads=4, vocab_size=64)


def test_single_expert_equals_plain_ffn():
    """E=1, top-1, ample capacity: MoE reduces to one dense FFN."""
    params = moe.moe_init(jax.random.PRNGKey(0), CFG, num_experts=1)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 32))
    # highest precision: on TPU the bf16 MXU rounds the dispatch einsums
    # and the plain matmul differently (~1e-2)
    with jax.default_matmul_precision("highest"):
        out, aux = moe.moe_apply(params, x, top_k=1, capacity_factor=2.0)
        ref = cnn.gelu(x @ params["w_in"][0] + params["b_in"][0]) @ \
            params["w_out"][0] + params["b_out"][0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    np.testing.assert_allclose(float(aux), 1.0, atol=1e-6)  # E * 1 * 1


def test_capacity_drops_overflow_tokens():
    """capacity_factor -> tiny: overflowing tokens contribute zero output."""
    params = moe.moe_init(jax.random.PRNGKey(0), CFG, num_experts=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 32))
    out, _ = moe.moe_apply(params, x, top_k=1, capacity_factor=0.01)
    # capacity 1 per expert: at most 2 tokens produce nonzero output
    nz = np.sum(np.abs(np.asarray(out[0])).sum(-1) > 1e-6)
    assert nz <= 2


def test_expert_parallel_matches_unsharded():
    cpus = jax.devices("cpu")
    if len(cpus) < 8:
        pytest.skip("need 8 cpu devices")
    mesh = Mesh(np.asarray(cpus[:8]), ("ep",))
    params = moe.moe_init(jax.random.PRNGKey(0), CFG, num_experts=8)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 32))
    with jax.default_device(cpus[0]):
        ref, ref_aux = moe.moe_apply(params, x, top_k=2)
    sharded = moe.shard_experts(params, mesh)
    out, aux = jax.jit(lambda p, x: moe.moe_apply(p, x, top_k=2))(sharded, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    np.testing.assert_allclose(float(aux), float(ref_aux), atol=1e-6)


def test_moe_grads_and_aux_loss():
    params = moe.moe_init(jax.random.PRNGKey(0), CFG, num_experts=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 32))

    def loss(p):
        out, aux = moe.moe_apply(p, x, top_k=2)
        return jnp.sum(out ** 2) + 0.01 * aux

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # router receives gradient (through combine weights and aux loss)
    assert float(jnp.abs(g["router"]["kernel"]).sum()) > 0


# ---------------------------------------------------------------------------
# MoE as a model capability: config-driven MoE MLP in the modern decoder
# (ModelForCausalLM), aux-loss threading, EP-sharded training
# ---------------------------------------------------------------------------

MOE_QCFG = vt.QwenConfig(vocab_size=256, hidden_size=64, intermediate_size=96,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2, head_dim=16,
                         max_position_embeddings=64, qk_norm=False,
                         num_experts=4, num_experts_per_tok=2)


def test_gated_single_expert_equals_swiglu():
    """E=1 gated MoE reduces to one dense SwiGLU MLP."""
    params = moe.moe_init(jax.random.PRNGKey(0), CFG, num_experts=1,
                          gated=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 32))
    with jax.default_matmul_precision("highest"):
        out, _ = moe.moe_apply(params, x, top_k=1, capacity_factor=None,
                               act="silu")
        ref = (jax.nn.silu(x @ params["w_gate"][0]) *
               (x @ params["w_in"][0])) @ params["w_out"][0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_dropless_routing_never_drops():
    """capacity_factor=None equals an over-provisioned capacity factor."""
    params = moe.moe_init(jax.random.PRNGKey(0), CFG, num_experts=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 32))
    a, _ = moe.moe_apply(params, x, top_k=2, capacity_factor=None)
    b, _ = moe.moe_apply(params, x, top_k=2, capacity_factor=100.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_moe_model_forward_aux_and_train_mode():
    model = vt.ModelForCausalLM(MOE_QCFG)
    params = model.init(jax.random.PRNGKey(0))
    assert "router" in params["layers"]["mlp"]
    assert "w_gate" in params["layers"]["mlp"]
    ids = jnp.arange(8, dtype=jnp.int32)[None] + 1
    out = model.apply(params, ids)
    assert out.logits.shape == (1, 8, 256)
    assert out.aux_loss is not None and np.isfinite(float(out.aux_loss))
    out_t = model.apply(params, ids, train=True)  # capacity dropping on
    assert np.isfinite(float(out_t.aux_loss))


def test_moe_model_cached_decode_parity():
    """Cached single-token decode is token-exact vs the full forward —
    inference routing is dropless, so capacity does not depend on the
    number of tokens in the call."""
    model = vt.ModelForCausalLM(MOE_QCFG)
    params = model.init(jax.random.PRNGKey(0))
    ids = jnp.arange(8, dtype=jnp.int32)[None] + 1
    full = model.apply(params, ids).logits
    cache = model.init_cache(batch_size=1, max_len=16)
    out = model.apply(params, ids[:, :4], cache=cache, start_pos=0)
    np.testing.assert_allclose(np.asarray(out.logits),
                               np.asarray(full[:, :4]), atol=1e-3)
    cache = out.kv_cache
    for t in range(4, 8):
        out = model.apply(params, ids[:, t:t + 1], cache=cache, start_pos=t)
        cache = out.kv_cache
        np.testing.assert_array_equal(
            np.asarray(jnp.argmax(out.logits[:, 0], -1)),
            np.asarray(jnp.argmax(full[:, t], -1)))


def test_moe_model_ep_train_step_parity():
    """One jitted train step on a (data, ep) mesh — experts sharded by the
    mesh rules, aux_loss in the metrics — matches the unsharded step."""
    from vyomai_tpu.ops.fused import cross_entropy
    from vyomai_tpu.parallel import shard_params
    from vyomai_tpu.training import (create_train_state, make_optimizer,
                                     make_train_step)
    cpus = jax.devices("cpu")
    if len(cpus) < 8:
        pytest.skip("need 8 cpu devices")
    mesh = Mesh(np.asarray(cpus[:8]).reshape(2, 4), ("data", "ep"))
    model = vt.ModelForCausalLM(MOE_QCFG)
    ids = jnp.tile(jnp.arange(8, dtype=jnp.int32)[None] + 1, (4, 1))

    def loss_fn(p, batch, rng):
        o = model.apply(p, batch["ids"], train=True)
        ce = cross_entropy(o.logits[:, :-1], batch["ids"][:, 1:])
        return (ce + MOE_QCFG.router_aux_loss_coef * o.aux_loss,
                {"aux_loss": o.aux_loss})

    opt = make_optimizer(1e-3)
    step = make_train_step(loss_fn, opt)
    batch = {"ids": ids}
    # pin the unsharded reference to the SAME (CPU) backend as the mesh —
    # cross-backend fp32 matmuls differ ~1e-3 (TPU MXU bf16 multiplies)
    with jax.default_device(cpus[0]):
        _, m0 = step(create_train_state(model.init(jax.random.PRNGKey(0)),
                                        opt), batch, jax.random.PRNGKey(1))
    sharded = shard_params(model.init(jax.random.PRNGKey(0)), mesh)
    assert sharded["layers"]["mlp"]["w_in"].sharding.spec == \
        jax.sharding.PartitionSpec(None, "ep", None, None)
    _, m1 = step(create_train_state(sharded, opt), batch, jax.random.PRNGKey(1))
    assert abs(float(m0["loss"]) - float(m1["loss"])) < 1e-4
    assert "aux_loss" in m1 and np.isfinite(float(m1["aux_loss"]))


# ---------------------------------------------------------------------------
# Ragged (sorted grouped-matmul / megablocks-style) dropless dispatch
# ---------------------------------------------------------------------------

def test_ragged_matches_einsum_dropless():
    """The sorted ragged_dot path computes the same routing as the dense
    dispatch einsums (both dropless) — gated and biased expert banks."""
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 32))
    for gated in (False, True):
        params = moe.moe_init(jax.random.PRNGKey(0), CFG, num_experts=4,
                              gated=gated)
        with jax.default_matmul_precision("highest"):
            ref, aux_e = moe.moe_apply(params, x, top_k=2,
                                       capacity_factor=None, act="silu")
            out, aux_r = moe.moe_apply(params, x, top_k=2,
                                       capacity_factor=None, act="silu",
                                       impl="ragged")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)
        np.testing.assert_allclose(float(aux_r), float(aux_e), atol=1e-6)


def test_ragged_rejects_capacity_dropping():
    params = moe.moe_init(jax.random.PRNGKey(0), CFG, num_experts=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 32))
    with pytest.raises(ValueError):
        moe.moe_apply(params, x, top_k=1, capacity_factor=1.0, impl="ragged")


def test_ragged_grads_match_einsum():
    params = moe.moe_init(jax.random.PRNGKey(0), CFG, num_experts=4,
                          gated=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 32))

    def loss(p, impl):
        out, aux = moe.moe_apply(p, x, top_k=2, capacity_factor=None,
                                 act="silu", impl=impl)
        return jnp.sum(out ** 2) + 0.01 * aux

    with jax.default_matmul_precision("highest"):
        ge = jax.grad(lambda p: loss(p, "einsum"))(params)
        gr = jax.grad(lambda p: loss(p, "ragged"))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4), ge, gr)


def test_ragged_int8_matches_einsum_int8():
    params = moe.moe_init(jax.random.PRNGKey(0), CFG, num_experts=4,
                          gated=True)
    qp = vt.quantize_params({"mlp": params})["mlp"]
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, CFG.hidden_size))
    with jax.default_matmul_precision("highest"):
        ref, _ = moe.moe_apply(qp, x, top_k=2, capacity_factor=None,
                               act="silu")
        out, _ = moe.moe_apply(qp, x, top_k=2, capacity_factor=None,
                               act="silu", impl="ragged")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_ragged_moe_model_decode_parity():
    """A ``moe_impl='ragged'`` MoE decoder keeps the cached-vs-full
    invariant, and its full-forward argmax matches the einsum-impl model
    (same params, different dispatch)."""
    cfg = MOE_QCFG.replace(moe_impl="ragged")
    model = vt.ModelForCausalLM(cfg)
    params = model.init(jax.random.PRNGKey(0))
    ids = jnp.arange(8, dtype=jnp.int32)[None] + 1
    full = model.apply(params, ids).logits
    ref = vt.ModelForCausalLM(MOE_QCFG).apply(params, ids).logits
    np.testing.assert_array_equal(
        np.asarray(jnp.argmax(full, -1)), np.asarray(jnp.argmax(ref, -1)))
    cache = model.init_cache(batch_size=1, max_len=16)
    out = model.apply(params, ids[:, :4], cache=cache, start_pos=0)
    cache = out.kv_cache
    for t in range(4, 8):
        out = model.apply(params, ids[:, t:t + 1], cache=cache, start_pos=t)
        cache = out.kv_cache
        np.testing.assert_array_equal(
            np.asarray(jnp.argmax(out.logits[:, 0], -1)),
            np.asarray(jnp.argmax(full[:, t], -1)))


# ---------------------------------------------------------------------------
# Int8-quantized expert banks (quant.quantize_params siblings)
# ---------------------------------------------------------------------------

def test_quantized_moe_structure_and_close_output():
    """quantize_params turns the expert banks int8 (router stays fp) and
    moe_apply dispatches on the siblings with a close output."""
    params = moe.moe_init(jax.random.PRNGKey(0), CFG, num_experts=4,
                          gated=True)
    qp = vt.quantize_params({"mlp": params})["mlp"]
    assert qp["w_in_q"].dtype == jnp.int8
    assert qp["w_in_scale"].shape == (4, CFG.intermediate_size)
    assert "w_gate_q" in qp and "w_out_q" in qp
    assert qp["router"]["kernel"].dtype == params["router"]["kernel"].dtype
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, CFG.hidden_size))
    ref, _ = moe.moe_apply(params, x, top_k=2, capacity_factor=None,
                           act="silu")
    out, _ = moe.moe_apply(qp, x, top_k=2, capacity_factor=None, act="silu")
    assert float(jnp.max(jnp.abs(out - ref))) < 0.05 * float(
        jnp.max(jnp.abs(ref)) + 1e-9)


def test_quantized_moe_model_decode_parity():
    """A quantized MoE decoder keeps the cached-vs-full invariant (the
    strong check: both paths use the SAME int8 tree, so they must agree
    exactly on argmax)."""
    model = vt.ModelForCausalLM(MOE_QCFG)
    params = vt.quantize_params(model.init(jax.random.PRNGKey(0)))
    mlp = params["layers"]["mlp"]
    assert mlp["w_in_q"].ndim == 4 and mlp["w_in_q"].dtype == jnp.int8
    assert mlp["w_in_scale"].ndim == 3          # [L, E, F]
    ids = jnp.arange(8, dtype=jnp.int32)[None] + 1
    full = model.apply(params, ids).logits
    cache = model.init_cache(batch_size=1, max_len=16)
    out = model.apply(params, ids[:, :4], cache=cache, start_pos=0)
    cache = out.kv_cache
    for t in range(4, 8):
        out = model.apply(params, ids[:, t:t + 1], cache=cache, start_pos=t)
        cache = out.kv_cache
        np.testing.assert_array_equal(
            np.asarray(jnp.argmax(out.logits[:, 0], -1)),
            np.asarray(jnp.argmax(full[:, t], -1)))


def test_quantized_moe_ep_sharding_specs():
    """Int8 expert banks shard over ep like their fp originals; scales
    follow the expert dim."""
    from jax.sharding import PartitionSpec as P
    from vyomai_tpu.parallel import param_pspec
    model = vt.ModelForCausalLM(MOE_QCFG)
    specs = param_pspec(vt.quantize_params(model.init(jax.random.PRNGKey(0))))
    mlp = specs["layers"]["mlp"]
    assert mlp["w_in_q"] == P(None, "ep", None, None)
    assert mlp["w_in_scale"] == P(None, "ep", None)
    assert mlp["router"]["kernel"] == P()
