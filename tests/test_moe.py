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
