"""Pipeline parallelism (GPipe schedule over a ``pp`` mesh axis).

The reference is DP-only (SURVEY §2.4); `parallel.pipeline` is a scaling
extension. Correctness bar: pipelined forward AND gradients equal the
sequential layer stack bit-for-bit on a virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from vyomai_tpu.parallel import pipeline_apply

D, L, B = 16, 8, 8


def _layers(key):
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.normal(kw, (L, D, D)) * 0.3,
        "b": jax.random.normal(kb, (L, D)) * 0.1,
    }


def _stage_fn(lp, h):
    def body(h, xs):
        w, b = xs
        return jnp.tanh(h @ w + b), None
    h, _ = jax.lax.scan(body, h, (lp["w"], lp["b"]))
    return h


def _pp_mesh(n):
    cpus = jax.devices("cpu")
    if len(cpus) < n:
        pytest.skip(f"need {n} cpu devices")
    return Mesh(np.asarray(cpus[:n]), ("pp",))


@pytest.mark.parametrize("n,m", [(4, 4), (2, 8), (4, 2)])
def test_pipeline_matches_sequential(n, m):
    mesh = _pp_mesh(n)
    params = _layers(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, D))
    # reference on the same (CPU) platform: under a TPU default backend the
    # bf16 MXU matmuls differ from the CPU-mesh pipeline at ~1e-2
    with jax.default_device(jax.devices("cpu")[0]):
        ref = _stage_fn(params, x)
    out = pipeline_apply(_stage_fn, params, x, mesh=mesh,
                         num_microbatches=m)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_pipeline_single_stage_degenerates():
    mesh = _pp_mesh(1)
    params = _layers(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, D))
    out = pipeline_apply(_stage_fn, params, x, mesh=mesh, num_microbatches=2)
    with jax.default_device(jax.devices("cpu")[0]):
        ref = _stage_fn(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_pipeline_grads_match_sequential():
    """The backward pipeline falls out of autodiff (ppermute transposes to
    the reverse shift): parameter and input grads match the plain stack."""
    mesh = _pp_mesh(4)
    params = _layers(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, D))

    def loss_pipe(p, x):
        return jnp.sum(pipeline_apply(_stage_fn, p, x, mesh=mesh,
                                      num_microbatches=4) ** 2)

    def loss_seq(p, x):
        return jnp.sum(_stage_fn(p, x) ** 2)

    gp, gx = jax.grad(loss_pipe, argnums=(0, 1))(params, x)
    with jax.default_device(jax.devices("cpu")[0]):
        rp, rx = jax.grad(loss_seq, argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(rp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), atol=1e-5)


def test_pipeline_under_jit_with_decoder_layers():
    """Pipeline a real transformer layer stack: DecoderModel's layers split
    across stages, embedding/head outside (the standard placement)."""
    import vyomai_tpu as vt
    from vyomai_tpu.core import nn as cnn
    from vyomai_tpu.core.masks import bidirectional_mask
    from vyomai_tpu.layers import attention as attn
    from vyomai_tpu.layers import ffn as ffn_mod
    from vyomai_tpu.layers.attention import set_sdpa_impl

    cfg = vt.EncoderConfig(hidden_size=32, num_attention_heads=4,
                           num_hidden_layers=4, vocab_size=64,
                           max_position_embeddings=16, intermediate_size=64,
                           hidden_dropout_prob=0.0)
    model = vt.DecoderModel(cfg, pos_embedding_type="sinusoidal")
    params = model.init(jax.random.PRNGKey(0))
    mesh = _pp_mesh(2)
    ids = jnp.arange(8, dtype=jnp.int32).reshape(1, 8).repeat(4, axis=0)
    # batch-1 mask broadcasts over any microbatch size inside the pipeline
    mask = bidirectional_mask(jnp.ones((1, 8), jnp.int32))

    def stage_fn(lp, h):
        def body(h, layer_p):
            out, _ = attn.decoder_attention_apply(
                layer_p["attention"], h, mask, cfg, kind="mha", causal=True)
            return ffn_mod.ffn_apply(layer_p["ffn"], out, h, cfg), None
        h, _ = jax.lax.scan(body, h, lp)
        return h

    set_sdpa_impl("xla")
    try:
        emb = cnn.embedding(params["word_embeddings"], ids)
        emb = emb + model.sin_table[:, :8].astype(emb.dtype)
        with jax.default_device(jax.devices("cpu")[0]):
            ref = stage_fn(params["layers"], emb)
        out = jax.jit(lambda p, h: pipeline_apply(
            stage_fn, p, h, mesh=mesh, num_microbatches=2))(
                params["layers"], emb)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)
    finally:
        set_sdpa_impl("auto")
