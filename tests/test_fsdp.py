"""FSDP-style fully-sharded parameters (ZeRO-3 via GSPMD).

The reference is DDP-only (every rank holds full params); `fsdp_pspec`
shards each large weight over the data axis and lets GSPMD insert the
all-gather at use / reduce-scatter on grads. Correctness bar: the sharded
train step computes the same loss and the same (resharded) parameter
update as the unsharded one."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

import vyomai_tpu as vt
from vyomai_tpu.layers.attention import set_sdpa_impl
from vyomai_tpu.ops.fused import cross_entropy
from vyomai_tpu.parallel import create_mesh, fsdp_pspec, shard_params_fsdp
from vyomai_tpu.training import (create_train_state, make_optimizer,
                                 make_train_step)

CFG = vt.EncoderConfig(hidden_size=64, num_attention_heads=4,
                       num_key_value_heads=2, num_hidden_layers=2,
                       vocab_size=256, max_position_embeddings=64,
                       intermediate_size=128, hidden_dropout_prob=0.0)


def _mesh(n=8):
    cpus = jax.devices("cpu")
    if len(cpus) < n:
        pytest.skip(f"need {n} cpu devices")
    return create_mesh((n, 1), devices=cpus[:n])


def test_fsdp_specs_shard_large_weights_only():
    mesh = _mesh()
    model = vt.DecoderModel(CFG, pos_embedding_type="rope",
                            attention_type="gqa")
    with jax.default_device(jax.devices("cpu")[0]):
        params = model.init(jax.random.PRNGKey(0))
    specs = fsdp_pspec(params, mesh, min_weight_size=1024)
    # the embedding table is sharded over data; tiny norms stay replicated
    emb = specs["word_embeddings"]["weight"]
    assert "data" in tuple(emb)
    flat = jax.tree_util.tree_map(lambda x, s: (x.size, tuple(s)),
                                  params, specs)
    for size, spec in jax.tree_util.tree_leaves(
            flat, is_leaf=lambda x: isinstance(x, tuple) and len(x) == 2
            and isinstance(x[0], int)):
        if size < 1024:
            assert "data" not in spec


def test_fsdp_train_step_matches_unsharded():
    mesh = _mesh()
    cpu0 = jax.devices("cpu")[0]
    model = vt.DecoderModel(CFG, pos_embedding_type="rope",
                            attention_type="gqa")
    with jax.default_device(cpu0):
        params = model.init(jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0,
                                 CFG.vocab_size, dtype=jnp.int32)
    batch = {"ids": ids, "mask": jnp.ones_like(ids)}

    def loss_fn(p, b, rng):
        out = model.apply(p, b["ids"], b["mask"])
        return cross_entropy(out.logits[:, :-1], b["ids"][:, 1:]), {}

    opt = make_optimizer(1e-3)
    step = make_train_step(loss_fn, opt, donate=False)
    rng = jax.random.PRNGKey(2)

    set_sdpa_impl("xla")
    try:
        with jax.default_device(cpu0):
            ref_state = create_train_state(params, opt)
            ref_state, ref_m = step(ref_state, batch, rng)

        sharded = shard_params_fsdp(params, mesh, min_weight_size=1024)
        sh_batch = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P("data"))),
            batch)
        state = create_train_state(sharded, opt)
        state, m = step(state, sh_batch, rng)
    finally:
        set_sdpa_impl("auto")

    np.testing.assert_allclose(float(m["loss"]), float(ref_m["loss"]),
                               atol=1e-5)
    # reduce-scatter reduction order differs from the single-device sum;
    # Adam's g/sqrt(v) amplifies that near zero — 1e-4 bounds it
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(ref_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_sharded_checkpoint_restores_sharded(tmp_path):
    """Multi-chip resume: save an FSDP-sharded TrainState, restore with the
    sharded state as target — arrays come back with the SAME NamedSharding
    (each device reads its own shard slices; no full-array materialization)
    and bit-equal values, and a further train step runs on the restored
    state."""
    import os
    from vyomai_tpu.training import checkpoint as ckpt
    mesh = _mesh()
    cpu0 = jax.devices("cpu")[0]
    model = vt.DecoderModel(CFG, pos_embedding_type="rope",
                            attention_type="gqa")
    with jax.default_device(cpu0):
        params = model.init(jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0,
                                 CFG.vocab_size, dtype=jnp.int32)
    batch = {"ids": ids, "mask": jnp.ones_like(ids)}

    def loss_fn(p, b, rng):
        out = model.apply(p, b["ids"], b["mask"])
        return cross_entropy(out.logits[:, :-1], b["ids"][:, 1:]), {}

    opt = make_optimizer(1e-3)
    step = make_train_step(loss_fn, opt, donate=False)
    sharded = shard_params_fsdp(params, mesh, min_weight_size=1024)
    sh_batch = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("data"))), batch)
    state = create_train_state(sharded, opt)
    set_sdpa_impl("xla")
    try:
        state, _ = step(state, sh_batch, jax.random.PRNGKey(2))

        path = os.path.join(str(tmp_path), "sharded_ck")
        ckpt.save_checkpoint(path, state)
        back = ckpt.restore_checkpoint(path, target=state)

        for a, b in zip(jax.tree_util.tree_leaves(state),
                        jax.tree_util.tree_leaves(back)):
            if isinstance(b, jax.Array) and hasattr(a, "sharding"):
                assert b.sharding.is_equivalent_to(a.sharding, a.ndim), \
                    (a.sharding, b.sharding)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # resume: another step runs on the restored (sharded) state
        back, m = step(back, sh_batch, jax.random.PRNGKey(3))
        assert np.isfinite(float(m["loss"]))
    finally:
        set_sdpa_impl("auto")


def test_create_hybrid_mesh_single_slice_degrades():
    """Single-process default: dcn_shape all ones -> identical to a plain
    reshape mesh; sharding rules + a train-relevant device_put work on it
    (SURVEY §2.5 multi-slice plan, single-slice testable half)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from vyomai_tpu.parallel import create_hybrid_mesh
    cpus = jax.devices("cpu")
    if len(cpus) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    mesh = create_hybrid_mesh((4, 2), devices=cpus[:8])
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    x = jnp.zeros((8, 16))
    y = jax.device_put(x, NamedSharding(mesh, P("data", "model")))
    assert y.sharding.spec == P("data", "model")


def test_create_hybrid_mesh_explicit_dcn_product():
    """Explicit dcn_shape on one host: per-axis size is dcn * ici (the
    multi-slice data-stacking recipe), built via mesh_utils when the DCN
    factor is > 1."""
    from vyomai_tpu.parallel import create_hybrid_mesh
    cpus = jax.devices("cpu")
    if len(cpus) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    try:
        mesh = create_hybrid_mesh((2, 2), dcn_shape=(2, 1),
                                  devices=cpus[:8])
    except (ValueError, AssertionError) as e:
        pytest.skip(f"hybrid mesh needs real multi-granule topology: {e}")
    assert dict(mesh.shape) == {"data": 4, "model": 2}
