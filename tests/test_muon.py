"""Muon optimizer (training/muon.py — beyond reference, see module
docstring): Newton-Schulz orthogonalization properties, the muon/adam
parameter split, and end-to-end training descent vs AdamW."""

import jax
import jax.numpy as jnp
import numpy as np

import vyomai_tpu as vt
from vyomai_tpu.ops.fused import cross_entropy
from vyomai_tpu.training import (create_train_state, make_optimizer,
                                 make_train_step, muon,
                                 newton_schulz_orthogonalize)
from vyomai_tpu.training.muon import _label_fn

CFG = vt.EncoderConfig(hidden_size=64, num_attention_heads=4,
                       num_key_value_heads=2, num_hidden_layers=2,
                       vocab_size=128, max_position_embeddings=64,
                       intermediate_size=256, hidden_dropout_prob=0.0)


def test_newton_schulz_orthogonalizes():
    # singular values of NS5(g) land in the quintic's convergence band
    # (~[0.7, 1.2] per the Muon writeup; bf16 iteration adds slack). A
    # SQUARE Gaussian's smallest singular value is ~0 (Marchenko-Pastur
    # lower edge), and five iterations can only amplify it so far — the
    # bound there checks amplification, not full convergence.
    for shape, smin in [((64, 96), 0.55), ((96, 64), 0.55),
                        ((128, 128), 0.1)]:
        g = jax.random.normal(jax.random.PRNGKey(0), shape)
        o = newton_schulz_orthogonalize(g, steps=5)
        assert o.shape == shape
        s = jnp.linalg.svd(o.astype(jnp.float32), compute_uv=False)
        assert float(s.max()) < 1.35, (shape, s.max())
        assert float(s.min()) > smin, (shape, s.min())
        # same descent direction half-space as the raw gradient
        assert float(jnp.sum(o.astype(jnp.float32) * g)) > 0


def test_newton_schulz_matches_svd_polar_factor():
    # for a well-conditioned matrix NS approximates U @ Vt of the SVD
    g = jax.random.normal(jax.random.PRNGKey(1), (32, 48))
    u, _, vt_ = jnp.linalg.svd(g, full_matrices=False)
    o = newton_schulz_orthogonalize(g, steps=10).astype(jnp.float32)
    # loose tol: the iteration runs in bf16 and targets ~[0.7, 1.2], not 1
    assert float(jnp.abs(o - u @ vt_).max()) < 0.35
    np.testing.assert_allclose(
        float(jnp.sum(o * (u @ vt_))) / (32 * 1.0),  # trace/rank ≈ 1
        1.0, atol=0.2)


def test_muon_label_split():
    params = {
        "embed_tokens": {"weight": jnp.zeros((128, 64))},
        "layers": {"ffn": {"kernel": jnp.zeros((2, 64, 256)),
                           "bias": jnp.zeros((2, 256))},
                   "norm": {"weight": jnp.zeros((64,))}},
        "lm_head": {"kernel": jnp.zeros((64, 128))},
    }
    labels = _label_fn(("lm_head",))(params)
    assert labels["layers"]["ffn"]["kernel"] == "muon"
    assert labels["layers"]["ffn"]["bias"] == "adam"
    assert labels["embed_tokens"]["weight"] == "adam"
    assert labels["lm_head"]["kernel"] == "adam"      # excluded by default
    assert labels["layers"]["norm"]["weight"] == "adam"


def test_muon_update_shapes_and_scale():
    opt = muon(0.02, adam_learning_rate=1e-3)
    params = {"blk": {"kernel": jnp.zeros((64, 256)),
                      "bias": jnp.zeros((256,))}}
    state = opt.init(params)
    grads = {"blk": {"kernel": jax.random.normal(jax.random.PRNGKey(2),
                                                 (64, 256)),
                     "bias": jnp.ones((256,))}}
    updates, state = opt.update(grads, state, params)
    assert updates["blk"]["kernel"].shape == (64, 256)
    # orthogonalized update RMS: ||O||_F = sqrt(min(m,n)) (singular values
    # ~1), times sqrt(out/in)=2 fan-out scale, times lr
    rms = float(jnp.sqrt(jnp.mean(jnp.square(
        updates["blk"]["kernel"].astype(jnp.float32)))))
    expect = 0.02 * 2.0 * np.sqrt(64.0 / (64 * 256))
    assert 0.5 * expect < rms < 1.5 * expect, (rms, expect)
    # adam branch first step is ~ -lr * sign(g)
    assert abs(float(updates["blk"]["bias"][0]) + 1e-3) < 3e-4


def test_muon_trains_decoder_at_least_as_fast_as_adamw():
    model = vt.DecoderModel(CFG, pos_embedding_type="rope")
    params = model.init(jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0, 128)
    batch = {"ids": ids}

    def loss_fn(p, b, rng):
        out = model.apply(p, b["ids"], jnp.ones_like(b["ids"]))
        return cross_entropy(out.logits[:, :-1], b["ids"][:, 1:]), {}

    def run(opt, steps=40):
        state = create_train_state(params, opt)
        step = make_train_step(loss_fn, opt, donate=False)
        rng = jax.random.PRNGKey(2)
        for i in range(steps):
            state, m = step(state, batch, jax.random.fold_in(rng, i))
        return float(m["loss"])

    # same AdamW LR on both sides' non-matrix branch so the comparison
    # isolates the matrix-kernel update rule (measured here: muon 1.96 vs
    # adamw 1.98 from l0=4.88 at 40 steps)
    l_muon = run(muon(0.02, adam_learning_rate=1e-3))
    l_adam = run(make_optimizer(1e-3, kind="adamw"))
    l0 = float(loss_fn(params, batch, None)[0])
    assert l_muon < 0.5 * l0                 # it actually trains
    assert l_muon < l_adam * 1.15            # and matches AdamW's pace


def test_muon_matches_unsharded_under_tp_mesh():
    # NS orthogonalization is pure matmuls, so GSPMD shards the optimizer
    # step like any other program: a TP-sharded muon update must equal the
    # single-device update (fp32 bitwise-close; bf16 NS is deterministic)
    import pytest
    from jax.sharding import NamedSharding, PartitionSpec as P
    from vyomai_tpu.parallel import create_mesh

    cpus = jax.devices("cpu")
    if len(cpus) < 8:
        pytest.skip("need 8 cpu devices")
    mesh = create_mesh((1, 8), devices=cpus[:8])

    params = {"blk": {"kernel": jax.random.normal(jax.random.PRNGKey(0),
                                                  (64, 256)) * 0.02,
                      "bias": jnp.zeros((256,))}}
    grads = {"blk": {"kernel": jax.random.normal(jax.random.PRNGKey(1),
                                                 (64, 256)),
                     "bias": jnp.ones((256,))}}
    opt = muon(0.02, adam_learning_rate=1e-3)

    def step(p, g):
        s = opt.init(p)
        u, _ = opt.update(g, s, p)
        import optax
        return optax.apply_updates(p, u)

    with jax.default_device(cpus[0]):
        ref = jax.jit(step)(params, grads)

    shard = NamedSharding(mesh, P(None, "model"))
    rep = NamedSharding(mesh, P())
    ps = {"blk": {"kernel": jax.device_put(params["blk"]["kernel"], shard),
                  "bias": jax.device_put(params["blk"]["bias"], rep)}}
    gs = {"blk": {"kernel": jax.device_put(grads["blk"]["kernel"], shard),
                  "bias": jax.device_put(grads["blk"]["bias"], rep)}}
    with mesh:
        out = jax.jit(step)(ps, gs)

    np.testing.assert_allclose(np.asarray(out["blk"]["kernel"]),
                               np.asarray(ref["blk"]["kernel"]),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["blk"]["bias"]),
                               np.asarray(ref["blk"]["bias"]),
                               atol=1e-7)
