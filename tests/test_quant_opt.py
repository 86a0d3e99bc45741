"""8-bit optimizer states (training/quant_opt.py — beyond reference):
blockwise int8 roundtrip, trajectory tracking vs fp32 AdamW, the ~4x
state-memory cut, weight-decay masking, and trainer integration."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

import vyomai_tpu as vt
from vyomai_tpu.ops.fused import cross_entropy
from vyomai_tpu.training import (adamw8bit, create_train_state,
                                 make_optimizer, make_train_step,
                                 optimizer_state_bytes)
from vyomai_tpu.training.quant_opt import (_dequantize_blockwise,
                                           _quantize_blockwise)

CFG = vt.EncoderConfig(hidden_size=64, num_attention_heads=4,
                       num_key_value_heads=2, num_hidden_layers=2,
                       vocab_size=128, max_position_embeddings=64,
                       intermediate_size=256, hidden_dropout_prob=0.0)


def test_blockwise_roundtrip():
    # per-block absmax linear quantization: <1% of the block max, exact 0s,
    # shape-preserving through pad/unpad
    for shape in [(300,), (64, 256), (2, 64, 100)]:
        x = jax.random.normal(jax.random.PRNGKey(0), shape) * \
            jnp.exp(jax.random.normal(jax.random.PRNGKey(1), shape))
        q, s = _quantize_blockwise(x)
        y = _dequantize_blockwise(q, s, shape)
        assert y.shape == x.shape
        err = jnp.abs(y - x).reshape(-1)
        blockmax = jnp.max(jnp.abs(x))
        assert float(err.max()) <= float(blockmax) / 127.0 + 1e-7
    z = jnp.zeros((512,))
    q, s = _quantize_blockwise(z)
    assert float(jnp.abs(_dequantize_blockwise(q, s, (512,))).max()) == 0.0


def test_tracks_fp32_adamw_trajectory():
    # noisy linear regression: after 60 steps the 8-bit loss must be within
    # a few percent of fp32 AdamW's (blockwise int8 + sqrt(v) storage keeps
    # the recurrence's signal; this is the paper's central claim)
    k = jax.random.PRNGKey(0)
    w_true = jax.random.normal(k, (256, 8))
    xs = jax.random.normal(jax.random.fold_in(k, 1), (128, 256))
    ys = xs @ w_true + 0.01 * jax.random.normal(jax.random.fold_in(k, 2),
                                                (128, 8))

    def loss(p):
        return jnp.mean((xs @ p["w"] - ys) ** 2)

    def run(opt, steps=60):
        p = {"w": jnp.zeros((256, 8))}
        s = opt.init(p)
        for _ in range(steps):
            g = jax.grad(loss)(p)
            u, s = opt.update(g, s, p)
            p = optax.apply_updates(p, u)
        return float(loss(p))

    l8 = run(adamw8bit(3e-2, min_size=1024))
    l32 = run(optax.adamw(3e-2))
    l0 = float(loss({"w": jnp.zeros((256, 8))}))
    assert l8 < 0.05 * l0, (l8, l0)                 # it actually trains
    assert l8 < l32 * 1.10 + 1e-6, (l8, l32)        # and tracks fp32


def test_state_memory_cut():
    # big leaves: int8 q + f32 scale per 256 block ≈ 2.03 B/param for each
    # moment vs fp32 AdamW's 4 — whole-state ratio ≈ 3.9x
    params = {"k1": jnp.zeros((1024, 1024)), "k2": jnp.zeros((2048, 512)),
              "bias": jnp.zeros((64,))}
    n = sum(p.size for p in jax.tree_util.tree_leaves(params))
    s8 = adamw8bit(1e-3).init(params)
    s32 = optax.adamw(1e-3).init(params)
    b8, b32 = optimizer_state_bytes(s8), optimizer_state_bytes(s32)
    assert b8 < 0.28 * b32, (b8, b32)
    assert b8 < 2.1 * n + 1024, (b8, n)             # ~2.03 B/param total
    # small leaves keep fp32 moments
    assert s8.mu["bias"].dtype == jnp.float32


def test_weight_decay_mask():
    params = {"kernel": jnp.ones((8, 8)) * 2.0, "bias": jnp.ones((8,)) * 2.0}
    opt = adamw8bit(1e-2, weight_decay=0.1, min_size=1,
                    mask={"kernel": True, "bias": False})
    s = opt.init(params)
    g = jax.tree_util.tree_map(jnp.zeros_like, params)
    u, _ = opt.update(g, s, params)
    # zero grad: the only update is -lr * wd * p on decayed leaves
    np.testing.assert_allclose(np.asarray(u["kernel"]), -1e-2 * 0.1 * 2.0,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(u["bias"]), 0.0, atol=1e-8)


def test_trains_decoder_like_adamw():
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

    l8 = run(make_optimizer(1e-3, kind="adamw8bit"))
    l32 = run(make_optimizer(1e-3, kind="adamw"))
    l0 = float(loss_fn(params, batch, None)[0])
    assert l8 < 0.5 * l0, (l8, l0)
    assert l8 < l32 * 1.15, (l8, l32)


def test_schedule_and_jit():
    # callable learning rate + jitted update path (the trainer always jits)
    sched = optax.linear_schedule(1e-3, 1e-4, 10)
    opt = adamw8bit(sched, min_size=1)
    params = {"w": jnp.ones((300,))}
    s = opt.init(params)

    @jax.jit
    def step(p, s):
        u, s2 = opt.update({"w": jnp.ones((300,)) * 0.5}, s, p)
        return optax.apply_updates(p, u), s2

    p, s = step(params, s)
    p, s = step(p, s)
    assert int(s.count) == 2
    assert np.isfinite(np.asarray(p["w"])).all()


def test_schedule_evaluates_at_pre_increment_count():
    # optax convention: the first step sees schedule(0) (scale_by_schedule
    # evaluates at the PRE-increment count) — a warmup ramp starting at 0
    # must produce a ZERO first update, so swapping kind="adamw" for
    # "adamw8bit" cannot shift the whole LR trajectory by one step.
    sched = optax.linear_schedule(0.0, 1e-3, 5)
    opt = adamw8bit(sched, min_size=1)
    params = {"w": jnp.ones((300,))}
    s = opt.init(params)
    u, s = opt.update({"w": jnp.ones((300,)) * 0.5}, s, params)
    assert float(jnp.abs(u["w"]).max()) == 0.0
    # second step sees schedule(1) != 0
    u, s = opt.update({"w": jnp.ones((300,)) * 0.5}, s, params)
    assert float(jnp.abs(u["w"]).max()) > 0.0
