"""Wide-model (1.0B) train-step MFU ATTRIBUTION (VERDICT r3 #3).

mfu_wide sits at 54% against the chip's measured 72-85% on its dominant
matmul shapes; this bench attributes every lost point to a measured cost
instead of leaving the gap unexplained. Methodology: time nested slices of
the step as chained/pipelined dispatches with a single host-fetch sync
(the repo-standard pattern — block_until_ready lies on this rig):

  fwd_loss        forward + chunked lm-head CE only
  fwd_bwd         value_and_grad of the same (no optimizer)
  full_step       fwd_bwd + adamw update (the mfu_wide measurement)
  flash_fb        flash attention fwd+bwd alone at the model's shapes
  matmul_fb       pure ffn+proj matmul chain fwd+bwd (shape ceiling)
  optimizer       full_step - fwd_bwd (adam moment traffic)
  remat_tax       fwd_bwd(full remat) - fwd_bwd(dots remat)

Derived: a table of seconds + % of step + the delivered-FLOPs rate of
each slice. The headline question it answers: how much of the 46-point
gap is (a) remat recompute, (b) optimizer HBM traffic, (c) attention,
(d) everything else (norms/residuals/layout).

Run: python benchmarks/mfu_profile.py [--batch 4] [--remat full|dots]
"""

import argparse
import json
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import jax.numpy as jnp

import vyomai_tpu as vt
from vyomai_tpu.core import nn as cnn
from vyomai_tpu.layers.attention import set_sdpa_impl
from vyomai_tpu.ops import flash_attention as fa
from vyomai_tpu.ops.fused import lm_head_ce_loss
from vyomai_tpu.training import (create_train_state, make_optimizer,
                                 make_train_step)

V5E_PEAK_BF16 = 197e12

CFG = vt.EncoderConfig(
    hidden_size=4096, num_attention_heads=32, num_key_value_heads=8,
    num_hidden_layers=4, vocab_size=32768, max_position_embeddings=2048,
    intermediate_size=16384, hidden_dropout_prob=0.0)
BATCH, SEQ = 4, 2048
STEPS = 8


def _sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    jnp.asarray(leaf).ravel()[0].item()   # host fetch = true barrier


def _time(fn, *args, steps=STEPS):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / steps


def profile(batch=BATCH, remat="full"):
    set_sdpa_impl("flash")
    model = vt.DecoderModel(CFG, pos_embedding_type="rope",
                            attention_type="gqa",
                            remat=True if remat == "full" else remat)
    params = model.init(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    n_params = sum(int(x.size) for x in jax.tree_util.tree_leaves(params))

    ids = jax.random.randint(jax.random.PRNGKey(1), (batch, SEQ), 0,
                             CFG.vocab_size, dtype=jnp.int32)
    mask = jnp.ones_like(ids)
    rng = jax.random.PRNGKey(2)

    def loss_fn(p, batch_, rng_):
        out = model.apply(p, batch_["ids"], batch_["mask"])
        h = cnn.linear(p["lm_head"]["dense"], out.hidden_state)
        h = cnn.layer_norm(p["lm_head"]["layer_norm"], cnn.gelu(h),
                           eps=getattr(CFG, "layer_norm_eps", 1e-6))
        return lm_head_ce_loss(
            h, p["lm_head"]["decoder"]["kernel"],
            p["lm_head"]["decoder"]["bias"], batch_["ids"], shift=True,
            chunk_size=2048), {}

    data = {"ids": ids, "mask": mask}

    fwd = jax.jit(lambda p: loss_fn(p, data, rng)[0])
    fwd_bwd = jax.jit(lambda p: jax.grad(
        lambda q: loss_fn(q, data, rng)[0])(p))

    opt = make_optimizer(1e-4, kind="adamw")
    step = make_train_step(loss_fn, opt)
    # the step donates its state (params included) — give it a COPY so
    # the fwd/fwd_bwd measurements' params survive the donation
    state = create_train_state(
        jax.tree_util.tree_map(jnp.copy, params), opt)

    # flash fwd+bwd at the model's exact shapes
    hd = CFG.hidden_size // CFG.num_attention_heads
    q = jax.random.normal(jax.random.PRNGKey(3),
                          (batch, CFG.num_attention_heads, SEQ, hd),
                          jnp.bfloat16)
    kv = jax.random.normal(jax.random.PRNGKey(4),
                           (batch, CFG.num_key_value_heads, SEQ, hd),
                           jnp.bfloat16)
    flash_fb = jax.jit(jax.grad(
        lambda q, k, v: jnp.sum(
            fa.flash_attention(q, k, v, causal=True).astype(jnp.float32)),
        argnums=(0, 1, 2)))

    # pure matmul fwd+bwd at the layer's ffn+proj shapes (per-layer chain
    # of every big dense in the model, x n_layers inside one jit)
    H, F = CFG.hidden_size, CFG.intermediate_size
    kvh = CFG.num_key_value_heads * hd
    keys = jax.random.split(jax.random.PRNGKey(5), 6)
    Ws = [jax.random.normal(keys[0], (H, H), jnp.bfloat16) * H ** -0.5,
          jax.random.normal(keys[1], (H, kvh), jnp.bfloat16) * H ** -0.5,
          jax.random.normal(keys[2], (kvh, H), jnp.bfloat16) * kvh ** -0.5,
          jax.random.normal(keys[3], (H, H), jnp.bfloat16) * H ** -0.5,
          jax.random.normal(keys[4], (H, F), jnp.bfloat16) * H ** -0.5,
          jax.random.normal(keys[5], (F, H), jnp.bfloat16) * F ** -0.5]
    x0 = jax.random.normal(jax.random.PRNGKey(6), (batch * SEQ, H),
                           jnp.bfloat16)

    def mm_loss(ws):
        x = x0
        for _ in range(CFG.num_hidden_layers):
            for w in ws:
                x = x @ w
        return jnp.sum(x.astype(jnp.float32))

    matmul_fb = jax.jit(jax.grad(mm_loss))

    # the FULL step (params + grads + fp32 Adam moments ~12 GB) goes
    # FIRST with the state THREADED through (make_train_step donates
    # argnums 0 — reusing the same input state reads donated buffers and
    # the fetch dies with INVALID_ARGUMENT), then dropped (holding it
    # alongside the other measurement buffers OOMs the 16 GB chip)
    state, m = step(state, data, rng)
    _sync(m["loss"])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, m = step(state, data, rng)
    _sync(m["loss"])
    t_step = (time.perf_counter() - t0) / STEPS
    del state, m
    t_fwd = _time(fwd, params)
    t_fb = _time(fwd_bwd, params)
    t_flash = _time(lambda: flash_fb(q, kv, kv))
    t_mm = _time(lambda: matmul_fb(Ws))

    # remat tax: fwd_bwd under the other policy
    other = "dots" if remat == "full" else "full"
    model2 = vt.DecoderModel(CFG, pos_embedding_type="rope",
                             attention_type="gqa",
                             remat=True if other == "full" else other)

    def loss2(p):
        out = model2.apply(p, ids, mask)
        h = cnn.linear(p["lm_head"]["dense"], out.hidden_state)
        h = cnn.layer_norm(p["lm_head"]["layer_norm"], cnn.gelu(h),
                           eps=getattr(CFG, "layer_norm_eps", 1e-6))
        return lm_head_ce_loss(
            h, p["lm_head"]["decoder"]["kernel"],
            p["lm_head"]["decoder"]["bias"], ids, shift=True,
            chunk_size=2048)

    try:
        fb2 = jax.jit(jax.grad(loss2))
        t_fb_other = _time(fb2, params)
    except Exception as e:  # OOM etc — report and move on
        t_fb_other = None
        print(json.dumps({"note": f"remat={other} fwd_bwd failed: {e}"}))

    flops_tok = 6 * n_params + 12 * CFG.num_hidden_layers * SEQ * H
    tok = batch * SEQ
    mfu = flops_tok * tok / t_step / V5E_PEAK_BF16

    # matmul ceiling: same 3x-fwd FLOPs convention over the big denses
    mm_flops = 3 * 2 * tok * CFG.num_hidden_layers * sum(
        a.shape[0] * a.shape[1] for a in Ws)
    # flash: causal fwd+bwd delivered flops (fwd 2, bwd 5 matmuls of
    # 2*L^2/2*D each per head)
    fl_flops = 7 * batch * CFG.num_attention_heads * SEQ * SEQ * hd

    rows = {
        "full_step_s": round(t_step, 4),
        "fwd_loss_s": round(t_fwd, 4),
        "fwd_bwd_s": round(t_fb, 4),
        "optimizer_s": round(t_step - t_fb, 4),
        "flash_fb_s": round(t_flash, 4),
        "matmul_fb_s": round(t_mm, 4),
        (f"fwd_bwd_{other}_s"): (None if t_fb_other is None
                                 else round(t_fb_other, 4)),
        "optimizer_pct": round(100 * (t_step - t_fb) / t_step, 1),
        "matmul_ceiling_pct_peak": round(
            100 * mm_flops / t_mm / V5E_PEAK_BF16, 1),
        "flash_pct_peak": round(100 * fl_flops / t_flash / V5E_PEAK_BF16, 1),
        "mfu": round(mfu, 4),
        "tokens_per_sec": round(tok / t_step, 1),
        "remat": remat, "batch": batch, "n_params": n_params,
    }
    if t_fb_other is not None:
        rows["remat_tax_s"] = round(abs(t_fb - t_fb_other), 4)
    print(json.dumps({"metric": "mfu_profile", **rows}))
    set_sdpa_impl("auto")
    return rows


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=BATCH)
    ap.add_argument("--remat", default="full", choices=["full", "dots"])
    args = ap.parse_args()
    profile(batch=args.batch, remat=args.remat)
