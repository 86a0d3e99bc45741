"""ViT roofline attribution (VERDICT r3 #1 — the two-round ViT debt).

Measures WHERE the ViT-base forward's time goes on this chip, with the
chained-call + host-fetch-sync methodology every bench here uses (a single
dispatch through the tunnel measures dispatch, not execution — CLAUDE.md).

FLOPs convention (explicit, because it decides the verdict): 1 MAC =
2 FLOPs, the same convention as bench.py's 6N training rule and the chip's
197 TFLOP/s bf16 peak. ViT-base/16 at 224px is L=197, and per image:

  per layer:  qkv 2*L*768*2304   = 0.697 GF
              out 2*L*768*768    = 0.232 GF
              scores+PV 4*L^2*768 = 0.119 GF
              ffn 4*L*768*3072   = 1.859 GF   -> 2.908 GF/layer
  12 layers + patchify (2*196*768*768 = 0.231 GF)  ~= 35.1 GF/image

(The literature's "17.6 GFLOPs" for ViT-B/16 counts multiply-adds as ONE
op; using it against a 2-FLOPs/MAC peak undercounts MFU by exactly 2x.)
At r3's 2,320 img/s the forward therefore runs at ~81 TFLOP/s = 41% of
peak — not 21%.

Components are timed as CHAINS (output fed back as input, `reps` links in
one jit) so per-link execution dominates the ~1.1 ms dispatch overhead.

Run: python benchmarks/vit_profile.py [--batch 128] [--reps 12]
"""

import argparse
import functools
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
from vyomai_tpu.layers import attention as attn
from vyomai_tpu.layers import ffn as ffn_mod

V5E_PEAK_BF16 = 197e12
L = 197  # 14*14 patches + CLS


def _time_chain(fn, x, n_dispatch=8):
    """fn: jitted chain. Warm, sync, then n_dispatch pipelined calls and
    ONE host fetch (true barrier on the remote-attached chip)."""
    out = fn(x)
    jnp.asarray(out).ravel()[0].item()  # compile + sync
    t0 = time.perf_counter()
    for _ in range(n_dispatch):
        out = fn(out) if out.shape == x.shape else fn(x)
    jnp.asarray(out).ravel()[0].item()
    return (time.perf_counter() - t0) / n_dispatch


def profile(batch: int = 128, reps: int = 12):
    cfg = vt.VisionConfig(num_hidden_layers=12, hidden_dropout_prob=0.0)
    model = vt.Vit(cfg)
    params = model.init(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    H, F = cfg.hidden_size, cfg.intermediate_size
    layer0 = jax.tree_util.tree_map(lambda a: a[0], params["layers"])

    hid = jax.random.normal(jax.random.PRNGKey(1), (batch, L, H),
                            dtype=jnp.bfloat16)
    images = jax.random.normal(jax.random.PRNGKey(2), (batch, 3, 224, 224),
                               dtype=jnp.bfloat16)

    # --- component chains (reps links per dispatch) ----------------------
    @jax.jit
    def chain_ffn(h):
        for _ in range(reps):
            h = ffn_mod.ffn_apply(layer0["ffn"], h, h, cfg)
        return h

    @jax.jit
    def chain_attnblock(h):
        for _ in range(reps):
            h = attn.encoder_attention_apply(layer0["attention"], h, None,
                                             cfg, kind="vision")
        return h

    @jax.jit
    def chain_sdpa(q):
        for _ in range(reps):
            q = attn._sdpa_xla(q, q, q)
        return q

    @jax.jit
    def chain_proj(h):
        # exactly the layer's projection FLOPs: 768->2304 qkv, 768->768 out
        for _ in range(reps):
            qkv = cnn.linear(layer0["attention"]["qkv"], h)
            h = cnn.linear(layer0["attention"]["out"]["dense"],
                           qkv[..., :H])
        return h

    # variance-preserving scales so 12-link chains stay finite in bf16
    wk1 = jax.random.normal(jax.random.PRNGKey(3), (H, F),
                            jnp.bfloat16) * (H ** -0.5)
    wk2 = jax.random.normal(jax.random.PRNGKey(4), (F, H),
                            jnp.bfloat16) * (F ** -0.5)

    @jax.jit
    def chain_matmul_ffn(h):   # pure-matmul ceiling at the ffn shapes
        x = h.reshape(-1, H)
        for _ in range(reps):
            x = (x @ wk1) @ wk2
        return x.reshape(h.shape)

    @jax.jit
    def chain_patchify(im):
        # scalar data dependency between links defeats CSE of identical
        # pure calls without measurable extra work
        for _ in range(reps):
            h = model.patchify(params, im)
            im = im + h[0, 0, 0].astype(im.dtype) * 1e-3
        return h

    @jax.jit
    def full_fwd(im):
        return model.apply(params, im).logits

    q4 = jax.random.normal(jax.random.PRNGKey(5),
                           (batch, cfg.num_attention_heads, L,
                            H // cfg.num_attention_heads), jnp.bfloat16)

    f_qkv = 2 * L * H * 3 * H
    f_out = 2 * L * H * H
    f_attn = 4 * L * L * H
    f_ffn = 4 * L * H * F
    f_layer = f_qkv + f_out + f_attn + f_ffn
    f_patch = 2 * 196 * H * H
    f_image = 12 * f_layer + f_patch

    rows = []

    def rec(name, t_link, flops_link):
        rate = flops_link / t_link / 1e12
        rows.append({"component": name, "us_per_link": round(t_link * 1e6, 1),
                     "tflops": round(rate, 1),
                     "pct_peak": round(100 * rate * 1e12 / V5E_PEAK_BF16, 1)})

    t = _time_chain(chain_matmul_ffn, hid) / reps
    rec("matmul_ceiling_ffn_shapes", t, batch * f_ffn)
    t = _time_chain(chain_ffn, hid) / reps
    t_ffn = t
    rec("ffn_block(LN+gelu+resid)", t, batch * f_ffn)
    t = _time_chain(chain_proj, hid) / reps
    t_proj = t
    rec("qkv+out_proj", t, batch * (f_qkv + f_out))
    t = _time_chain(chain_sdpa, q4) / reps
    t_sdpa = t
    rec("sdpa_xla(scores+softmax+PV)", t, batch * f_attn)
    t = _time_chain(chain_attnblock, hid) / reps
    t_attnblk = t
    rec("attention_block_total", t, batch * (f_qkv + f_out + f_attn))
    t_patch = _time_chain(chain_patchify, images) / reps
    rec("patchify_conv", t_patch, batch * f_patch)

    t_full = _time_chain(full_fwd, images, n_dispatch=10)
    ips = batch / t_full
    mfu = f_image * ips / V5E_PEAK_BF16
    t_layers = 12 * (t_attnblk + t_ffn)
    rows.append({"component": "FULL_FORWARD",
                 "us_per_link": round(t_full * 1e6, 1),
                 "img_per_s": round(ips, 1), "mfu_pct": round(100 * mfu, 1),
                 "accounted_pct": round(
                     100 * (t_layers + t_patch) / t_full, 1)})
    for r in rows:
        print(json.dumps(r))
    print(json.dumps({
        "metric": "vit_attribution", "batch": batch,
        "flops_per_image_gf": round(f_image / 1e9, 2),
        "img_per_s": round(ips, 1), "mfu_pct": round(100 * mfu, 1),
        "time_share_pct": {
            "ffn": round(100 * 12 * t_ffn / t_full, 1),
            "attn_block": round(100 * 12 * t_attnblk / t_full, 1),
            "  of which sdpa": round(100 * 12 * t_sdpa / t_full, 1),
            "  of which proj": round(100 * 12 * t_proj / t_full, 1),
            "patchify": round(100 * t_patch / t_full, 1),
            "unaccounted(embed/scan/layout)": round(
                100 * (t_full - t_layers - t_patch) / t_full, 1)},
    }))
    return rows


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--reps", type=int, default=12)
    args = ap.parse_args()
    profile(batch=args.batch, reps=args.reps)
