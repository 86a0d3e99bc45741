"""Production-shape MFU benchmark (VERDICT r2 #6 follow-through).

``bench.py``'s 200M tracked model is SHAPE-limited to ~44% MFU: its K=1024
attention projections sustain only 38% of peak on this chip's MXU, and the
bench note documents a ~61% zero-overhead bound at those shapes. This
benchmark measures the SAME fused training path (Pallas flash attention +
chunked lm-head CE + per-layer remat) at production shapes — hidden 4096,
where pure matmul chains sustain 78-85% of peak — to show the framework's
training step is compiler/kernel-limited, not framework-limited, once the
model gives the MXU real tiles.

~1.0B-param GPT-style decoder (4 layers x 4096 hidden, GQA 32/8 heads,
32k vocab), B=4 x S=2048. Adam states (fp32 m+v ~8 GB) + bf16 params/grads
(~4 GB) fit the 16 GB chip only with remat + chunked CE — the naive path
is not measurable here (full [B,S,V] fp32 logits alone are 1 GB and the
unrematerialized activations blow HBM), which is itself the point of the
fused path (reference N1/N2 fused-kernel claims, README.md:13-17).

Prints one JSON line: {"metric": "train_mfu_wide", ...}.
"""

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
from vyomai_tpu.ops.fused import lm_head_ce_loss
from vyomai_tpu.training import (create_train_state, make_optimizer,
                                 make_train_step)

V5E_PEAK_BF16 = 197e12

CFG = vt.EncoderConfig(
    hidden_size=4096, num_attention_heads=32, num_key_value_heads=8,
    num_hidden_layers=4, vocab_size=32768, max_position_embeddings=2048,
    intermediate_size=16384, hidden_dropout_prob=0.0)
BATCH, SEQ = 4, 2048
STEPS = 10


def _build(optimizer: str = "adamw", remat="full"):
    set_sdpa_impl("flash")
    model = vt.DecoderModel(CFG, pos_embedding_type="rope",
                            attention_type="gqa",
                            remat=True if remat == "full" else remat)
    params = model.init(jax.random.PRNGKey(0), dtype=jnp.bfloat16)

    def loss_fn(p, batch, rng):
        out = model.apply(p, batch["ids"], batch["mask"])
        h = cnn.linear(p["lm_head"]["dense"], out.hidden_state)
        h = cnn.layer_norm(p["lm_head"]["layer_norm"], cnn.gelu(h),
                           eps=getattr(CFG, "layer_norm_eps", 1e-6))
        loss = lm_head_ce_loss(
            h, p["lm_head"]["decoder"]["kernel"],
            p["lm_head"]["decoder"]["bias"], batch["ids"], shift=True,
            chunk_size=2048)
        return loss, {}

    opt = make_optimizer(1e-4, kind=optimizer)
    step = make_train_step(loss_fn, opt)
    state = create_train_state(params, opt)
    n_params = sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
    return step, state, n_params


def bench_mfu_wide(batch: int = BATCH, optimizer: str = "adamw",
                   remat: str = "full") -> dict:
    step, state, n_params = _build(optimizer, remat)
    ids = jax.random.randint(jax.random.PRNGKey(1), (batch, SEQ), 0,
                             CFG.vocab_size, dtype=jnp.int32)
    data = {"ids": ids, "mask": jnp.ones_like(ids)}
    rng = jax.random.PRNGKey(2)
    state, m = step(state, data, rng)  # compile + warm
    float(m["loss"])  # host fetch = true sync on the remote-attached chip
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, m = step(state, data, rng)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / STEPS
    tok_s = batch * SEQ / dt
    # 6N matmul FLOPs per token + causal attention score/value fwd+bwd
    flops_tok = 6 * n_params + 12 * CFG.num_hidden_layers * SEQ * CFG.hidden_size
    mfu = flops_tok * tok_s / V5E_PEAK_BF16
    set_sdpa_impl("auto")
    return {"tokens_per_sec": round(tok_s, 1), "mfu": round(mfu, 4),
            "n_params": n_params, "batch": batch, "seq": SEQ,
            "optimizer": optimizer, "remat": remat,
            "layers": CFG.num_hidden_layers, "hidden": CFG.hidden_size}


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=BATCH)
    ap.add_argument("--optimizer", default="adamw",
                    help="adamw | adamw8bit (int8 moments cut the Adam "
                         "step's HBM traffic 4x and free ~6 GB at this "
                         "size) | muon")
    ap.add_argument("--remat", default="full", choices=["full", "dots"],
                    help="full = recompute every layer matmul in backward "
                         "(75%% delivered-MFU ceiling); dots = save matmul "
                         "outputs, recompute elementwise only")
    args = ap.parse_args()
    r = bench_mfu_wide(batch=args.batch, optimizer=args.optimizer,
                       remat=args.remat)
    print(json.dumps({"metric": "train_mfu_wide", **r}))
