"""Long-context single-chip training benchmark.

Trains a ~0.5B GPT-style decoder at S=8192 and S=16384 on ONE v5e chip
through the fused path (Pallas flash attention + per-layer remat + chunked
lm-head CE). This is a capability the reference's torch path does not have
at any speed: its SDPA/naive attention materializes the [B, H, S, S] score
tensor — at S=16384 that is 16 GB PER LAYER in bf16 (32 GB fp32 softmax) —
while the flash kernel's working set stays O(S · block) and remat bounds
activation residency to one layer (`/root/reference/Examples/
vyomai-fused-kernals-2t4.ipynb` tops out at S=1024 on 2xT4).

MFU here counts DELIVERED FLOPs: the causal attention term is
6*layers*S*hidden per token (the kernel skips above-diagonal blocks, so
the skipped half is not credited), unlike mfu_wide_bench's 12x convention
— at S<=2048 the attention term is noise, at 16k it is ~40% of the total,
so crediting skipped work would overstate MFU by ~25%.

Prints one JSON line: {"metric": "long_context_train", ...}.
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

# ~0.5B decoder: attention is ~40% of step FLOPs at S=16384 (vs ~3% at
# bench.py's S=1024), so this measures the flash kernel under load, not
# the projections around it
LAYERS, HIDDEN, HEADS, KV_HEADS, FFN = 8, 2048, 16, 4, 8192
VOCAB = 32768
SHAPES = ((2, 8192), (1, 16384))     # (batch, seq) — 16k tokens per step
STEPS = 6


def _build(max_len: int):
    set_sdpa_impl("flash")
    cfg = vt.EncoderConfig(
        hidden_size=HIDDEN, num_attention_heads=HEADS,
        num_key_value_heads=KV_HEADS, num_hidden_layers=LAYERS,
        vocab_size=VOCAB, max_position_embeddings=max_len,
        intermediate_size=FFN, hidden_dropout_prob=0.0)
    model = vt.DecoderModel(cfg, pos_embedding_type="rope",
                            attention_type="gqa", remat=True)
    params = model.init(jax.random.PRNGKey(0), dtype=jnp.bfloat16)

    def loss_fn(p, batch, rng):
        out = model.apply(p, batch["ids"], batch["mask"])
        h = cnn.linear(p["lm_head"]["dense"], out.hidden_state)
        h = cnn.layer_norm(p["lm_head"]["layer_norm"], cnn.gelu(h),
                           eps=getattr(cfg, "layer_norm_eps", 1e-6))
        loss = lm_head_ce_loss(
            h, p["lm_head"]["decoder"]["kernel"],
            p["lm_head"]["decoder"]["bias"], batch["ids"], shift=True,
            chunk_size=2048)
        return loss, {}

    opt = make_optimizer(1e-4)
    step = make_train_step(loss_fn, opt)
    state = create_train_state(params, opt)
    n_params = sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
    return step, state, n_params


def bench_long_context() -> dict:
    points = []
    n_params = None
    for batch_size, seq in SHAPES:
        step, state, n_params = _build(seq)
        ids = jax.random.randint(jax.random.PRNGKey(1), (batch_size, seq),
                                 0, VOCAB, dtype=jnp.int32)
        batch = {"ids": ids, "mask": jnp.ones_like(ids)}
        rng = jax.random.PRNGKey(2)
        print(f"compiling S={seq}...", flush=True)
        state, m = step(state, batch, rng)   # compile + warm
        float(m["loss"])                     # host fetch = true device sync
        t0 = time.perf_counter()
        for _ in range(STEPS):
            state, m = step(state, batch, rng)
        float(m["loss"])
        dt = (time.perf_counter() - t0) / STEPS
        tok_s = batch_size * seq / dt
        # delivered FLOPs/token: 6N matmul + causal-discounted attention
        flops_tok = 6 * n_params + 6 * LAYERS * seq * HIDDEN
        mfu = flops_tok * tok_s / V5E_PEAK_BF16
        points.append({"batch": batch_size, "seq": seq,
                       "tokens_per_sec": round(tok_s, 1),
                       "mfu": round(mfu, 4)})
        print(json.dumps(points[-1]), flush=True)
        del step, state
    set_sdpa_impl("auto")
    longest = points[-1]
    return {"tokens_per_sec": longest["tokens_per_sec"],
            "mfu": longest["mfu"], "seq": longest["seq"],
            "n_params": n_params, "points": points}


if __name__ == "__main__":
    r = bench_long_context()
    print(json.dumps({"metric": "long_context_train", **r}))
