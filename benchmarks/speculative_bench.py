"""Speculative-decoding benchmark (VERDICT r1 #5 / BASELINE).

Measures on-chip speculative decoding (`speculative_generate_onchip`, one
jitted while_loop program) against the target model's own jitted greedy
decode, at Qwen-scale vocab (151,936) with a 2-layer drafter.

Acceptance realism: random-init models draft garbage (acceptance ~0), so
both models are first trained for a few hundred steps on a deterministic
synthetic next-token task (an LCG over a 499-token active vocab). That
drives both models to peaked, agreeing distributions — the high-acceptance
regime speculative decoding is designed for — while keeping the bench
self-contained. The reported acceptance rate is printed alongside the
speedup; the machinery cost (drafter steps + chunked target scoring +
device-side rejection sampling) is what's being measured.

Prints one human-readable block + one JSON line:
  {"speculative_tokens_per_sec": ..., "greedy_tokens_per_sec": ...,
   "speedup": ..., "acceptance": ..., "gamma": 4}
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
import numpy as np

import vyomai_tpu as vt
from vyomai_tpu.generation import GreedyProcessor, speculative_generate_onchip
from vyomai_tpu.ops.fused import lm_head_ce_loss
from vyomai_tpu.training import (create_train_state, make_optimizer,
                                 make_train_step)

VOCAB = 151_936          # Qwen2.5/Qwen3 vocab size
ACTIVE = 499             # active synthetic vocab (prime)
MAX_POS = 512

# ~0.9B-param target (speculative decoding's intended regime: a target big
# enough that one drafter step costs a small fraction of one target step)
TARGET_CFG = vt.EncoderConfig(
    hidden_size=1536, num_attention_heads=12, num_key_value_heads=4,
    num_hidden_layers=16, vocab_size=VOCAB, max_position_embeddings=MAX_POS,
    intermediate_size=6144, hidden_dropout_prob=0.0)
DRAFTER_CFG = vt.EncoderConfig(
    hidden_size=384, num_attention_heads=6, num_key_value_heads=2,
    num_hidden_layers=2, vocab_size=VOCAB, max_position_embeddings=MAX_POS,
    intermediate_size=1536, hidden_dropout_prob=0.0)


def synthetic_batch(rng: np.random.Generator, batch: int, seq: int):
    """x_{t+1} = (7 * x_t + 3) mod ACTIVE — deterministic, unigram-learnable."""
    x = np.empty((batch, seq), dtype=np.int32)
    x[:, 0] = rng.integers(0, ACTIVE, size=batch)
    for t in range(1, seq):
        x[:, t] = (7 * x[:, t - 1] + 3) % ACTIVE
    return jnp.asarray(x)


def train(model, cfg, steps: int, batch: int = 8, seq: int = 64,
          lr: float = 2e-3, warmup: int = 0, seed: int = 0):
    params = model.init(jax.random.PRNGKey(seed), dtype=jnp.bfloat16)

    def loss_fn(p, b, rng):
        out = model.apply(p, b["ids"], b["mask"])
        from vyomai_tpu.core import nn as cnn
        h = cnn.linear(p["lm_head"]["dense"], out.hidden_state)
        h = cnn.layer_norm(p["lm_head"]["layer_norm"], cnn.gelu(h),
                           eps=getattr(cfg, "layer_norm_eps", 1e-6))
        loss = lm_head_ce_loss(h, p["lm_head"]["decoder"]["kernel"],
                               p["lm_head"]["decoder"]["bias"], b["ids"],
                               shift=True, chunk_size=2048)
        return loss, {}

    opt = make_optimizer(lr, warmup_steps=warmup)
    step = make_train_step(loss_fn, opt)
    state = create_train_state(params, opt)
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    loss = None
    for _ in range(steps):
        ids = synthetic_batch(rng, batch, seq)
        state, m = step(state, {"ids": ids, "mask": jnp.ones_like(ids)}, key)
        loss = m["loss"]
    return state.params, float(loss)  # host fetch = true sync


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--gamma", type=int, default=4)
    ap.add_argument("--prompt", type=int, default=32)
    ap.add_argument("--new", type=int, default=256)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--int8", action="store_true",
                    help="quantize target+drafter weights (weight-only "
                         "int8) — speculation cuts target steps, int8 "
                         "halves the weight bytes each step streams, so "
                         "the wins compound")
    args = ap.parse_args()

    target = vt.DecoderModel(TARGET_CFG, pos_embedding_type="rope",
                             attention_type="gqa")
    drafter = vt.DecoderModel(DRAFTER_CFG, pos_embedding_type="rope",
                              attention_type="gqa")

    t0 = time.perf_counter()
    # the deep target needs the lower LR + warmup to converge
    t_params, t_loss = train(target, TARGET_CFG, args.steps, lr=3e-4,
                             warmup=100, seed=0)
    d_params, d_loss = train(drafter, DRAFTER_CFG, args.steps, lr=2e-3,
                             seed=1)
    print(f"[train] {args.steps} steps each: target loss {t_loss:.3f}, "
          f"drafter loss {d_loss:.3f} ({time.perf_counter() - t0:.0f}s)")

    bf16_t_params = t_params
    if args.int8:
        t_params = vt.quantize_params(t_params)
        d_params = vt.quantize_params(d_params)

    rng = np.random.default_rng(7)
    prompt = synthetic_batch(rng, 1, args.prompt)
    proc = GreedyProcessor()

    # -- greedy baseline: the target's own jitted while_loop decode
    def greedy(p=None):
        out = target.generate(t_params if p is None else p, prompt,
                              max_len=args.new, use_cache=True)
        np.asarray(out)  # true sync (block_until_ready doesn't wait)
        return out

    def time_greedy(p=None):
        t0 = time.perf_counter()
        for _ in range(args.repeats):
            greedy(p)
        return args.new * args.repeats / (time.perf_counter() - t0)

    # -- on-chip speculative decode
    def spec():
        toks, acc = speculative_generate_onchip(
            prompt, drafter, d_params, target, t_params, gamma=args.gamma,
            logits_processor=proc, max_gen_len=args.new,
            eos_tokens_id=VOCAB - 1, pad_token_id=0,
            cache_dtype=jnp.bfloat16)
        return toks, acc

    greedy()
    spec()  # compile + warm both paths before any timing
    # interleave greedy measurements around the speculative one: per-run
    # chip throughput drifts ~15%, so a single greedy sample skews the ratio
    g1 = time_greedy()
    t0 = time.perf_counter()
    n_tok = 0
    acc = 0.0
    for _ in range(args.repeats):
        toks, acc = spec()
        n_tok += len(toks)
    spec_tps = n_tok / (time.perf_counter() - t0)
    g2 = time_greedy()
    greedy_tps = (g1 + g2) / 2

    label = "int8 " if args.int8 else ""
    print(f"[greedy {label}]     {greedy_tps:.1f} tokens/s")
    print(f"[speculative {label}] {spec_tps:.1f} tokens/s "
          f"(gamma={args.gamma}, acceptance={acc:.2f})")
    rec = {
        "speculative_tokens_per_sec": round(spec_tps, 1),
        "greedy_tokens_per_sec": round(greedy_tps, 1),
        "speedup": round(spec_tps / greedy_tps, 3),
        "acceptance": round(acc, 3),
        "gamma": args.gamma,
        "int8": args.int8,
    }
    if args.int8:
        # compound headline: int8 speculative vs the bf16 greedy baseline
        greedy(bf16_t_params)
        bf16_tps = time_greedy(bf16_t_params)
        rec["bf16_greedy_tokens_per_sec"] = round(bf16_tps, 1)
        rec["compound_speedup_vs_bf16_greedy"] = round(spec_tps / bf16_tps, 3)
        print(f"[greedy bf16]      {bf16_tps:.1f} tokens/s "
              f"(compound {spec_tps / bf16_tps:.2f}x)")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
