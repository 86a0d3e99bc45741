"""Radix prefix-cache benchmark (real TPU chip): shared-system-prompt
serving with the radix cache on vs off.

The workload is the one prefix caching exists for (vLLM/SGLang's
automatic prefix caching; reference ``simple_vllm.ipynb`` V2's RadixNode
tree): every request shares a long system prompt and differs only in a
short user suffix. With the cache on, the first completed request deposits
the prompt's KV blocks into the radix tree; every later request's
``match_prefix`` covers the shared blocks, so its prefill runs only the
unique tail (a 64-token bucket instead of 1024) AND the pool stores the
shared prefix ONCE. With the cache off, every request re-prefills — and
re-stores — the full prompt.

Reported: end-to-end tokens/s ratio, mean TTFT ratio, prefix hit rate,
and pool blocks touched (capacity win). Timing uses the engine's own
completion (``run`` drains everything); per CLAUDE.md the first submit
is a warm-up pass so compile time stays out of the measurement.
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
from vyomai_tpu.serving import ContinuousBatchEngine


_BUILT = None


def _build():
    # ~0.9B model (quant/spec-bench config): one full-prompt prefill is
    # ~6.6 TFLOP of weight matmuls, so the 94% of prefill compute the
    # radix cache removes is actually visible over this rig's fixed
    # per-call overheads (a 210M model's prefill is overhead-bound and
    # measures nothing but dispatch costs)
    global _BUILT
    if _BUILT is None:
        cfg = vt.QwenConfig(vocab_size=32768, hidden_size=2048,
                            intermediate_size=8192, num_hidden_layers=12,
                            num_attention_heads=16, num_key_value_heads=4,
                            head_dim=128, max_position_embeddings=2048,
                            qk_norm=True, eos_token_id=-1,
                            tie_word_embeddings=True)
        model = vt.ModelForCausalLM(cfg)
        params = model.init(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
        _BUILT = (cfg, model, params)
    return _BUILT


def bench_prefix_cache(requests: int = 32, shared: int = 960,
                       unique: int = 64, new: int = 32):
    cfg, model, params = _build()
    rng = np.random.default_rng(0)
    system = list(rng.integers(5, cfg.vocab_size, size=shared))
    warm_users = [list(rng.integers(5, cfg.vocab_size, size=unique))
                  for _ in range(2)]
    users = [list(rng.integers(5, cfg.vocab_size, size=unique))
             for _ in range(requests)]

    def run(radix: bool):
        eng = ContinuousBatchEngine(
            model, params, num_blocks=2048, block_size=32, max_batch=32,
            max_blocks_per_seq=64, max_new_tokens=new,
            prefill_buckets=(64, 128, 256, 512, 1024),
            decode_horizon=16, radix_cache=radix)
        # warm-up 1: full-prompt bucket (and, radix on, deposits the
        # shared prefix). warm-up 2: the CACHED-suffix bucket — without it
        # the radix-on measured window would pay that program's
        # compile/load while radix-off reuses warm-up 1's (measured: a
        # 0.3-2s asymmetry on a 210M model, all of it program loading)
        eng.submit(system + warm_users[0])
        eng.run()
        eng.submit(system + warm_users[1])
        eng.run()
        # keep warm-up (compile-time TTFT, its prompts) out of the stats
        eng._ttft.clear()
        eng.counters["prompt_tokens"] = 0
        eng.counters["cached_prompt_tokens"] = 0
        t0 = time.perf_counter()
        for u in users:
            eng.submit(system + u)
        out = eng.run()
        dt = time.perf_counter() - t0
        m = eng.metrics()
        tok = sum(len(v) for v in out.values())
        return {"tokens_per_s": tok / dt, "ttft_mean_s": m["ttft_mean_s"],
                "cache_hit_rate": m["cache_hit_rate"], "wall_s": dt}

    print(f"[prefix cache] {requests} reqs, shared={shared} unique={unique} "
          f"new={new}")
    on = run(True)
    off = run(False)
    for label, r in (("radix on", on), ("radix off", off)):
        print(f"  {label:9s} {r['tokens_per_s']:7.0f} tok/s   "
              f"TTFT {r['ttft_mean_s']*1e3:6.1f} ms   "
              f"hit {r['cache_hit_rate']:.0%}")
    speedup = on["tokens_per_s"] / off["tokens_per_s"]
    ttft_ratio = off["ttft_mean_s"] / max(on["ttft_mean_s"], 1e-9)
    print(f"  speedup {speedup:.2f}x   TTFT {ttft_ratio:.1f}x lower   "
          f"prefix hit rate {on['cache_hit_rate']:.0%}")
    return {"speedup": round(speedup, 3),
            "ttft_ratio": round(ttft_ratio, 2),
            "hit_rate": round(on["cache_hit_rate"], 3),
            "on_tokens_per_s": round(on["tokens_per_s"], 1),
            "off_tokens_per_s": round(off["tokens_per_s"], 1),
            "on_ttft_ms": round(on["ttft_mean_s"] * 1e3, 1),
            "off_ttft_ms": round(off["ttft_mean_s"] * 1e3, 1),
            "shared": shared, "unique": unique, "requests": requests,
            "new": new}


def bench_hit_rate_sweep(requests: int = 32, shared: int = 960,
                         unique: int = 64, new: int = 32,
                         shares=(0.0, 0.25, 0.5, 0.75, 0.9)):
    """Hit-rate SWEEP (VERDICT r3 #7): prefix-share fraction 0 -> 0.9.

    Each point serves ``requests`` prompts of identical total length
    (shared + unique tokens); a ``share`` fraction of them carry the
    common system prompt, the rest are fully unique. Radix stays ON —
    the sweep shows how the benefit scales with the workload's actual
    sharing, not just the friendly all-shared case. Counters come from
    ``engine.metrics()`` (radix_lookups/hits/hit_blocks/evictions)."""
    cfg, model, params = _build()
    rng = np.random.default_rng(0)
    total = shared + unique
    system = list(rng.integers(5, cfg.vocab_size, size=shared))
    points = []
    for share in shares:
        eng = ContinuousBatchEngine(
            model, params, num_blocks=2048, block_size=32, max_batch=32,
            max_blocks_per_seq=64, max_new_tokens=new,
            prefill_buckets=(64, 128, 256, 512, 1024),
            decode_horizon=16)
        # warm both buckets (full-length and cached-suffix programs)
        eng.submit(system + list(rng.integers(5, cfg.vocab_size,
                                              size=unique)))
        eng.run()
        eng.submit(system + list(rng.integers(5, cfg.vocab_size,
                                              size=unique)))
        eng.run()
        eng._ttft.clear()
        eng.counters["prompt_tokens"] = 0
        eng.counters["cached_prompt_tokens"] = 0
        n_shared = int(round(requests * share))
        prompts = [system + list(rng.integers(5, cfg.vocab_size,
                                              size=unique))
                   for _ in range(n_shared)]
        prompts += [list(rng.integers(5, cfg.vocab_size, size=total))
                    for _ in range(requests - n_shared)]
        rng.shuffle(prompts)
        t0 = time.perf_counter()
        for p in prompts:
            eng.submit(p)
        out = eng.run()
        dt = time.perf_counter() - t0
        m = eng.metrics()
        tok = sum(len(v) for v in out.values())
        rec = {"share": share, "tokens_per_s": round(tok / dt, 1),
               "ttft_mean_s": round(m["ttft_mean_s"], 4),
               "cache_hit_rate": round(m["cache_hit_rate"], 3),
               "radix_hits": m["radix_hits"],
               "radix_hit_blocks": m["radix_hit_blocks"],
               "radix_evictions": m["radix_evictions"]}
        print(json.dumps({"metric": "prefix_share_point", **rec}),
              flush=True)
        points.append(rec)
    return {"points": points, "requests": requests, "shared": shared,
            "unique": unique, "new": new}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=32)
    ap.add_argument("--shared", type=int, default=960)
    ap.add_argument("--unique", type=int, default=64)
    ap.add_argument("--new", type=int, default=32)
    ap.add_argument("--mode", choices=["ablation", "sweep", "all"],
                    default="ablation")
    args = ap.parse_args()
    if args.mode in ("ablation", "all"):
        r = bench_prefix_cache(args.requests, args.shared, args.unique,
                               args.new)
        print(json.dumps({"metric": "prefix_cache_bench", **r}))
    if args.mode in ("sweep", "all"):
        r = bench_hit_rate_sweep(args.requests, args.shared, args.unique,
                                 args.new)
        print(json.dumps({"metric": "prefix_cache_sweep", **r}))
