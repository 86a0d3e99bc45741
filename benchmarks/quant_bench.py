"""Int8 weight-only quantization benchmarks (real TPU chip).

Two levels:

1. Kernel chains — decode-shaped matmuls (small M, big K/N) where each
   weight streams from HBM once per step. Compares bf16 ``x @ w``, the
   default XLA fused-dequant int8 path, and the hand-written Pallas
   kernel (``set_impl("pallas")``). Measured v5e result: XLA wins (the
   compiler fuses int8 widening into the dot's operand read) — see
   ``ops/quant_matmul.py`` docstring. Chains of many DISTINCT weights
   inside one jit so execution dominates the ~1.1 ms per-dispatch tunnel
   overhead (CLAUDE.md).

2. End-to-end — dense static-cache greedy decode of the 6-layer bench
   model, fp (bf16) params vs ``quantize_params`` int8 tree through the
   unchanged generate path.

Timing uses a single one-element host fetch as the barrier
(``utils.device_sync``) — ``block_until_ready`` doesn't synchronize
execution on the remote-attached runtime.
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
from vyomai_tpu.ops import quant_matmul as qm
from vyomai_tpu.ops.quant_matmul import int8_matmul, quantize_weight
from vyomai_tpu.utils import device_sync


def _time(fn, args, iters: int, label: str, bytes_per_pass: float):
    out = fn(*args)                       # compile + warm
    device_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    device_sync(out)
    dt = (time.perf_counter() - t0) / iters
    gbps = bytes_per_pass / dt / 1e9
    print(f"  {label:18s} {dt*1e3:8.3f} ms/pass   {gbps:7.1f} GB/s weight-stream")
    return dt


def bench_chain(m: int = 32, dim: int = 4096, depth: int = 24,
                iters: int = 20):
    """Chain of ``depth`` distinct [dim, dim] weights applied to [m, dim]."""
    print(f"[chain] M={m} K=N={dim} depth={depth}")
    keys = jax.random.split(jax.random.PRNGKey(0), depth + 1)
    ws = [jax.random.normal(k, (dim, dim), jnp.float32) / dim**0.5
          for k in keys[:depth]]
    x = jax.random.normal(keys[-1], (m, dim), jnp.bfloat16)
    ws_bf = jnp.stack([w.astype(jnp.bfloat16) for w in ws])
    qs = [quantize_weight(w, contract_axis=0) for w in ws]
    wq = jnp.stack([q for q, _ in qs])
    sc = jnp.stack([s for _, s in qs])

    @jax.jit
    def chain_bf16(x, ws):
        def body(y, w):
            return jnp.tanh(y @ w), None
        return jax.lax.scan(body, x, ws)[0]

    def chain_int8():
        @jax.jit
        def f(x, wq, sc):
            def body(y, w_s):
                w, s = w_s
                return jnp.tanh(int8_matmul(y, w, s)), None
            return jax.lax.scan(body, x, (wq, sc))[0]
        return f

    nbytes_bf = depth * dim * dim * 2
    nbytes_q = depth * dim * dim * 1
    t_bf = _time(chain_bf16, (x, ws_bf), iters, "bf16", nbytes_bf)
    t_q = _time(chain_int8(), (x, wq, sc), iters, "int8 xla (default)",
                nbytes_q)
    qm.set_impl("pallas")
    try:  # fresh jit wrapper: impl choice is baked at trace time
        t_pl = _time(chain_int8(), (x, wq, sc), iters, "int8 pallas",
                     nbytes_q)
    finally:
        qm.set_impl("xla")
    print(f"  int8 default vs bf16: {t_bf/t_q:5.2f}x"
          f"   vs pallas kernel: {t_pl/t_q:.2f}x")
    return {"shape": f"{m}x{dim}x{dim}x{depth}",
            "bf16_ms": round(t_bf * 1e3, 3),
            "int8_ms": round(t_q * 1e3, 3),
            "pallas_ms": round(t_pl * 1e3, 3),
            "speedup_vs_bf16": round(t_bf / t_q, 3)}


def bench_e2e(batch: int = 8, prompt: int = 128, new: int = 256):
    """Dense static-cache greedy decode: bf16 params vs int8 tree. ~0.9B
    params so the step is weight-stream-bound (an 85M model decodes at
    0.45 ms/step where attention + cache ops hide the weight read)."""
    from vyomai_tpu.generation import generate

    cfg = vt.QwenConfig(vocab_size=32768, hidden_size=2048,
                        intermediate_size=8192, num_hidden_layers=12,
                        num_attention_heads=16, num_key_value_heads=4,
                        head_dim=128, max_position_embeddings=1024,
                        qk_norm=True, eos_token_id=-1,
                        tie_word_embeddings=True)
    model = vt.ModelForCausalLM(cfg)
    params = model.init(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    qparams = vt.quantize_params(params)
    ids = jax.random.randint(jax.random.PRNGKey(1), (batch, prompt), 5,
                             cfg.vocab_size, dtype=jnp.int32)

    def measure(p, label):
        out = generate(model, p, ids, max_new_tokens=new, use_cache=True)
        device_sync(out)
        t0 = time.perf_counter()
        out = generate(model, p, ids, max_new_tokens=new, use_cache=True)
        device_sync(out)
        dt = time.perf_counter() - t0
        tps = batch * new / dt
        print(f"  {label:6s} {tps:8.0f} tok/s  ({dt*1e3/new:.2f} ms/step)")
        return tps

    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    print(f"[e2e decode] {n_params/1e6:.0f}M-param model B={batch} new={new}")
    fp = measure(params, "bf16")
    q = measure(qparams, "int8")
    # int4: linears pack two weights per byte with per-128-group scales
    # (embedding/tied head stay int8 — gather wants whole dequant rows)
    q4params = vt.quantize_params(params, bits=4)
    q4 = measure(q4params, "int4")
    print(f"  int8 vs bf16: {q/fp:.2f}x   int4 vs bf16: {q4/fp:.2f}x")
    return {"e2e_bf16_tok_s": round(fp, 1), "e2e_int8_tok_s": round(q, 1),
            "e2e_speedup": round(q / fp, 3),
            "e2e_int4_tok_s": round(q4, 1),
            "e2e_int4_speedup": round(q4 / fp, 3)}


def bench_w8a8_chain(m: int = 4096, dim: int = 4096, depth: int = 16,
                     iters: int = 20):
    """Compute-bound (prefill/training-shaped) chain: bf16 MXU vs W8A8
    int8 MXU. Unlike the decode chains above (weight-stream-bound, where
    int8's win is bandwidth), here the matmul FLOPs dominate and the win
    is the v5e's ~2x int8 systolic rate. The per-layer tanh stands in for
    the nonlinearity between real layers; activation re-quantization cost
    is included (each layer quantizes its input per token)."""
    from vyomai_tpu.ops.quant_matmul import w8a8_matmul

    print(f"[w8a8 chain] M={m} K=N={dim} depth={depth}")
    keys = jax.random.split(jax.random.PRNGKey(0), depth + 1)
    ws = [jax.random.normal(k, (dim, dim), jnp.float32) / dim**0.5
          for k in keys[:depth]]
    x = jax.random.normal(keys[-1], (m, dim), jnp.bfloat16)
    ws_bf = jnp.stack([w.astype(jnp.bfloat16) for w in ws])
    qs = [quantize_weight(w, contract_axis=0) for w in ws]
    wq = jnp.stack([q for q, _ in qs])
    sc = jnp.stack([s for _, s in qs])

    @jax.jit
    def chain_bf16(x, ws):
        def body(y, w):
            return jnp.tanh(y @ w), None
        return jax.lax.scan(body, x, ws)[0]

    @jax.jit
    def chain_w8a8(x, wq, sc):
        def body(y, w_s):
            w, s = w_s
            return jnp.tanh(w8a8_matmul(y, w, s)), None
        return jax.lax.scan(body, x, (wq, sc))[0]

    flops = 2.0 * m * dim * dim * depth
    t_bf = _time(chain_bf16, (x, ws_bf), iters, "bf16", depth * dim * dim * 2)
    t_q = _time(chain_w8a8, (x, wq, sc), iters, "w8a8", depth * dim * dim * 1)
    print(f"  bf16 {flops / t_bf / 1e12:6.1f} TFLOP/s   "
          f"w8a8 {flops / t_q / 1e12:6.1f} TOP/s   "
          f"speedup {t_bf / t_q:5.2f}x")
    return {"shape": f"{m}x{dim}x{dim}x{depth}",
            "bf16_ms": round(t_bf * 1e3, 3),
            "w8a8_ms": round(t_q * 1e3, 3),
            "bf16_tflops": round(flops / t_bf / 1e12, 1),
            "w8a8_tops": round(flops / t_q / 1e12, 1),
            "speedup_vs_bf16": round(t_bf / t_q, 3)}


def bench_w8a8_prefill(batch: int = 8, seq: int = 1024, iters: int = 5):
    """End-to-end prefill/scoring forward of the ~0.8B bench model: bf16
    params vs W8A8 (``quantize_params(act_bits=8)``). Prefill at B*S=8192
    tokens is compute-bound, the regime W8A8 targets (decode stays
    weight-only int8 — see int8_decode_speedup)."""
    cfg = vt.QwenConfig(vocab_size=32768, hidden_size=2048,
                        intermediate_size=8192, num_hidden_layers=12,
                        num_attention_heads=16, num_key_value_heads=4,
                        head_dim=128, max_position_embeddings=seq,
                        qk_norm=True, eos_token_id=-1,
                        tie_word_embeddings=True)
    model = vt.ModelForCausalLM(cfg)
    params = model.init(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    ids = jax.random.randint(jax.random.PRNGKey(1), (batch, seq), 5,
                             cfg.vocab_size, dtype=jnp.int32)
    print(f"[w8a8 prefill] {n_params/1e6:.0f}M-param model B={batch} S={seq}")

    def measure(p, label):
        @jax.jit
        def fwd(p, ids):
            return model.apply(p, ids).logits[:, -1]
        out = fwd(p, ids)
        device_sync(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd(p, ids)
        device_sync(out)
        dt = (time.perf_counter() - t0) / iters
        tps = batch * seq / dt
        print(f"  {label:6s} {tps:9.0f} tok/s  ({dt*1e3:.1f} ms/forward)")
        return tps

    fp = measure(params, "bf16")
    w8a8 = measure(vt.quantize_params(params, act_bits=8), "w8a8")
    print(f"  w8a8 vs bf16 prefill: {w8a8/fp:.2f}x")
    return {"prefill_bf16_tok_s": round(fp, 1),
            "prefill_w8a8_tok_s": round(w8a8, 1),
            "prefill_speedup": round(w8a8 / fp, 3)}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["chain", "e2e", "w8a8", "all"],
                    default="all")
    args = ap.parse_args()
    recs = {}
    if args.mode in ("chain", "all"):
        recs["ffn_chain"] = bench_chain(m=32, dim=4096, depth=24)
        recs["wide_chain"] = bench_chain(m=8, dim=4096, depth=24)
    if args.mode in ("w8a8", "all"):
        recs["w8a8_chain"] = bench_w8a8_chain()
        recs["w8a8_prefill"] = bench_w8a8_prefill()
    if args.mode in ("e2e", "all"):
        recs["e2e"] = bench_e2e()
    print(json.dumps({"metric": "int8_quant_bench", **recs}))
