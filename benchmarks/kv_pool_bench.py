"""Paged-decode attention kernel across KV pool storage formats (real TPU
chip): bf16 vs int8 (per-row scales) vs int4 (per-(row, head) scales,
packed nibbles).

Measured answer (v5e, r3): the kernel is DMA-ISSUE and per-block-compute
bound at serving block sizes, NOT bytes-bound — bf16 streams at only
35-123 GB/s of the ~800 GB/s HBM, so halving or quartering the bytes
moves latency < ~10% either way (int8 1.09x at BS=256/ctx 7936, 0.91x at
BS=64/ctx 2k; int4 ~0.9-0.95x — its nibble unpack and per-head scale
dots cost about what its bytes save). The QUANTIZED POOLS' value on this
chip is CAPACITY, not kernel latency: 2x/4x more context per HBM byte =
bigger batches and fewer preemptions at the engine level. Measured as
CHAINED kernel calls in one jit (per-dispatch tunnel overhead is ~1.1 ms
— CLAUDE.md).
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

from vyomai_tpu.ops import paged_decode_pallas as pdp
from vyomai_tpu.ops.paged_attention import quantize_rows, quantize_rows_int4
from vyomai_tpu.utils import device_sync


def bench_pool_dtypes(b: int = 16, h: int = 16, h_kv: int = 4, d: int = 128,
                      bs: int = 64, ctx: int = 1984, nb: int = 1024,
                      depth: int = 16, iters: int = 20):
    maxb = -(-ctx // bs) + 1
    width = h_kv * d
    rng = jax.random.PRNGKey(0)
    kq, kp = jax.random.split(rng)
    q = jax.random.normal(kq, (b, h, d), dtype=jnp.bfloat16)
    pool_f = (jax.random.normal(kp, (nb, 2, bs, width), jnp.float32) * 0.3)

    flat = pool_f.reshape(nb * 2 * bs, width)
    q8, s8 = quantize_rows(flat)
    pool8 = q8.reshape(nb, 2, bs, width)
    sc8 = s8.reshape(nb, 2, bs)
    q4, s4 = quantize_rows_int4(flat, h_kv)
    pool4 = q4.reshape(nb, 2, bs, width // 2)
    # sidecar layout: [NB, 2, H_kv, BS] (BS minor — VMEM tiling)
    sc4 = s4.reshape(nb, 2, bs, h_kv).transpose(0, 1, 3, 2)

    tabs = jnp.asarray(np.random.default_rng(0).integers(
        0, nb, size=(b, maxb)), dtype=jnp.int32)
    lens = jnp.full((b,), ctx, dtype=jnp.int32)

    live_bytes = b * (-(-ctx // bs)) * bs  # live rows fetched per call
    results = {}

    def run(label, pool, scales, bytes_per_row):
        @jax.jit
        def chain(q, pool, tabs, lens, *sc):
            def body(qc, _):
                o = pdp.paged_attention_decode_pallas(
                    qc, pool, tabs, lens, h_kv,
                    sc[0] if sc else None)
                return o.astype(qc.dtype), None
            return jax.lax.scan(body, q, None, length=depth)[0]

        args = (q, pool, tabs, lens) + ((scales,) if scales is not None
                                        else ())
        out = chain(*args)
        device_sync(out)
        t0 = time.perf_counter()
        out = chain(*args)
        device_sync(out)
        dt = (time.perf_counter() - t0) / depth
        gbps = live_bytes * 2 * bytes_per_row / dt / 1e9
        print(f"  {label:6s} {dt*1e6:8.1f} us/call   {gbps:6.1f} GB/s "
              "KV-stream")
        results[label] = round(dt * 1e6, 1)
        return dt

    print(f"[kv pool] B={b} H={h}/{h_kv} D={d} BS={bs} ctx={ctx} "
          f"depth={depth}")
    t_bf = run("bf16", pool_f.astype(jnp.bfloat16), None, width * 2)
    t_8 = run("int8", pool8, sc8, width)
    t_4 = run("int4", pool4, sc4, width // 2)
    print(f"  int8 vs bf16: {t_bf/t_8:.2f}x   int4 vs bf16: {t_bf/t_4:.2f}x"
          f"   int4 vs int8: {t_8/t_4:.2f}x")
    return {**results, "int8_speedup": round(t_bf / t_8, 3),
            "int4_speedup": round(t_bf / t_4, 3),
            "int4_vs_int8": round(t_8 / t_4, 3)}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", type=int, default=1984)
    ap.add_argument("--bs", type=int, default=64)
    args = ap.parse_args()
    r = bench_pool_dtypes(ctx=args.ctx, bs=args.bs)
    print(json.dumps({"metric": "kv_pool_bench", **r}))
