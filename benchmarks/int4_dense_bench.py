"""Dense int4 matmul attribution microbench (VERDICT r3 #4).

r3 measured dense int4 decode SLOWER than int8 (1.11x vs 1.70x over bf16)
despite streaming half the bytes. This bench isolates WHERE the int4
kernel's time goes at the decode shape, with kv_pool_bench's methodology
(chained kernels in one jit, single host-fetch sync):

  bf16        x @ W                              (weight bytes 2*K*N)
  int8_xla    fused-dequant int8 (the int8 path) (bytes K*N)
  int4        the shipped Pallas kernel          (bytes K*N/2)
  int4_stream SAME grid/DMA, dot on the packed bytes directly — no nibble
              unpack, no per-group scale; the DMA+MXU floor for K*N/2
              streamed bytes (wrong math, right traffic)
  int4_noscale unpack but single end scale — isolates the per-group scale
              epilogue cost from the unpack cost

If int4 ~= int4_stream, the kernel is bandwidth-bound and the loss vs
int8 is elsewhere; if int4 >> int4_stream, the unpack (VPU int ops on
K*N/2 bytes that the MXU can't help with) is the bound, and
int4_noscale - int4_stream attributes unpack vs scale.

Run: python benchmarks/int4_dense_bench.py [--m 8] [--k 2048] [--n 2048]
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vyomai_tpu.ops import quant_matmul as qm

CHAIN = 24
DISPATCH = 8


def _sync(x):
    jnp.asarray(x).ravel()[0].item()


def _time_chain(fn, x):
    out = fn(x)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(DISPATCH):
        out = fn(out)
    _sync(out)
    return (time.perf_counter() - t0) / DISPATCH / CHAIN


def _stream_kernel(xe_ref, xo_ref, wp_ref, s_ref, o_ref, acc_ref):
    """DMA/MXU floor: identical operands and blocks to _kernel_int4 but
    the dot consumes the PACKED bytes as int8 directly (no unpack, no
    groups, one scale at the end). Wrong math, identical traffic."""
    g = pl.program_id(1)

    @pl.when(g == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = wp_ref[:].astype(xe_ref.dtype)
    acc = jnp.dot(xe_ref[:], w, preferred_element_type=jnp.float32)
    acc += jnp.dot(xo_ref[:], w, preferred_element_type=jnp.float32)
    acc_ref[:] += acc

    @pl.when(g == pl.num_programs(1) - 1)
    def _out():
        o_ref[:] = (acc_ref[:] * s_ref[0, 0, :]).astype(o_ref.dtype)


def _noscale_kernel(xe_ref, xo_ref, wp_ref, s_ref, o_ref, acc_ref):
    """Full nibble unpack, but ONE scale application at the end instead of
    per group — isolates the per-group epilogue cost."""
    g = pl.program_id(1)

    @pl.when(g == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    lo, hi = qm._unpack_int4(wp_ref[:])
    acc = jnp.dot(xe_ref[:], lo.astype(xe_ref.dtype),
                  preferred_element_type=jnp.float32)
    acc += jnp.dot(xo_ref[:], hi.astype(xo_ref.dtype),
                   preferred_element_type=jnp.float32)
    acc_ref[:] += acc

    @pl.when(g == pl.num_programs(1) - 1)
    def _out():
        o_ref[:] = (acc_ref[:] * s_ref[0, 0, :]).astype(o_ref.dtype)


def _variant_call(kernel, x, w_p, s3, rows, bn):
    m, k_half2 = x.shape[0], w_p.shape[0]
    xe, xo = x[:, 0::2], x[:, 1::2]
    kb = k_half2 // rows
    n_dim = w_p.shape[1]
    return pl.pallas_call(
        kernel,
        grid=(n_dim // bn, kb),
        in_specs=[
            pl.BlockSpec((m, rows), lambda n, g: (0, g)),
            pl.BlockSpec((m, rows), lambda n, g: (0, g)),
            pl.BlockSpec((rows, bn), lambda n, g: (g, n)),
            pl.BlockSpec((1, s3.shape[1], bn), lambda n, g: (g, 0, n)),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda n, g: (0, n)),
        out_shape=jax.ShapeDtypeStruct((m, n_dim), x.dtype),
        scratch_shapes=[pltpu.VMEM((m, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(xe, xo, w_p, s3)


def bench(m=8, k=2048, n=2048, gs=128):
    assert k == n, "chains need square shapes"
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (k, n), jnp.float32) * 0.02
    w_bf = w.astype(jnp.bfloat16)
    w8, s8 = qm.quantize_weight(w)
    w4, s4 = qm.quantize_weight_int4(w, group_size=gs)
    x = jax.random.normal(jax.random.PRNGKey(1), (max(8, m), k),
                          jnp.bfloat16)

    rows = qm._int4_block_rows(gs, k // 2)
    gpb = rows // (gs // 2)
    s3 = s4.reshape((k // 2) // rows, gpb, n)
    bn = qm._pick_block(n, (512, 256, 128))

    def chain(f):
        @jax.jit
        def run(x):
            for _ in range(CHAIN):
                x = f(x) * 0.1   # keep magnitudes bounded
            return x
        return run

    variants = {
        "bf16": chain(lambda x: x @ w_bf),
        "int8_xla": chain(lambda x: qm.int8_matmul(x, w8, s8)),
        "int4": chain(lambda x: qm.int4_matmul(x, w4, s4)),
        "int4_stream": chain(functools.partial(
            _variant_call, _stream_kernel, w_p=w4, s3=s3, rows=rows, bn=bn)),
        "int4_noscale": chain(functools.partial(
            _variant_call, _noscale_kernel, w_p=w4, s3=s3, rows=rows, bn=bn)),
    }
    out = {}
    for name, fn in variants.items():
        t = _time_chain(fn, x)
        bytes_w = {"bf16": 2 * k * n, "int8_xla": k * n}.get(name, k * n // 2)
        out[name] = {"us": round(t * 1e6, 2),
                     "wGBps": round(bytes_w / t / 1e9, 1)}
        print(json.dumps({"variant": name, "m": m, "k": k, "n": n, **out[name]}),
              flush=True)
    summary = {
        "metric": "int4_dense_attribution", "m": m, "k": k, "n": n,
        "gs": gs,
        "int4_vs_int8": round(out["int8_xla"]["us"] / out["int4"]["us"], 3),
        "unpack_tax_us": round(out["int4_noscale"]["us"]
                               - out["int4_stream"]["us"], 2),
        "scale_tax_us": round(out["int4"]["us"]
                              - out["int4_noscale"]["us"], 2),
        "stream_floor_us": out["int4_stream"]["us"],
    }
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--k", type=int, default=2048)
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--gs", type=int, default=128)
    args = ap.parse_args()
    bench(args.m, args.k, args.n, args.gs)
