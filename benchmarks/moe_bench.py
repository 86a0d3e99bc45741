"""MoE dispatch implementations at prefill scale: GShard dense dispatch
einsums vs the sorted grouped-matmul (``lax.ragged_dot``, megablocks-style)
path in ``layers.moe``.

Dropless dispatch via einsums costs O(T^2 * k * D) FLOPs in the dispatch/
combine tensors alone (capacity C = T); the ragged path pays exactly the
expert FLOPs plus O(T*k*D) gather/scatter. This bench measures a chained
forward (and fwd+bwd) over an 8-expert SwiGLU bank at prefill token counts.

Usage (on the TPU chip): python benchmarks/moe_bench.py [--tokens 4096]
"""

import argparse
import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo")

import vyomai_tpu as vt  # noqa: E402
from vyomai_tpu.layers import moe  # noqa: E402

CHAIN = 8  # chained layer applications per dispatch (dispatch ~1.1 ms RTT)


def build(tokens: int, hidden: int, inter: int, experts: int):
    cfg = vt.EncoderConfig(hidden_size=hidden, intermediate_size=inter,
                           num_attention_heads=16)
    params = moe.moe_init(jax.random.PRNGKey(0), cfg, num_experts=experts,
                          gated=True, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (tokens, hidden),
                          dtype=jnp.bfloat16)
    return params, x


def timed(fn, *args, steps=20):
    out = fn(*args)
    jnp.sum(jax.tree_util.tree_leaves(out)[0]).item()   # true device sync
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jnp.sum(jax.tree_util.tree_leaves(out)[0]).item()
    return (time.perf_counter() - t0) / steps


def bench_moe(tokens=4096, hidden=1024, inter=4096, experts=8, top_k=2):
    params, x = build(tokens, hidden, inter, experts)

    def chain(impl):
        def f(p, x):
            h = x
            for _ in range(CHAIN):
                h, _ = moe.moe_apply(p, h, top_k=top_k,
                                     capacity_factor=None, act="silu",
                                     impl=impl)
            return h
        return jax.jit(f)

    def chain_grad(impl):
        def f(p, x):
            h = x
            for _ in range(CHAIN):
                h, _ = moe.moe_apply(p, h, top_k=top_k,
                                     capacity_factor=None, act="silu",
                                     impl=impl)
            return jnp.sum(h.astype(jnp.float32) ** 2)
        return jax.jit(jax.grad(f))

    res = {"tokens": tokens, "hidden": hidden, "inter": inter,
           "experts": experts, "top_k": top_k, "chain": CHAIN}
    for impl in ("einsum", "ragged"):
        dt = timed(chain(impl), params, x)
        res[f"fwd_{impl}_us"] = round(1e6 * dt / CHAIN, 1)
    for impl in ("einsum", "ragged"):
        dt = timed(chain_grad(impl), params, x, steps=10)
        res[f"fwdbwd_{impl}_us"] = round(1e6 * dt / CHAIN, 1)
    res["fwd_speedup"] = round(res["fwd_einsum_us"] / res["fwd_ragged_us"], 3)
    res["fwdbwd_speedup"] = round(
        res["fwdbwd_einsum_us"] / res["fwdbwd_ragged_us"], 3)
    return res


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, default=4096)
    ap.add_argument("--experts", type=int, default=8)
    args = ap.parse_args()
    print(json.dumps(bench_moe(tokens=args.tokens, experts=args.experts)))
