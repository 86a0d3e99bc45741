"""Decode-step fixed-cost ATTRIBUTION (VERDICT r4 #2).

r4's spec_tick_profile showed a ~0.9B decode STEP costs ~5.8 ms inside an
engine tick vs its ~2.2 ms weight-stream floor at M=8 — a 2.6x tax on
every serving number. This bench cuts that step into named, separately
timed parts so the top cost can be attacked instead of guessed at:

  device_step   decode_horizon(32) timed as pipelined dispatches with ONE
                host fetch — the pure device cost per decoded token
  matmul_floor  the step's matmuls alone (qkv/o/gate/up/down + lm head)
                over the REAL params — the weight-stream bound
  attn_kernel   32 x 12 chained paged-attention kernel calls (per-layer
                program + DMA overhead)
  kv_write      32 x 12 chained write_kv scatters into the pool
  norms_rope    32 x 12 chained rms_norm x4 + rope apply at step shapes
  engine_tick   one full ContinuousBatchEngine.step() wall time (adds the
                host bookkeeping + the ~25 ms tunnel RTT paid per tick)

Remainder = device_step - (floor + attn + write + norms) ~= while_loop
bookkeeping + sampling + embedding + fusion seams.

Run on the chip: python benchmarks/decode_step_profile.py [--horizon 32]
Matches the decode-step role of the reference
(`/root/reference/Examples/simple_vllm.ipynb` nb line 366).
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
from vyomai_tpu.core import nn as cnn
from vyomai_tpu.layers.positional import rotate_half
from vyomai_tpu.ops import paged_decode_pallas
from vyomai_tpu.ops.paged_attention import write_kv
from vyomai_tpu.serving import paged_model

# the serving_spec_bench 0.9B target: decode streams ~1.8 GB/step
CFG = vt.QwenConfig(
    vocab_size=32_768, hidden_size=2048, intermediate_size=8192,
    num_hidden_layers=12, num_attention_heads=16, num_key_value_heads=4,
    head_dim=128, max_position_embeddings=1024, qk_norm=True,
    eos_token_id=-1, tie_word_embeddings=True)
M = 8                  # decode lanes
BS = 64                # pool block size
NB = 64                # pool blocks
MAXB = 8               # block table length
CTX = 160              # context tokens already in the pool
REPEATS = 8


def _sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jnp.ravel(leaf)[0])


def _time(fn, *args, repeats=REPEATS):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / repeats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--horizon", type=int, default=32)
    ap.add_argument("--part", default="all",
                    help="comma list of tick,floor,attn,write,norms,engine")
    args = ap.parse_args()
    horizon = args.horizon
    parts = (("tick", "floor", "attn", "write", "norms", "engine")
             if args.part == "all" else tuple(args.part.split(",")))

    model = vt.ModelForCausalLM(CFG)
    params = model.init(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    n_params = sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
    bytes_streamed = 2 * n_params    # bf16
    width = CFG.num_key_value_heads * CFG.head_dim
    nl = CFG.num_hidden_layers
    pool = {"kv": jnp.zeros((nl, NB, 2, BS, width), jnp.bfloat16)}

    tables = np.full((M, MAXB), -1, np.int32)
    for i in range(M):
        tables[i, : (CTX + horizon + BS - 1) // BS + 1] = np.arange(
            i * MAXB, i * MAXB + (CTX + horizon + BS - 1) // BS + 1) % NB
    tables = jnp.asarray(tables)
    tokens = jnp.full((M,), 11, jnp.int32)
    positions = jnp.full((M,), CTX, jnp.int32)
    live = jnp.ones((M,), bool)

    # --- full device tick (decode_horizon is ALREADY jitted with pool
    # donation — wrapping it in another jit builds a second huge program
    # and r5's first attempt crashed the remote compile helper doing so)
    device_step_ms = float("nan")
    if "tick" in parts:
        pool2 = pool
        # mirror the ENGINE's decode_horizon call signature exactly so this
        # shares the engine part's compiled program (two distinct
        # multi-minute compiles otherwise)
        temps = jnp.full((M,), 1.0, jnp.float32)
        tps_v = jnp.full((M,), 1.0, jnp.float32)
        mps_v = jnp.full((M,), 0.0, jnp.float32)
        budget = jnp.full((M,), horizon, jnp.int32)
        key = jax.random.PRNGKey(0)

        def run_tick():
            nonlocal pool2
            o = None
            for _ in range(4):          # pipeline 4 ticks, fetch once
                o, _, _, pool2 = paged_model.decode_horizon(
                    model, False, params, pool2, tokens, positions, tables,
                    live, horizon, False, eos=-1, rng=key,
                    temperature=temps, top_p=tps_v, min_p=mps_v,
                    budget=budget, allow_pallas=True, mesh=None,
                    rope_offset=0, with_logprobs=False)
            return o

        dev_tick_s = _time(run_tick) / 4
        device_step_ms = 1e3 * dev_tick_s / horizon
        print(json.dumps({"part": "tick",
                          "device_step_ms": round(device_step_ms, 3)}),
              flush=True)

    # --- matmul floor (real params, same shapes; no attention/norm) -------
    floor_ms = attn_ms = write_ms = norms_ms = float("nan")

    # params is an explicit jit ARGUMENT everywhere below: closing over the
    # ~1.8 GB tree serializes it into the compile payload and crashes the
    # remote compile helper (broken pipe — serving_spec_bench hit the same)
    def floor_fn(p, h0):
        def step(_, h):
            def body(h, lp):
                q = cnn.linear(lp["self_attn"]["q_proj"], h)
                k = cnn.linear(lp["self_attn"]["k_proj"], h)
                v = cnn.linear(lp["self_attn"]["v_proj"], h)
                h = h + cnn.linear(lp["self_attn"]["o_proj"], q)
                g = cnn.linear(lp["mlp"]["gate_proj"], h)
                u = cnn.linear(lp["mlp"]["up_proj"], h)
                h = h + cnn.linear(lp["mlp"]["down_proj"],
                                   jax.nn.silu(g) * u)
                # keep k/v alive without extra HBM traffic
                return h + 1e-30 * (k[:, :1] + v[:, :1]), None
            h, _ = jax.lax.scan(body, h, p["layers"])
            logits = paged_model._head(p, h)
            return h + 1e-30 * logits[:, :1]
        return jax.lax.fori_loop(0, horizon, step, h0)

    h0 = jax.random.normal(jax.random.PRNGKey(1), (M, CFG.hidden_size),
                           jnp.bfloat16)
    if "floor" in parts:
        floor_ms = 1e3 * _time(jax.jit(floor_fn), params, h0) / horizon
        print(json.dumps({"part": "floor",
                          "matmul_floor_ms": round(floor_ms, 3)}),
              flush=True)

    # --- attention kernel chain ------------------------------------------
    q0 = jax.random.normal(jax.random.PRNGKey(2),
                           (M, CFG.num_attention_heads, CFG.head_dim),
                           jnp.float32)
    seq_lens = jnp.full((M,), CTX, jnp.int32)
    if "attn" in parts:
        akv = jnp.zeros((nl, NB, 2, BS, width), jnp.bfloat16)

        def attn_fn(akv_in, q):
            def step(_, q):
                def body(q, pkv):
                    a = paged_decode_pallas.paged_attention_decode_pallas(
                        q.astype(jnp.float32), pkv, tables, seq_lens,
                        CFG.num_key_value_heads, None)
                    return q + 1e-30 * a, None
                q, _ = jax.lax.scan(body, q, akv_in)
                return q
            return jax.lax.fori_loop(0, horizon, step, q)

        attn_supported = paged_decode_pallas.supported(
            jnp.zeros((M, CFG.num_attention_heads, CFG.head_dim)),
            akv[0], CFG.num_key_value_heads)
        attn_ms = (1e3 * _time(jax.jit(attn_fn), akv, q0) / horizon
                   if attn_supported else float("nan"))
        print(json.dumps({"part": "attn",
                          "attn_kernel_ms": round(attn_ms, 3)}), flush=True)

    # --- kv write chain ---------------------------------------------------
    k_new = jax.random.normal(jax.random.PRNGKey(3),
                              (M, CFG.num_key_value_heads, CFG.head_dim),
                              jnp.bfloat16)
    sb = jnp.arange(M, dtype=jnp.int32)

    def write_fn(pl):
        def step(i, pl):
            off = jnp.full((M,), jnp.mod(i, BS), jnp.int32)

            def body(_, pkv):            # scan over the LAYER dim of pl
                return None, write_kv(pkv, k_new, k_new, sb, off)
            _, pl = jax.lax.scan(body, None, pl)
            return pl
        return jax.lax.fori_loop(0, horizon, step, pl)

    if "write" in parts:
        write_j = jax.jit(write_fn, donate_argnums=(0,))
        wout = write_j(jnp.zeros((nl, NB, 2, BS, width), jnp.bfloat16))
        _sync(wout)
        t0 = time.perf_counter()
        for _ in range(REPEATS):
            wout = write_j(wout)
        _sync(wout)
        write_ms = 1e3 * (time.perf_counter() - t0) / REPEATS / horizon
        print(json.dumps({"part": "write",
                          "kv_write_ms": round(write_ms, 3)}), flush=True)

    # --- norms + rope chain ----------------------------------------------
    lp0 = jax.tree_util.tree_map(lambda x: x[0], params["layers"])
    emb_freq = jnp.asarray(model.emb_freq)

    def norm_fn(lp0, ef, h):
        def step(_, h):
            def body(h, __):
                n1 = cnn.rms_norm(lp0["input_layernorm"], h,
                                  eps=CFG.rms_norm_eps)
                q = n1.reshape(M, CFG.hidden_size // CFG.head_dim,
                               CFG.head_dim)
                fr = jnp.take(ef[0], positions, axis=0)
                emb = jnp.concatenate([fr, fr], axis=-1)[:, None, :]
                q = (q * jnp.cos(emb).astype(q.dtype)
                     + rotate_half(q) * jnp.sin(emb).astype(q.dtype))
                n2 = cnn.rms_norm(lp0["post_attention_layernorm"], h,
                                  eps=CFG.rms_norm_eps)
                return h + 1e-30 * (q.reshape(M, -1)[:, :1] + n2[:, :1]), None
            h, _ = jax.lax.scan(body, h, jnp.arange(nl))
            return h
        return jax.lax.fori_loop(0, horizon, step, h)

    if "norms" in parts:
        norms_ms = 1e3 * _time(jax.jit(norm_fn), lp0, emb_freq, h0) / horizon
        print(json.dumps({"part": "norms",
                          "norms_rope_ms": round(norms_ms, 3)}), flush=True)

    # --- engine tick (host + RTT included) --------------------------------
    engine_tick_ms = engine_step_ms = float("nan")
    if "engine" in parts:
        from vyomai_tpu.serving import ContinuousBatchEngine
        eng = ContinuousBatchEngine(
            model, params, num_blocks=256, block_size=BS, max_batch=M,
            max_blocks_per_seq=MAXB, max_new_tokens=256,
            prefill_buckets=(CTX,), decode_horizon=horizon)
        rng = np.random.default_rng(0)
        for _ in range(M):
            eng.submit(list(rng.integers(10, 1000, size=CTX - 1)),
                       ignore_eos=True)
        while eng.needs_prefill or eng.waiting:
            eng.step()
        eng.step()  # warm decode program
        t0 = time.perf_counter()
        n = 6
        for _ in range(n):
            eng.step()
        engine_tick_ms = 1e3 * (time.perf_counter() - t0) / n
        engine_step_ms = engine_tick_ms / horizon

    rows = {
        "device_step_ms": round(device_step_ms, 3),
        "matmul_floor_ms": round(floor_ms, 3),
        "attn_kernel_ms": round(attn_ms, 3),
        "kv_write_ms": round(write_ms, 3),
        "norms_rope_ms": round(norms_ms, 3),
        "remainder_ms": round(device_step_ms - floor_ms - attn_ms
                              - write_ms - norms_ms, 3),
        "engine_step_ms": round(engine_step_ms, 3),
        "engine_tick_ms": round(engine_tick_ms, 1),
        "host_rtt_tax_ms_per_step": round(engine_step_ms - device_step_ms,
                                          3),
        "horizon": horizon, "lanes": M, "ctx": CTX,
        "n_params": n_params,
        "weight_stream_floor_ms": round(1e3 * bytes_streamed / 819e9, 3),
    }
    print(json.dumps({"metric": "decode_step_profile", **rows}), flush=True)
    return rows


if __name__ == "__main__":
    main()
