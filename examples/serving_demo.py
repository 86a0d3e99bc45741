"""Continuous-batching serving demo (reference ``simple_vllm.ipynb`` — N4):
paged KV pool, radix prefix caching, mixed prefill/decode scheduling.

With ``--weights <dir>`` loads a local Qwen safetensors checkpoint via
``interop.hf_import``; otherwise runs a random-weight smoke demo."""

import argparse

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))
import time

import jax
import jax.numpy as jnp
import numpy as np

import vyomai_tpu as vt
from vyomai_tpu.serving import ContinuousBatchEngine


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default=None)
    ap.add_argument("--requests", type=int, default=16)
    ap.add_argument("--max-new", type=int, default=32)
    ap.add_argument("--stream", action="store_true",
                    help="use engine.stream() and report time-to-first-token")
    ap.add_argument("--kv", choices=("bf16", "int8", "int4"), default="bf16",
                    help="paged-pool storage: int8 = 2x block capacity "
                         "(token-exact), int4 = 4x (lossy; see "
                         "paged_model.init_pool)")
    args = ap.parse_args()

    if args.weights:
        from vyomai_tpu.interop.hf_import import load_safetensors, import_qwen
        cfg = vt.QwenConfig()
        model = vt.ModelForCausalLM(cfg)
        params = import_qwen(load_safetensors(args.weights), cfg)
    else:
        cfg = vt.QwenConfig(vocab_size=2048, hidden_size=256,
                            intermediate_size=512, num_hidden_layers=4,
                            num_attention_heads=8, num_key_value_heads=4,
                            head_dim=32, max_position_embeddings=512,
                            qk_norm=True, eos_token_id=2)
        model = vt.ModelForCausalLM(cfg)
        params = model.init(jax.random.PRNGKey(0), dtype=jnp.bfloat16)

    kv_dtype = {"bf16": jnp.bfloat16, "int8": jnp.int8,
                "int4": "int4"}[args.kv]
    eng = ContinuousBatchEngine(model, params, num_blocks=512, block_size=16,
                                max_batch=8, max_blocks_per_seq=16,
                                max_new_tokens=args.max_new,
                                prefill_buckets=(32, 64, 128),
                                dtype=kv_dtype)
    rng = np.random.default_rng(0)
    shared_prefix = list(rng.integers(5, cfg.vocab_size, size=24))
    sids = []
    for i in range(args.requests):
        # half the requests share a prompt prefix (exercises the radix cache)
        if i % 2 == 0:
            prompt = shared_prefix + list(rng.integers(5, cfg.vocab_size,
                                                       size=8))
        else:
            prompt = list(rng.integers(5, cfg.vocab_size, size=24))
        sids.append(eng.submit(prompt))

    t0 = time.perf_counter()
    if args.stream:
        # streaming front: tokens surface per scheduler tick
        counts = {}
        t_first = None
        for sid, tok, done in eng.stream():
            if t_first is None:
                t_first = time.perf_counter() - t0
            counts[sid] = counts.get(sid, 0) + 1
        dt = time.perf_counter() - t0
        total_new = sum(counts.values())
        print(f"streamed {len(counts)} requests, {total_new} tokens in "
              f"{dt:.2f}s ({total_new / dt:.1f} tok/s, first token at "
              f"{t_first * 1e3:.0f} ms)")
    else:
        out = eng.run()
        dt = time.perf_counter() - t0
        total_new = sum(len(v) for v in out.values())
        print(f"served {len(out)} requests, {total_new} tokens in {dt:.2f}s "
              f"({total_new / dt:.1f} tok/s)")
    print("free blocks after drain:", eng.kv.num_free(), "/",
          eng.kv.num_blocks)


if __name__ == "__main__":
    main()
