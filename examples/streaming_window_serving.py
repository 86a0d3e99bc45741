"""Streaming long-context serving demo: sliding-window attention +
StreamingLLM sinks + out-of-band block reclaim.

Shows the bounded-KV serving story end-to-end:
- a model configured with ``sliding_window`` + ``attention_sinks``;
- the engine streaming tokens (``engine.stream()``) for generations whose
  TOTAL length exceeds the KV pool — out-of-band blocks recycle as the
  band advances, so the run completes preemption-free;
- greedy output asserted token-exact against dense cached decode (the
  reclaim is a pure memory optimization).

Synthetic weights; run directly: ``python examples/streaming_window_serving.py``.
"""

import argparse

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import vyomai_tpu as vt
from vyomai_tpu.generation import generate
from vyomai_tpu.serving import ContinuousBatchEngine


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=64)
    ap.add_argument("--sinks", type=int, default=8)
    ap.add_argument("--max-new", type=int, default=160)
    ap.add_argument("--num-blocks", type=int, default=12,
                    help="pool size in blocks (deliberately smaller than "
                         "the generation's total footprint)")
    args = ap.parse_args()

    cfg = vt.QwenConfig(vocab_size=2048, hidden_size=128,
                        intermediate_size=256, num_hidden_layers=4,
                        num_attention_heads=4, num_key_value_heads=2,
                        head_dim=32, max_position_embeddings=512,
                        sliding_window=args.window,
                        attention_sinks=args.sinks)
    model = vt.ModelForCausalLM(cfg)
    params = model.init(jax.random.PRNGKey(0), dtype=jnp.float32)

    bs = 16
    eng = ContinuousBatchEngine(model, params, num_blocks=args.num_blocks,
                                block_size=bs, max_batch=2,
                                max_blocks_per_seq=32,
                                max_new_tokens=args.max_new,
                                decode_horizon=8, dtype=jnp.float32,
                                kv_backend="python",
                                prefill_buckets=(64, 128))
    rng = np.random.default_rng(0)
    prompt = list(rng.integers(5, 2048, size=90))
    total = len(prompt) + args.max_new
    print(f"pool: {args.num_blocks} blocks x {bs} = "
          f"{args.num_blocks * bs} token slots")
    print(f"request: {len(prompt)} prompt + {args.max_new} new = {total} "
          f"positions ({-(-total // bs)} blocks if nothing were freed)")

    sid = eng.submit(prompt)
    got = []
    for s, tok, done in eng.stream():
        got.append(tok)
        if len(got) % 40 == 0:
            print(f"  streamed {len(got):4d} tokens   "
                  f"free blocks: {eng.kv.num_free():3d}")
    m = eng.metrics()
    print(f"done: {len(got)} tokens, preemptions={m['preemptions']}, "
          f"ttft={m['ttft_mean_s']*1e3:.0f} ms")
    assert m["preemptions"] == 0, "window reclaim should avoid preemption"

    dense = generate(model, params, jnp.asarray([prompt]),
                     max_new_tokens=args.max_new, use_cache=True)
    assert got == np.asarray(dense)[0, len(prompt):].tolist(), \
        "streamed output must be token-exact vs dense windowed decode"
    print("token-exact vs dense windowed decode — bounded-KV streaming OK")


if __name__ == "__main__":
    main()
