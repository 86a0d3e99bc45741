"""Overhead of the production serving features (real TPU chip).

Runs the SAME workload (32 requests x 64 new tokens, horizon decode)
through the continuous-batching engine in five configurations and reports
tokens/s for each, so the cost of every feature is a number, not a guess:

  plain       — greedy baseline
  logprobs    — + per-token logprob tracking (adds a log_softmax/step)
  guided      — + a JSON-schema FSM on half the requests (one [V] gather
                + mask per step, host grammar mirror per token)
  multilora   — + 4 LoRA adapters, requests round-robined across them
                (two rank-16 matmuls per linear per step)
  penalties   — + presence/frequency penalties on all requests
                ([B, V] count scatter + two fused multiplies per step)

Prints one human-readable block + one JSON line:
  {"metric": "serving_features", "plain": ..., "logprobs": ...,
   "guided": ..., "multilora": ..., "penalties": ...}
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

VOCAB = 32_768
CFG = vt.QwenConfig(
    vocab_size=VOCAB, hidden_size=1024, intermediate_size=4096,
    num_hidden_layers=8, num_attention_heads=16, num_key_value_heads=4,
    head_dim=64, max_position_embeddings=1024, qk_norm=True,
    eos_token_id=-1, tie_word_embeddings=True)

ENGINE_KW = dict(num_blocks=2048, block_size=32, max_batch=32,
                 max_blocks_per_seq=16, max_new_tokens=64,
                 decode_horizon=32, prefill_buckets=(32, 64, 128))


def run_config(model, params, rng, *, requests=32, penalize=False, **extra):
    eng = ContinuousBatchEngine(model, params, **ENGINE_KW, **extra)
    prompts = [list(rng.integers(5, VOCAB, size=int(rng.integers(16, 96))))
               for _ in range(requests)]
    sids = []
    for i, p in enumerate(prompts):
        kw = {}
        if "fsms" in extra and i % 2 == 0:
            kw["fsm_id"] = 0
        if "loras" in extra:
            kw["lora_id"] = i % len(extra["loras"])
        if penalize:
            kw.update(presence_penalty=0.4, frequency_penalty=0.1)
        sids.append(eng.submit(p, **kw))
    t0 = time.perf_counter()
    out = eng.run()
    dt = time.perf_counter() - t0
    toks = sum(len(out[s]) for s in sids)
    return toks / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=32)
    args = ap.parse_args()

    model = vt.ModelForCausalLM(CFG)
    params = model.init(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)

    # grammar: {"label":<int 0-99>,"ok":<bool>} lifted to a toy token map
    # over the REAL vocab size (ids 10-59 spell the JSON alphabet)
    alphabet = list('{}[]":,-0123456789abcdefghijklmnopqrstuvwxyz')
    tok_strings = [None] * VOCAB
    for i, ch in enumerate(sorted(set(alphabet))):
        tok_strings[10 + i] = ch
    schema = {"type": "object",
              "properties": {"label": {"type": "integer"},
                             "ok": {"type": "boolean"}},
              "required": ["label", "ok"]}
    fsm = vt.fsm_from_json_schema(schema, tok_strings, eos_token_id=2)

    loras = []
    for i in range(4):
        ad = vt.inject_lora(params, jax.random.PRNGKey(10 + i), rank=16)
        ad["tree"] = jax.tree_util.tree_map(
            lambda x: (jax.random.normal(jax.random.fold_in(
                jax.random.PRNGKey(40 + i), x.size), x.shape)
                * 0.02).astype(x.dtype), ad["tree"])
        loras.append(ad)

    results = {}
    for name, penalize, extra in [
        ("plain", False, {}),
        ("logprobs", False, {"return_logprobs": True}),
        ("guided", False, {"fsms": [fsm], "eos_token_id": 2}),
        ("multilora", False, {"loras": loras}),
        ("penalties", True, {}),
    ]:
        # warmup (compiles), then the measured pass
        run_config(model, params, np.random.default_rng(0),
                   requests=8, penalize=penalize, **extra)
        rate = run_config(model, params, np.random.default_rng(1),
                          requests=args.requests, penalize=penalize,
                          **extra)
        results[name] = round(rate, 1)
        rel = rate / results["plain"] if "plain" in results else 1.0
        print(f"{name:10s} {rate:9.1f} tok/s   ({rel:.3f}x of plain)")

    print(json.dumps({"metric": "serving_features", **results}))


if __name__ == "__main__":
    main()
