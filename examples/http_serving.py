"""OpenAI-style HTTP serving demo (standalone, synthetic model).

Starts the stdlib HTTP server over an ``AsyncEngine``-wrapped continuous
batching engine, then exercises it the way a deployment would: concurrent
JSON completions from client threads (they share one device batch), an SSE
streaming request, and the metrics endpoint.

Run: ``python examples/http_serving.py``
"""

import http.client
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import jax.numpy as jnp

import vyomai_tpu as vt
from vyomai_tpu.serving import ContinuousBatchEngine
from vyomai_tpu.serving.http_server import make_server, serve_in_thread


def main():
    cfg = vt.QwenConfig(vocab_size=2048, hidden_size=256,
                        intermediate_size=1024, num_hidden_layers=4,
                        num_attention_heads=8, num_key_value_heads=4,
                        max_position_embeddings=512, qk_norm=True,
                        eos_token_id=-1, tie_word_embeddings=True)
    model = vt.ModelForCausalLM(cfg)
    params = model.init(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    engine = ContinuousBatchEngine(model, params, num_blocks=256,
                                   block_size=16, max_batch=8,
                                   max_new_tokens=32, decode_horizon=8,
                                   do_sample=True, temperature=0.8)
    server, aeng = make_server(engine)
    serve_in_thread(server)
    host, port = server.server_address
    print(f"[server] listening on http://{host}:{port}")

    def post(body):
        conn = http.client.HTTPConnection(host, port, timeout=120)
        conn.request("POST", "/v1/completions", json.dumps(body),
                     {"Content-Type": "application/json"})
        r = conn.getresponse()
        out = r.read()
        conn.close()
        return r.status, out

    # -- concurrent clients share the batch
    rng_prompts = [[3 + i, 17, 42 + i, 9] for i in range(6)]
    results = [None] * len(rng_prompts)

    def client(i):
        status, data = post({"prompt": rng_prompts[i], "max_tokens": 24,
                             "seed" if i % 2 else "ignore_eos":
                                 i if i % 2 else True})
        results[i] = (status, json.loads(data))

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client, args=(i,))
               for i in range(len(rng_prompts))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    n_tok = sum(len(r[1]["tokens"]) for r in results)
    assert all(r[0] == 200 for r in results)
    print(f"[batch] {len(rng_prompts)} concurrent HTTP requests -> "
          f"{n_tok} tokens in {dt:.2f}s")

    # -- SSE streaming
    conn = http.client.HTTPConnection(host, port, timeout=120)
    conn.request("POST", "/v1/completions",
                 json.dumps({"prompt": [5, 11, 19], "max_tokens": 8,
                             "stream": True}),
                 {"Content-Type": "application/json"})
    r = conn.getresponse()
    chunks = [ln for ln in r.read().decode().split("\n")
              if ln.startswith("data: ")]
    conn.close()
    print(f"[stream] {len(chunks) - 1} SSE token events, "
          f"terminator={chunks[-1][6:]}")

    conn = http.client.HTTPConnection(host, port, timeout=30)
    conn.request("GET", "/v1/metrics")
    mets = json.loads(conn.getresponse().read())
    conn.close()
    print(f"[metrics] completed={mets['requests_completed']} "
          f"tokens/s={mets['tokens_per_s']:.0f} "
          f"ttft_mean={mets['ttft_mean_s'] * 1e3:.0f}ms")

    server.shutdown()
    aeng.close()
    print("[done]")


if __name__ == "__main__":
    main()
