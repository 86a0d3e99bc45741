"""AsyncEngine (thread-safe daemon frontend) + the OpenAI-style HTTP
server: concurrent client threads batch onto one engine, results are
token-exact vs the synchronous engine, aborts/validation surface at the
handle, and the HTTP layer round-trips JSON + SSE streaming."""

import http.client
import json
import threading

import jax
import jax.numpy as jnp
import pytest

import vyomai_tpu as vt
from vyomai_tpu.serving import (AsyncEngine, ContinuousBatchEngine,
                                RequestAborted)
from vyomai_tpu.serving.http_server import make_server, serve_in_thread

QCFG = vt.QwenConfig(vocab_size=512, hidden_size=64, intermediate_size=128,
                     num_hidden_layers=2, num_attention_heads=4,
                     num_key_value_heads=2, head_dim=32,
                     max_position_embeddings=256, qk_norm=True,
                     eos_token_id=9999, tie_word_embeddings=True)

PROMPTS = [[3, 17, 42, 9], [5, 11], [2, 3, 5, 7, 11, 13], [63, 1, 250]]


@pytest.fixture(scope="module")
def qwen():
    model = vt.ModelForCausalLM(QCFG)
    params = model.init(jax.random.PRNGKey(2), dtype=jnp.float32)
    return model, params


def _engine(model, params, **kw):
    return ContinuousBatchEngine(model, params, num_blocks=64, block_size=8,
                                 max_batch=4, max_new_tokens=8,
                                 dtype=jnp.float32, **kw)


def _sync_ref(model, params, prompts, **kw):
    eng = _engine(model, params, **kw)
    sids = [eng.submit(p) for p in prompts]
    out = eng.run()
    return [out[s] for s in sids]


def test_async_single_and_concurrent(qwen):
    """Results through AsyncEngine == the synchronous engine, for one
    request and for many submitted from separate client threads."""
    model, params = qwen
    ref = _sync_ref(model, params, PROMPTS)

    with AsyncEngine(_engine(model, params)) as aeng:
        assert aeng.submit(PROMPTS[0]).result(timeout=60) == ref[0]

        got = [None] * len(PROMPTS)

        def client(i):
            got[i] = aeng.submit(PROMPTS[i]).result(timeout=60)

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(len(PROMPTS))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(60)
        assert got == ref
        m = aeng.metrics()
        assert m["requests_completed"] == len(PROMPTS) + 1


def test_async_stream_and_logprobs(qwen):
    """handle.stream() yields every token with the finished flag on the
    last; a return_logprobs engine returns (tokens, logprobs)."""
    model, params = qwen
    ref = _sync_ref(model, params, PROMPTS[:1])[0]
    with AsyncEngine(_engine(model, params)) as aeng:
        h = aeng.submit(PROMPTS[0])
        toks, dones = [], []
        for tok, done in h.stream(timeout=60):
            toks.append(tok)
            dones.append(done)
        assert toks == ref
        assert dones == [False] * (len(ref) - 1) + [True]
        assert h.result(timeout=1) == ref   # result after stream still works

    with AsyncEngine(_engine(model, params, return_logprobs=True)) as aeng:
        toks, lps = aeng.submit(PROMPTS[0]).result(timeout=60)
        assert toks == ref and len(lps) == len(ref)


def test_async_abort_and_validation(qwen):
    """abort() raises RequestAborted at the handle; submit-time validation
    errors surface at result() on the calling thread."""
    model, params = qwen
    with AsyncEngine(_engine(model, params)) as aeng:
        h = aeng.submit(PROMPTS[0], max_new_tokens=8)
        h.abort()
        with pytest.raises(RequestAborted):
            h.result(timeout=60)
        assert h.aborted
        # engine keeps serving afterwards
        ref = _sync_ref(model, params, PROMPTS[:1])[0]
        assert aeng.submit(PROMPTS[0]).result(timeout=60) == ref
        # bad args: ValueError crosses the thread boundary
        bad = aeng.submit([])
        with pytest.raises(ValueError, match="empty prompt"):
            bad.result(timeout=60)


def test_async_close_aborts_inflight(qwen):
    model, params = qwen
    aeng = AsyncEngine(_engine(model, params))
    h = aeng.submit(PROMPTS[0])
    aeng.close()
    with pytest.raises((RequestAborted, RuntimeError)):
        h.result(timeout=5)
    with pytest.raises(RuntimeError, match="closed"):
        aeng.submit(PROMPTS[0])


@pytest.fixture()
def http_srv(qwen):
    model, params = qwen
    vocab = {"a": 3, "b": 17, "c": 42, "d": 9}
    rev = {v: k for k, v in vocab.items()}
    server, aeng = make_server(
        _engine(model, params, return_logprobs=True),
        tokenize=lambda s: [vocab[ch] for ch in s],
        detokenize=lambda ids: "".join(rev.get(t, "?") for t in ids))
    serve_in_thread(server)
    host, port = server.server_address
    yield host, port
    server.shutdown()
    aeng.close()


def _post(host, port, path, body):
    conn = http.client.HTTPConnection(host, port, timeout=60)
    conn.request("POST", path, json.dumps(body),
                 {"Content-Type": "application/json"})
    r = conn.getresponse()
    data = r.read()
    conn.close()
    return r.status, data


def test_http_completions_roundtrip(qwen, http_srv):
    model, params = qwen
    host, port = http_srv
    ref = _sync_ref(model, params, PROMPTS[:1], return_logprobs=True)[0]

    status, data = _post(host, port, "/v1/completions",
                         {"prompt": PROMPTS[0], "max_tokens": 8})
    assert status == 200
    out = json.loads(data)
    assert out["tokens"] == ref
    assert len(out["logprobs"]) == len(ref)
    assert isinstance(out["text"], str)

    # string prompt through the server-side tokenizer ("abcd" == PROMPTS[0])
    status, data = _post(host, port, "/v1/completions", {"prompt": "abcd"})
    assert status == 200 and json.loads(data)["tokens"] == ref

    # metrics endpoint
    conn = http.client.HTTPConnection(host, port, timeout=60)
    conn.request("GET", "/v1/metrics")
    r = conn.getresponse()
    mets = json.loads(r.read())
    conn.close()
    assert mets["requests_completed"] >= 2

    # malformed requests
    assert _post(host, port, "/v1/completions", {"prompt": "zz!"})[0] \
        in (400, 500)
    assert _post(host, port, "/v1/completions", {"prompt": []})[0] == 400
    assert _post(host, port, "/v1/nope", {})[0] == 404


def test_http_concurrent_requests_share_the_batch(qwen, http_srv):
    model, params = qwen
    host, port = http_srv
    ref = _sync_ref(model, params, PROMPTS, return_logprobs=True)
    got = [None] * len(PROMPTS)

    def client(i):
        status, data = _post(host, port, "/v1/completions",
                             {"prompt": PROMPTS[i]})
        assert status == 200
        got[i] = json.loads(data)["tokens"]

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(len(PROMPTS))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(120)
    assert got == ref


@pytest.fixture()
def chat_srv(qwen):
    model, params = qwen

    def tok(s):
        return [ord(ch) % 500 for ch in s]

    server, aeng = make_server(
        _engine(model, params), tokenize=tok,
        detokenize=lambda ids: "".join(
            chr(t) if 32 <= t < 127 else "?" for t in ids),
        chat_ids={"im_start_id": 501, "im_end_id": 502, "newline_id": 10})
    serve_in_thread(server)
    host, port = server.server_address
    yield host, port, tok
    server.shutdown()
    aeng.close()


def test_http_chat_completions(qwen, chat_srv):
    """/v1/chat/completions renders messages through the chat template and
    serves the same tokens as the synchronous engine on that prompt."""
    from vyomai_tpu.serving.chat import build_chat_prompt
    model, params = qwen
    host, port, tok = chat_srv
    messages = [{"role": "system", "content": "be brief"},
                {"role": "user", "content": "hi"}]
    prompt = build_chat_prompt([(m["role"], m["content"]) for m in messages],
                               tok, im_start_id=501, im_end_id=502,
                               newline_id=10)
    ref = _sync_ref(model, params, [prompt])[0]

    status, data = _post(host, port, "/v1/chat/completions",
                         {"messages": messages, "max_tokens": 8})
    assert status == 200
    out = json.loads(data)
    assert out["tokens"] == ref
    assert out["choices"][0]["message"]["role"] == "assistant"
    assert isinstance(out["choices"][0]["message"]["content"], str)

    # malformed message shapes
    assert _post(host, port, "/v1/chat/completions",
                 {"messages": []})[0] == 400
    assert _post(host, port, "/v1/chat/completions",
                 {"messages": [{"role": "user"}]})[0] == 400


def test_http_chat_requires_chat_ids(qwen, http_srv):
    host, port = http_srv
    status, data = _post(host, port, "/v1/chat/completions",
                         {"messages": [{"role": "user", "content": "a"}]})
    assert status == 400 and "chat_ids" in json.loads(data)["error"]


def test_http_streaming_sse(qwen, http_srv):
    model, params = qwen
    host, port = http_srv
    ref = _sync_ref(model, params, PROMPTS[:1], return_logprobs=True)[0]
    conn = http.client.HTTPConnection(host, port, timeout=60)
    conn.request("POST", "/v1/completions",
                 json.dumps({"prompt": PROMPTS[0], "stream": True}),
                 {"Content-Type": "application/json"})
    r = conn.getresponse()
    assert r.status == 200
    assert r.getheader("Content-Type") == "text/event-stream"
    raw = r.read().decode()
    conn.close()
    events = [line[len("data: "):] for line in raw.split("\n")
              if line.startswith("data: ")]
    assert events[-1] == "[DONE]"
    toks = [json.loads(e) for e in events[:-1]]
    assert [t["token"] for t in toks] == ref
    assert [t["finished"] for t in toks] == \
        [False] * (len(ref) - 1) + [True]


class _BoomEngine:
    """Minimal engine stub whose step() raises: the scheduler thread must
    fail every handle (tracked AND still-queued) instead of stranding
    blocked clients, then refuse new work."""
    active: dict = {}
    needs_prefill: list = []
    return_logprobs = False
    finished: dict = {}

    def __init__(self):
        self.waiting = []
        self._n = 0

    def submit(self, prompt, **kw):
        self._n += 1
        self.waiting.append(self._n)
        return self._n

    def step(self):
        raise RuntimeError("boom: device fell over")

    def poll_events(self, emitted):
        return []

    def metrics(self):
        return {}


def test_async_scheduler_crash_fails_handles():
    aeng = AsyncEngine(_BoomEngine())
    h = aeng.submit([1, 2, 3])
    with pytest.raises(RuntimeError, match="boom"):
        h.result(timeout=30)
    aeng._thread.join(timeout=30)
    with pytest.raises(RuntimeError, match="closed"):
        aeng.submit([4])


def test_http_bad_numeric_field_is_400(qwen, http_srv):
    """Malformed numeric fields in untrusted JSON (TypeError from submit
    validation) must come back as a 400 JSON error, not a dropped
    connection."""
    host, port = http_srv
    status, data = _post(host, port, "/v1/completions",
                         {"prompt": [3, 17], "max_tokens": "8"})
    assert status == 400
    assert b"error" in data


@pytest.fixture()
def http_srv_embed(qwen):
    model, params = qwen
    vocab = {"a": 3, "b": 17, "c": 42, "d": 9}
    server, aeng = make_server(
        _engine(model, params),
        tokenize=lambda s: [vocab[ch] for ch in s],
        embed_model=model, embed_params=params, embed_pooling="last")
    serve_in_thread(server)
    host, port = server.server_address
    yield host, port
    server.shutdown()
    aeng.close()


def test_http_embeddings(qwen, http_srv_embed):
    """/v1/embeddings: OpenAI shape, values match serving.embed_batch."""
    import numpy as np
    from vyomai_tpu.serving import embed_batch
    model, params = qwen
    host, port = http_srv_embed
    prompts = [[3, 17, 42], [9, 5, 11, 13]]
    ref = embed_batch(model, params, prompts, pooling="last")

    status, data = _post(host, port, "/v1/embeddings", {"input": prompts})
    assert status == 200
    out = json.loads(data)
    assert out["object"] == "list" and len(out["data"]) == 2
    for i, item in enumerate(out["data"]):
        assert item["index"] == i
        np.testing.assert_allclose(np.asarray(item["embedding"]),
                                   ref[i], atol=1e-6)

    # single string input through the server-side tokenizer
    status, data = _post(host, port, "/v1/embeddings", {"input": "abc"})
    assert status == 200
    one = json.loads(data)["data"]
    np.testing.assert_allclose(
        np.asarray(one[0]["embedding"]),
        embed_batch(model, params, [[3, 17, 42]], pooling="last")[0],
        atol=1e-6)

    # validation
    assert _post(host, port, "/v1/embeddings", {"input": []})[0] == 400
    assert _post(host, port, "/v1/embeddings",
                 {"input": [["x"]]})[0] == 400


def test_http_embeddings_disabled(qwen, http_srv):
    host, port = http_srv
    status, data = _post(host, port, "/v1/embeddings", {"input": [[3]]})
    assert status == 400 and "embed_model" in json.loads(data)["error"]
