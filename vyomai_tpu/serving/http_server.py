"""Minimal OpenAI-style HTTP completion server over ``AsyncEngine``.

Standard-library only (``http.server``): no framework dependency, which is
what this image allows. Concurrent HTTP requests batch together on the one
engine via ``AsyncEngine`` — the deployable face of reference N4's
mini-vLLM (``simple_vllm.ipynb`` drains a notebook loop; vLLM ships
``api_server``).

Endpoints:

- ``POST /v1/completions`` — body is JSON. ``prompt`` is a token-id list,
  or a string when the server was built with a ``tokenize`` callable.
  Optional fields map 1:1 onto ``ContinuousBatchEngine.submit`` kwargs:
  ``max_tokens`` -> ``max_new_tokens``, plus ``temperature``, ``top_p``,
  ``min_p``, ``seed``, ``stop`` (list of token-id lists),
  ``presence_penalty``, ``frequency_penalty``, ``repetition_penalty``,
  ``min_tokens``, ``ignore_eos``, ``logit_bias``, ``best_of``.
  Response: ``{"id", "tokens", ["text"], ["logprobs"]}``.
  With ``"stream": true`` the response is Server-Sent Events: one
  ``data: {"token": t, "finished": bool}`` chunk per generated token,
  then ``data: [DONE]`` (the OpenAI streaming shape at token level).
- ``POST /v1/chat/completions`` — OpenAI chat shape: ``messages`` is a
  list of ``{"role", "content"}`` dicts, rendered through
  ``chat.build_chat_prompt`` (Qwen ``<|im_start|>`` turn layout). Needs a
  server built with ``tokenize`` and ``chat_ids``. Same optional sampling
  fields as ``/v1/completions``; response carries
  ``choices[0].message.content`` (with a ``detokenize``) plus the raw
  ``tokens``; ``"stream": true`` emits the same SSE token chunks.
- ``POST /v1/embeddings`` — OpenAI embeddings shape: ``input`` is one
  prompt or a list (strings with a server-side ``tokenize``, else
  token-id lists); response ``{"object": "list", "data": [{"index",
  "embedding"}, ...]}``. Enabled when the server is built with
  ``embed_model=``/``embed_params=`` (any model ``serving.embed_batch``
  accepts — the generation model itself with ``"last"`` pooling, or a
  dedicated encoder with ``"mean"``).
- ``GET /v1/metrics`` — the engine's ``metrics()`` snapshot as JSON.

Build one with :func:`make_server` and drive it with ``serve_forever`` in
a thread (see ``examples/http_serving.py`` and ``tests/test_http_server``).
"""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, List, Optional

from .async_engine import AsyncEngine, RequestAborted

__all__ = ["make_server", "CompletionHandler"]

_SUBMIT_FIELDS = {
    "max_tokens": "max_new_tokens",
    "temperature": "temperature",
    "top_p": "top_p",
    "min_p": "min_p",
    "seed": "seed",
    "stop": "stop",
    "presence_penalty": "presence_penalty",
    "frequency_penalty": "frequency_penalty",
    "repetition_penalty": "repetition_penalty",
    "min_tokens": "min_tokens",
    "ignore_eos": "ignore_eos",
    "logit_bias": "logit_bias",
    "best_of": "best_of",
}


class CompletionHandler(BaseHTTPRequestHandler):
    """Request handler bound to an ``AsyncEngine`` via ``make_server``."""

    async_engine: AsyncEngine = None          # set by make_server
    tokenize: Optional[Callable[[str], List[int]]] = None
    detokenize: Optional[Callable[[List[int]], str]] = None
    chat_ids: Optional[dict] = None           # im_start/im_end/newline ids
    embed_model = None                        # enables /v1/embeddings
    embed_params = None
    embed_pooling: str = "last"
    protocol_version = "HTTP/1.1"

    def log_message(self, fmt, *args):        # quiet by default
        pass

    def _json(self, code: int, obj):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/v1/metrics":
            return self._json(200, self.async_engine.metrics())
        return self._json(404, {"error": "unknown path"})

    def _chat_prompt(self, req):
        """Render OpenAI ``messages`` into token ids, or raise ValueError."""
        from .chat import build_chat_prompt
        if self.tokenize is None or not self.chat_ids:
            raise ValueError("chat completions need a server built with "
                             "tokenize= and chat_ids=")
        messages = req.get("messages")
        if (not isinstance(messages, list) or not messages or
                not all(isinstance(m, dict) and "role" in m and "content"
                        in m for m in messages)):
            raise ValueError("messages must be a non-empty list of "
                             "{role, content} objects")
        return build_chat_prompt(
            [(m["role"], m["content"]) for m in messages], self.tokenize,
            im_start_id=self.chat_ids["im_start_id"],
            im_end_id=self.chat_ids["im_end_id"],
            newline_id=self.chat_ids["newline_id"],
            assistant_role_ids=self.chat_ids.get("assistant_role_ids", ()))

    def _embeddings(self, req):
        if self.embed_model is None:
            return self._json(400, {"error": "embeddings need a server "
                                             "built with embed_model="})
        inputs = req.get("input")
        single = isinstance(inputs, str) or (
            isinstance(inputs, list) and inputs
            and isinstance(inputs[0], int))
        items = [inputs] if single else (inputs or [])
        prompts = []
        for it in items:
            if isinstance(it, str):
                if self.tokenize is None:
                    return self._json(400, {"error": "string input needs a "
                                                     "server-side tokenizer"})
                it = self.tokenize(it)
            if not isinstance(it, list) or not it or \
                    not all(isinstance(t, int) for t in it):
                return self._json(400, {"error": "input must be strings or "
                                                 "non-empty token-id lists"})
            prompts.append(it)
        if not prompts:
            return self._json(400, {"error": "empty input"})
        from .embedding import embed_batch
        try:
            vecs = embed_batch(self.embed_model, self.embed_params, prompts,
                               pooling=req.get("pooling",
                                               self.embed_pooling))
        except ValueError as e:
            return self._json(400, {"error": str(e)})
        return self._json(200, {
            "object": "list",
            "data": [{"object": "embedding", "index": i,
                      "embedding": [float(x) for x in v]}
                     for i, v in enumerate(vecs)]})

    def do_POST(self):
        chat = self.path == "/v1/chat/completions"
        if self.path not in ("/v1/completions", "/v1/embeddings") \
                and not chat:
            return self._json(404, {"error": "unknown path"})
        try:
            length = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(length) or b"{}")
        except (ValueError, json.JSONDecodeError):
            return self._json(400, {"error": "malformed JSON body"})
        if self.path == "/v1/embeddings":
            return self._embeddings(req)

        if chat:
            try:
                prompt = self._chat_prompt(req)
            except ValueError as e:
                return self._json(400, {"error": str(e)})
        else:
            prompt = req.get("prompt")
            if isinstance(prompt, str):
                if self.tokenize is None:
                    return self._json(400, {"error": "string prompt needs a "
                                                     "server-side tokenizer"})
                try:
                    prompt = self.tokenize(prompt)
                except Exception as e:
                    return self._json(
                        400, {"error": f"tokenizer failed: {e!r}"})
        if not isinstance(prompt, list) or not prompt or \
                not all(isinstance(t, int) for t in prompt):
            return self._json(400, {"error": "prompt must be a non-empty "
                                             "token-id list (or a string "
                                             "with a tokenizer)"})
        kwargs = {}
        for field, kw in _SUBMIT_FIELDS.items():
            if field in req:
                kwargs[kw] = req[field]
        if kwargs.get("logit_bias") is not None:
            try:
                kwargs["logit_bias"] = {int(k): float(v) for k, v in
                                        kwargs["logit_bias"].items()}
            except (AttributeError, ValueError):
                return self._json(400, {"error": "logit_bias must map "
                                                 "token ids to floats"})
        handle = self.async_engine.submit(prompt, **kwargs)

        if req.get("stream"):
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()

            def chunk(payload: str):
                data = f"data: {payload}\n\n".encode()
                self.wfile.write(hex(len(data))[2:].encode() + b"\r\n"
                                 + data + b"\r\n")
                self.wfile.flush()

            try:
                for tok, done in handle.stream():
                    chunk(json.dumps({"token": tok, "finished": done}))
            except (RequestAborted, ValueError, TypeError) as e:
                # TypeError covers malformed numeric fields in untrusted
                # JSON (e.g. max_tokens: "8") surfacing from engine.submit
                chunk(json.dumps({"error": str(e)}))
            chunk("[DONE]")
            self.wfile.write(b"0\r\n\r\n")
            return

        try:
            out = handle.result()
        except RequestAborted:
            return self._json(499, {"error": "request aborted"})
        except (ValueError, TypeError) as e:      # submit-time validation
            # TypeError: malformed numeric fields in untrusted JSON (e.g.
            # max_tokens: "8") — a 400, not a dropped connection
            return self._json(400, {"error": str(e)})
        tokens, logprobs = (out if isinstance(out, tuple) else (out, None))
        resp = {"id": handle.seq_id, "tokens": tokens}
        if logprobs is not None:
            resp["logprobs"] = logprobs
        if self.detokenize is not None:
            text = self.detokenize(tokens)
            if chat:
                resp["choices"] = [{"index": 0, "message":
                                    {"role": "assistant", "content": text}}]
            else:
                resp["text"] = text
        self._json(200, resp)


def make_server(engine, host: str = "127.0.0.1", port: int = 0, *,
                tokenize: Optional[Callable[[str], List[int]]] = None,
                detokenize: Optional[Callable[[List[int]], str]] = None,
                chat_ids: Optional[dict] = None, embed_model=None,
                embed_params=None, embed_pooling: str = "last"):
    """Wrap ``engine`` (a ``ContinuousBatchEngine``) in an ``AsyncEngine``
    and return ``(ThreadingHTTPServer, AsyncEngine)``. ``port=0`` picks a
    free port (read it from ``server.server_address``). The caller runs
    ``server.serve_forever()`` (usually in a thread) and shuts down with
    ``server.shutdown(); async_engine.close()``. ``chat_ids`` (dict with
    ``im_start_id``/``im_end_id``/``newline_id`` and optional
    ``assistant_role_ids``) enables ``/v1/chat/completions``;
    ``embed_model``/``embed_params`` enable ``/v1/embeddings``."""
    aeng = AsyncEngine(engine)
    handler = type("BoundCompletionHandler", (CompletionHandler,),
                   {"async_engine": aeng, "tokenize": staticmethod(tokenize)
                    if tokenize else None,
                    "detokenize": staticmethod(detokenize)
                    if detokenize else None,
                    "chat_ids": chat_ids, "embed_model": embed_model,
                    "embed_params": embed_params,
                    "embed_pooling": embed_pooling})
    server = ThreadingHTTPServer((host, port), handler)
    return server, aeng


def serve_in_thread(server) -> threading.Thread:
    """Convenience: start ``server.serve_forever()`` on a daemon thread."""
    t = threading.Thread(target=server.serve_forever, daemon=True,
                         name="vyomai-http-server")
    t.start()
    return t
