"""Thread-safe daemon frontend for the continuous-batching engine.

``ContinuousBatchEngine`` is single-threaded by design (one scheduler, one
device stream). ``AsyncEngine`` puts it behind a background scheduler
thread so MANY client threads can submit concurrently and their requests
ride one shared batch — the role vLLM's ``AsyncLLMEngine`` plays around
its ``LLMEngine`` (reference N4 ``simple_vllm.ipynb`` runs a blocking
drain loop; a deployable server needs this layer).

Clients get a ``RequestHandle``:

- ``handle.result(timeout)`` blocks for the finished token list
  (+ logprobs on a ``return_logprobs`` engine);
- ``handle.stream(timeout)`` iterates ``(token_id, finished)`` pairs as
  scheduler ticks produce them (tokens arrive mid-generation);
- ``handle.abort()`` cancels wherever the request is; ``result`` then
  raises ``RequestAborted`` and ``stream`` ends.

The engine object must not be touched by other threads once handed over.
All engine calls (submit/step/abort/harvest) happen on the scheduler
thread; client threads only exchange messages through queues. Shut down
with ``close()`` (or use it as a context manager).
"""

import queue
import threading
import traceback
from collections import deque
from typing import Any, Dict, List, Optional, Tuple

__all__ = ["AsyncEngine", "RequestHandle", "RequestAborted"]

_DONE = object()          # sentinel on a handle's event queue


class RequestAborted(RuntimeError):
    """The request was cancelled via ``handle.abort()``."""


class RequestHandle:
    """Client-side view of one in-flight request (created by
    ``AsyncEngine.submit``; not instantiated directly)."""

    def __init__(self, owner: "AsyncEngine"):
        self._owner = owner
        self.seq_id: Optional[int] = None      # set by the scheduler thread
        self._events: "queue.Queue" = queue.Queue()
        self._done = threading.Event()
        self._tokens: List[int] = []
        self._logprobs: Optional[List[float]] = None
        self._aborted = False
        self._error: Optional[BaseException] = None

    # -- scheduler-thread side -------------------------------------------------
    def _deliver(self, tok: Optional[int], done: bool, logprobs=None):
        if tok is not None:
            self._tokens.append(tok)
            self._events.put((tok, done))
        elif done:
            self._events.put((None, True))
        if done:
            self._logprobs = logprobs
            self._events.put(_DONE)
            self._done.set()

    def _fail(self, exc: BaseException, aborted: bool = False):
        self._aborted = aborted
        self._error = exc
        self._events.put(_DONE)
        self._done.set()

    # -- client side -------------------------------------------------------------
    @property
    def aborted(self) -> bool:
        return self._aborted

    def result(self, timeout: Optional[float] = None):
        """Block until finished; returns the generated token list (or
        ``(tokens, logprobs)`` on a ``return_logprobs`` engine). Raises
        ``RequestAborted`` after ``abort()``, ``TimeoutError`` on
        timeout, and re-raises engine errors (e.g. bad submit args)."""
        if not self._done.wait(timeout):
            raise TimeoutError("request not finished within timeout")
        if self._error is not None:
            raise self._error
        if self._logprobs is not None:
            return list(self._tokens), list(self._logprobs)
        return list(self._tokens)

    def stream(self, timeout: Optional[float] = None):
        """Yield ``(token_id, finished)`` as the scheduler produces them.
        A stop-truncated zero-token completion yields ``(None, True)``
        (the engine's completion sentinel). Ends silently on abort."""
        while True:
            ev = self._events.get(timeout=timeout)
            if ev is _DONE:
                if self._error is not None and not self._aborted:
                    raise self._error
                return
            yield ev
            if ev[1]:
                return

    def abort(self):
        """Cancel the request (engine-side abort runs on the scheduler
        thread; already-finished requests are unaffected)."""
        self._owner._request_abort(self)


class AsyncEngine:
    """Own ``engine`` on a background scheduler thread; see module doc."""

    def __init__(self, engine, *, idle_wait_s: float = 0.05):
        self._eng = engine
        self._lock = threading.Lock()
        self._wake = threading.Event()
        self._pending: deque = deque()     # (handle, prompt, kwargs)
        self._aborts: deque = deque()      # handles
        self._handles: Dict[int, RequestHandle] = {}
        self._emitted: Dict[int, int] = {}
        self._idle_wait = idle_wait_s
        self._closed = False
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="vyomai-serving-scheduler")
        self._thread.start()

    # -- client API -------------------------------------------------------------
    def submit(self, prompt, **kwargs) -> RequestHandle:
        """Thread-safe ``engine.submit``; returns immediately with a
        ``RequestHandle``. Submit-time validation errors surface when the
        handle is consumed (``result``/``stream`` re-raise them)."""
        handle = RequestHandle(self)
        with self._lock:
            if self._closed:
                raise RuntimeError("AsyncEngine is closed")
            self._pending.append((handle, list(prompt), dict(kwargs)))
        self._wake.set()
        return handle

    def metrics(self) -> Dict[str, Any]:
        """Engine metrics snapshot (counters are plain ints updated only
        by the scheduler thread; reading them cross-thread is safe)."""
        return self._eng.metrics()

    def close(self, timeout: float = 10.0):
        """Stop the scheduler thread. In-flight requests are aborted."""
        with self._lock:
            self._closed = True
        self._wake.set()
        self._thread.join(timeout)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- scheduler thread ---------------------------------------------------------
    def _request_abort(self, handle: RequestHandle):
        with self._lock:
            self._aborts.append(handle)
        self._wake.set()

    def _drain_inbox(self):
        while True:
            with self._lock:
                if not self._pending and not self._aborts:
                    return
                item = self._pending.popleft() if self._pending else None
                ab = None if item else self._aborts.popleft()
            if item is not None:
                handle, prompt, kwargs = item
                try:
                    sid = self._eng.submit(prompt, **kwargs)
                except BaseException as e:          # surface at the handle
                    handle._fail(e)
                    continue
                handle.seq_id = sid
                self._handles[sid] = handle
            else:
                sid = ab.seq_id
                if sid is None or ab._done.is_set():
                    continue                        # never started / done
                self._eng.abort(sid)
                self._handles.pop(sid, None)
                self._emitted.pop(sid, None)
                ab._fail(RequestAborted("aborted"), aborted=True)

    def _fail_everything(self, exc: BaseException, aborted: bool):
        """Fail every tracked handle AND anything still queued in the inbox
        (a submit() can slip in between the scheduler's last drain and the
        closed check — its handle must not block a client forever)."""
        with self._lock:
            pending = list(self._pending)
            self._pending.clear()
            self._aborts.clear()
        for h in list(self._handles.values()):
            h._fail(exc, aborted=aborted)
        self._handles.clear()
        for handle, _, _ in pending:
            handle._fail(exc, aborted=aborted)

    def _loop(self):
        eng = self._eng
        while True:
            try:
                self._drain_inbox()
                with self._lock:
                    closing = self._closed
                if closing:
                    self._fail_everything(RequestAborted("engine closed"),
                                          aborted=True)
                    return
                if not (eng.waiting or eng.active or eng.needs_prefill):
                    self._wake.wait(self._idle_wait)
                    self._wake.clear()
                    continue
                eng.step()
                events = eng.poll_events(self._emitted)
            except BaseException as e:
                # a dead scheduler thread must not strand clients: fail
                # everything with the real error and refuse new work
                # (the error reaches every handle; print for server logs)
                with self._lock:
                    self._closed = True
                self._fail_everything(e, aborted=False)
                traceback.print_exc()
                return
            for sid, tok, done in events:
                h = self._handles.get(sid)
                if h is None:
                    continue                       # untracked (aborted race)
                lps = None
                if done and eng.return_logprobs:
                    st = eng.finished.get(sid)
                    if st is not None:
                        lps = list(st.logprobs)
                h._deliver(tok, done, logprobs=lps)
                if done:
                    self._handles.pop(sid, None)
