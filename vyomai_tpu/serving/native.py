"""ctypes binding for the native (C++) paged-KV block manager
(``csrc/kv_manager.cc``). Drop-in replacement for the Python
``PagedKVManager`` on the serving scheduler hot path; the Python class is
the reference implementation and fallback.

The shared library is built on demand with g++ (cached under
``csrc/build/``); ``available()`` reports whether the toolchain/binary is
usable.
"""

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from .kv_manager import SequenceState

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc",
                    "kv_manager.cc")
_SO = os.path.join(os.path.dirname(__file__), "..", "..", "csrc", "build",
                   "libkvmanager.so")
_lib = None
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    try:
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", _SRC,
             "-o", _SO],
            check=True, capture_output=True, text=True, timeout=120)
        return None
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired) as e:
        return getattr(e, "stderr", str(e)) or str(e)


def _load():
    global _lib, _build_error
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or \
            os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        _build_error = _build()
        if _build_error:
            return None
    lib = ctypes.CDLL(_SO)
    lib.kvm_create.restype = ctypes.c_void_p
    lib.kvm_create.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.kvm_destroy.argtypes = [ctypes.c_void_p]
    lib.kvm_num_free.restype = ctypes.c_int
    lib.kvm_num_free.argtypes = [ctypes.c_void_p]
    lib.kvm_begin.restype = ctypes.c_int
    lib.kvm_begin.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                              ctypes.POINTER(ctypes.c_int64), ctypes.c_int]
    lib.kvm_allocate.restype = ctypes.c_int
    lib.kvm_allocate.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                 ctypes.c_int]
    lib.kvm_append_token.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                     ctypes.c_int64]
    lib.kvm_block_table.restype = ctypes.c_int
    lib.kvm_block_table.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                    ctypes.POINTER(ctypes.c_int),
                                    ctypes.c_int]
    lib.kvm_num_cached_tokens.restype = ctypes.c_int
    lib.kvm_num_cached_tokens.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.kvm_free.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int]
    lib.kvm_peek.restype = ctypes.c_int
    lib.kvm_peek.argtypes = [ctypes.c_void_p,
                             ctypes.POINTER(ctypes.c_int64), ctypes.c_int]
    lib.kvm_stats.argtypes = [ctypes.c_void_p,
                              ctypes.POINTER(ctypes.c_int64)]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


class NativeKVManager:
    """Same scheduler-facing protocol as ``PagedKVManager``; per-sequence
    token/table state lives on the C++ side, mirrored into the
    ``SequenceState`` the engine already uses."""

    def __init__(self, num_blocks: int, block_size: int):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native kv_manager unavailable: {_build_error}")
        self._lib = lib
        self._h = ctypes.c_void_p(lib.kvm_create(num_blocks, block_size))
        self.num_blocks = num_blocks
        self.block_size = block_size
        self._registered = set()

    def __del__(self):
        try:
            self._lib.kvm_destroy(self._h)
        except Exception:
            pass

    def num_free(self) -> int:
        return self._lib.kvm_num_free(self._h)

    def blocks_needed(self, num_tokens: int) -> int:
        return -(-num_tokens // self.block_size)

    def _sync_table(self, state: SequenceState):
        cap = 4096
        buf = (ctypes.c_int * cap)()
        n = self._lib.kvm_block_table(self._h, state.seq_id, buf, cap)
        state.block_table = list(buf[:n])

    def match_prefix(self, state: SequenceState) -> int:
        # cache_salt shifts radix keys into a per-adapter namespace (the
        # C++ tree only ever sees salted ids — see SequenceState.cache_salt).
        # no_radix sequences still register via kvm_begin (allocate needs
        # it) but can never match: they carry the RESERVED salt id and no
        # sequence with that salt ever deposits (engine frees them with
        # cache_prefix=False), so the namespace stays empty by construction.
        arr = np.asarray(state.tokens[:state.prompt_len],
                         dtype=np.int64) + state.cache_salt
        covered = self._lib.kvm_begin(
            self._h, state.seq_id,
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(arr))
        self._registered.add(state.seq_id)
        state.num_cached_tokens = covered
        self._sync_table(state)
        return covered

    def peek_prefix(self, tokens, salt: int = 0) -> int:
        """Longest cached prefix for a prospective prompt (no side
        effects) — the scheduler's cache-aware-admission probe."""
        arr = np.asarray(tokens, dtype=np.int64) + salt
        return self._lib.kvm_peek(
            self._h, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(arr))

    def cache_stats(self) -> dict:
        buf = (ctypes.c_int64 * 4)()
        self._lib.kvm_stats(self._h, buf)
        return {"radix_lookups": int(buf[0]), "radix_hits": int(buf[1]),
                "radix_hit_blocks": int(buf[2]),
                "radix_evictions": int(buf[3])}

    def allocate(self, state: SequenceState, num_tokens: int) -> bool:
        if state.seq_id not in self._registered:
            # sequence without prefix-match phase (direct allocation)
            arr = np.asarray(state.tokens[:state.prompt_len],
                             dtype=np.int64) + state.cache_salt
            self._lib.kvm_begin(
                self._h, state.seq_id,
                arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(arr))
            self._registered.add(state.seq_id)
        # mirror any tokens appended since registration
        ok = bool(self._lib.kvm_allocate(self._h, state.seq_id, num_tokens))
        if ok:
            self._sync_table(state)
        return ok

    def append_token(self, state: SequenceState, token: int):
        self._lib.kvm_append_token(self._h, state.seq_id,
                                   token + state.cache_salt)

    def release_sequence(self, state: SequenceState):
        self._lib.kvm_free(self._h, state.seq_id, 0)
        self._registered.discard(state.seq_id)
        state.block_table = []
        state.cached_nodes = []
        state.num_cached_tokens = 0

    def free(self, state: SequenceState, *, cache_prefix: bool = True):
        # push tokens generated since registration so full blocks get cached
        n_known = state.prompt_len
        for tok in state.tokens[n_known:]:
            self._lib.kvm_append_token(self._h, state.seq_id,
                                       int(tok) + state.cache_salt)
        self._lib.kvm_free(self._h, state.seq_id, int(cache_prefix))
        self._registered.discard(state.seq_id)
        state.block_table = []
        state.cached_nodes = []
