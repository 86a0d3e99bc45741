"""Native background batch loader for fixed-block LM training
(``csrc/data_loader.cc``) with a bit-identical Python fallback.

The reference feeds training from a pure-Python ``LanguageModeling``
dataset + torch DataLoader (``pretraining/collators.py:108-165``). On this
rig the host has one CPU core, so batch assembly competes with the driver
loop; the native loader packs shuffled fixed-length blocks into a ring of
buffers on a producer thread so batch prep overlaps device steps, and the
Python side reads ready buffers zero-copy via ctypes.

Determinism contract (shared by both implementations and pinned by
``tests/test_native_data.py``): each epoch's block order is a Fisher-Yates
shuffle driven by splitmix64 seeded with ``seed ^ (epoch *
0x9E3779B97F4A7C15)``, Lemire-bounded draws. Same (tokens, batch, seq,
seed) -> same batch stream, native or not.
"""

import ctypes
import os
import subprocess
from typing import Iterator, Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc",
                    "data_loader.cc")
_SO = os.path.join(os.path.dirname(__file__), "..", "..", "csrc", "build",
                   "libdataloader.so")
_lib = None
_build_error: Optional[str] = None

_MASK = (1 << 64) - 1
_GOLDEN = 0x9E3779B97F4A7C15


def _build() -> Optional[str]:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    try:
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-pthread",
             _SRC, "-o", _SO],
            check=True, capture_output=True, text=True, timeout=120)
        return None
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired) as e:
        return getattr(e, "stderr", str(e)) or str(e)


def _load():
    global _lib, _build_error
    if _lib is not None:
        return _lib
    if _build_error is not None:
        # fail fast: a failed build would otherwise be re-attempted (up to
        # the 120 s g++ timeout) on EVERY available()/loader construction
        return None
    if not os.path.exists(_SO) or \
            os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        _build_error = _build()
        if _build_error:
            return None
    lib = ctypes.CDLL(_SO)
    lib.vyom_loader_create.restype = ctypes.c_void_p
    lib.vyom_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int,
        ctypes.c_int, ctypes.c_uint64, ctypes.c_int]
    lib.vyom_loader_batches_per_epoch.restype = ctypes.c_int64
    lib.vyom_loader_batches_per_epoch.argtypes = [ctypes.c_void_p]
    lib.vyom_loader_next.restype = ctypes.POINTER(ctypes.c_int32)
    lib.vyom_loader_next.argtypes = [ctypes.c_void_p]
    lib.vyom_loader_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def build_error() -> Optional[str]:
    _load()
    return _build_error


def _splitmix64(state: int):
    state = (state + _GOLDEN) & _MASK
    z = state
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _MASK
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _MASK
    return state, z ^ (z >> 31)


def _epoch_order(n_blocks: int, seed: int, epoch: int) -> np.ndarray:
    """Fisher-Yates with splitmix64 + Lemire bounded draws — the exact
    sequence the C++ producer generates."""
    order = np.arange(n_blocks, dtype=np.int64)
    state = (seed ^ ((epoch * _GOLDEN) & _MASK)) & _MASK
    for i in range(n_blocks - 1, 0, -1):
        state, r = _splitmix64(state)
        j = (r * (i + 1)) >> 64
        order[i], order[j] = order[j], order[i]
    return order


class BlockBatchLoader:
    """Infinite iterator of shuffled ``{"ids": int32 [batch, seq]}``
    batches over a flat token array. ``backend="native"`` requires the C++
    loader; ``"python"`` forces the fallback; ``"auto"`` prefers native.

    The native path copies each ready buffer into a fresh array before
    yielding (the ring buffer is recycled on the next pop); prefetch still
    overlaps: the producer thread keeps ``n_buffers`` batches ahead.
    """

    def __init__(self, tokens, batch: int, seq: int, *, seed: int = 0,
                 backend: str = "auto", n_buffers: int = 4):
        self.tokens = np.ascontiguousarray(np.asarray(tokens, np.int32)
                                           ).reshape(-1)
        if self.tokens.size < seq:
            raise ValueError(
                f"{self.tokens.size} tokens cannot fill one {seq}-token "
                "block")
        self.batch, self.seq, self.seed = int(batch), int(seq), int(seed)
        self.n_blocks = self.tokens.size // seq
        self.batches_per_epoch = self.n_blocks // batch
        if self.batches_per_epoch == 0:
            raise ValueError(
                f"{self.n_blocks} blocks cannot fill one batch of {batch}")
        self._handle = None
        self._lib = None
        if backend in ("auto", "native"):
            lib = _load()
            if lib is None:
                if backend == "native":
                    raise RuntimeError(
                        f"native loader unavailable: {_build_error}")
            else:
                self._lib = lib
                self._handle = lib.vyom_loader_create(
                    self.tokens.ctypes.data_as(
                        ctypes.POINTER(ctypes.c_int32)),
                    self.tokens.size, self.batch, self.seq,
                    ctypes.c_uint64(self.seed & _MASK), int(n_buffers))
                if not self._handle:
                    raise RuntimeError("native loader rejected the config")
        self.backend = "native" if self._handle else "python"

    def __iter__(self) -> Iterator[dict]:
        if self._handle:
            while True:
                ptr = self._lib.vyom_loader_next(self._handle)
                arr = np.ctypeslib.as_array(
                    ptr, shape=(self.batch, self.seq))
                yield {"ids": arr.copy()}
        else:
            epoch = 0
            while True:
                order = _epoch_order(self.n_blocks, self.seed, epoch)
                for bi in range(self.batches_per_epoch):
                    blocks = order[bi * self.batch:(bi + 1) * self.batch]
                    rows = [self.tokens[b * self.seq:(b + 1) * self.seq]
                            for b in blocks]
                    yield {"ids": np.stack(rows)}
                epoch += 1

    def close(self):
        if self._handle:
            self._lib.vyom_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
