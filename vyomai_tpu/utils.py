"""Model utilities (reference ``VyomAI/utils.py``).

- ``model_parameters`` / ``model_size`` — param counting/sizing over pytrees
  (reference ``utils.py:9-40``).
- ``timing_tpu`` — the TPU counterpart of the reference's ``timing_cuda``
  latency + peak-memory microbenchmark (``utils.py:43-86``; note the
  reference's ``torch.mean.mean`` typo is fixed here): blocks on device
  results, reports mean/p50/p90 latency, per-token latency, and peak HBM
  from device memory stats.
- ``trace`` — context manager around ``jax.profiler`` for hot-path traces
  (SURVEY.md §5.1).
"""

import contextlib
import time
from typing import Callable, Dict, Optional

import jax
import numpy as np


def model_parameters(params) -> Dict[str, int]:
    leaves = jax.tree_util.tree_leaves(params)
    total = sum(int(x.size) for x in leaves)
    return {"total_params": total, "trainable_params": total}


def model_size(params) -> float:
    """Parameter size in MB."""
    leaves = jax.tree_util.tree_leaves(params)
    return sum(x.size * x.dtype.itemsize for x in leaves) / 1024 ** 2


def peak_memory_mb(device=None) -> Optional[float]:
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    if not stats:
        return None
    peak = stats.get("peak_bytes_in_use") or stats.get("bytes_in_use")
    return peak / 1e6 if peak else None


def device_sync(x):
    """True execution barrier: fetch one element of ``x`` to the host.

    On remote-attached TPU runtimes ``jax.block_until_ready`` can return
    once the buffer *handle* exists, not when the program finished — timing
    loops that rely on it measure dispatch, not execution. A one-element
    host fetch is an unambiguous barrier on every backend, and because
    programs execute in dispatch order it also bounds everything enqueued
    before it. Returns ``x``."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    if hasattr(leaf, "ndim") and leaf.ndim:
        leaf = leaf[(0,) * leaf.ndim]
    np.asarray(leaf)
    return x


def timing_tpu(fn: Callable, *args, num_batches: int = 10,
               min_new_tokens: Optional[int] = None, warmup: int = 2):
    """Benchmark ``fn(*args)`` on device. Returns a dict with latency stats
    (ms), optional per-token latency, and peak HBM MB."""
    for _ in range(warmup):
        device_sync(fn(*args))
    lat = []
    for _ in range(num_batches):
        t0 = time.perf_counter()
        out = fn(*args)
        device_sync(out)
        lat.append((time.perf_counter() - t0) * 1e3)
    lat = np.asarray(lat)
    res = {
        "mean_ms": float(lat.mean()),
        "p50_ms": float(np.percentile(lat, 50)),
        "p90_ms": float(np.percentile(lat, 90)),
        "peak_hbm_mb": peak_memory_mb(),
    }
    if min_new_tokens:
        res["latency_per_token_ms"] = float(lat.mean() / min_new_tokens)
    return res


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax_trace"):
    """Capture a jax.profiler trace around a code block; view with
    tensorboard/xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
