"""Pallas paged-decode kernel correctness (code-review r2: the serving
path's TPU kernel previously had zero tests — only the XLA fallback was
exercised off-TPU).

On a TPU backend the real Mosaic kernel runs; anywhere else the SAME
kernel logic executes in Pallas interpret mode, compared against the XLA
gather fallback."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vyomai_tpu.ops import paged_decode_pallas as pdp
from vyomai_tpu.ops.paged_attention import paged_attention_decode

ON_TPU = jax.default_backend() == "tpu"


@pytest.fixture(scope="module", autouse=True)
def _interpret_off_tpu():
    if not ON_TPU:
        pdp.set_interpret(True)
    yield
    pdp.set_interpret(False)


B, H, H_KV, D, BS, MAXB, NB = 3, 8, 2, 64, 8, 6, 32


def _setup(seed=0, ctx=(17, 33, 48)):
    rng = jax.random.PRNGKey(seed)
    kq, kp = jax.random.split(rng)
    q = jax.random.normal(kq, (B, H, D), dtype=jnp.float32)
    pool = jax.random.normal(kp, (NB, 2, BS, H_KV * D), dtype=jnp.float32)
    bt = jnp.asarray(
        np.random.default_rng(seed).permutation(NB)[:B * MAXB].reshape(
            B, MAXB).astype(np.int32))
    seq_lens = jnp.asarray(ctx, dtype=jnp.int32)
    return q, pool, bt, seq_lens


def test_kernel_matches_xla_fallback():
    """Block-table gather kernel == XLA gather fallback across uneven
    context lengths (incl. partial final blocks)."""
    q, pool, bt, seq_lens = _setup()
    out = pdp.paged_attention_decode_pallas(q, pool, bt, seq_lens, H_KV)
    ref = paged_attention_decode(q, pool, bt, seq_lens, H_KV)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5 if not ON_TPU else 2e-2)


def test_kernel_mha_no_grouping():
    """H == H_KV: the block-diagonal expansion degenerates to identity."""
    q, pool, bt, seq_lens = _setup(seed=1)
    pool_mha = jax.random.normal(jax.random.PRNGKey(9),
                                 (NB, 2, BS, 2 * D), dtype=jnp.float32)
    q2 = q[:, :2]                                    # H = H_KV = 2
    out = pdp.paged_attention_decode_pallas(q2, pool_mha, bt, seq_lens, 2)
    ref = paged_attention_decode(q2, pool_mha, bt, seq_lens, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5 if not ON_TPU else 2e-2)


def test_kernel_clamps_oversized_seq_len():
    """seq_len beyond the block table must not index past it (the XLA
    fallback masks to the table window; the kernel clamps its block loop).
    Oversized lengths attend exactly the table-covered window."""
    q, pool, bt, _ = _setup(seed=2)
    over = jnp.asarray([MAXB * BS + 13, 9, MAXB * BS], dtype=jnp.int32)
    capped = jnp.minimum(over, MAXB * BS)
    out = pdp.paged_attention_decode_pallas(q, pool, bt, over, H_KV)
    ref = paged_attention_decode(q, pool, bt, capped, H_KV)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5 if not ON_TPU else 2e-2)


def test_kernel_int8_matches_xla_fallback():
    """Int8 pool + per-row scales: the kernel's score/probability column
    dequantization equals the XLA fallback's explicit dequantized gather."""
    from vyomai_tpu.ops.paged_attention import quantize_rows
    q, pool_f, bt, seq_lens = _setup(seed=3)
    flat = pool_f.reshape(NB * 2 * BS, H_KV * D)
    qrows, srows = quantize_rows(flat)
    pool_q = qrows.reshape(NB, 2, BS, H_KV * D)
    scales = srows.reshape(NB, 2, BS)
    out = pdp.paged_attention_decode_pallas(q, pool_q, bt, seq_lens, H_KV,
                                            scales)
    ref = paged_attention_decode(q, pool_q, bt, seq_lens, H_KV, scales)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5 if not ON_TPU else 2e-2)
    # and both sit close to the unquantized attention (int8 noise bounded)
    full = paged_attention_decode(q, pool_f, bt, seq_lens, H_KV)
    np.testing.assert_allclose(np.asarray(out), np.asarray(full), atol=0.05)


@pytest.mark.parametrize("window", [5, 16, 40])
def test_kernel_sliding_window_matches_xla(window):
    """Windowed decode kernel (sweep starts at the band's first block) ==
    XLA fallback with the same window, across uneven context lengths —
    including a window smaller than one block (5 < BS=8), block-spanning
    (16) and wider-than-context (40 > 33)."""
    q, pool, bt, seq_lens = _setup(seed=3)
    out = pdp.paged_attention_decode_pallas(q, pool, bt, seq_lens, H_KV,
                                            window=window)
    ref = paged_attention_decode(q, pool, bt, seq_lens, H_KV, window=window)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5 if not ON_TPU else 2e-2)


def test_kernel_sliding_window_int8(int8_pool=None):
    """Window composes with the int8 pool dequant path."""
    from vyomai_tpu.ops.paged_attention import write_kv
    q, pool, bt, seq_lens = _setup(seed=4)
    pool_q = jnp.zeros((NB, 2, BS, H_KV * D), jnp.int8)
    scales = jnp.ones((NB, 2, BS), jnp.float32)
    # quantize the fp pool row-wise through the canonical writer
    k_rows = pool[:, 0].reshape(-1, H_KV, D)
    v_rows = pool[:, 1].reshape(-1, H_KV, D)
    blocks = jnp.repeat(jnp.arange(NB), BS)
    offs = jnp.tile(jnp.arange(BS), NB)
    pool_q, scales = write_kv(pool_q, k_rows, v_rows, blocks, offs,
                              scales=scales)
    out = pdp.paged_attention_decode_pallas(q, pool_q, bt, seq_lens, H_KV,
                                            scales=scales, window=12)
    ref = paged_attention_decode(q, pool_q, bt, seq_lens, H_KV,
                                 scales=scales, window=12)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4 if not ON_TPU else 2e-2)


def test_kernel_under_tp_shard_map_matches_xla():
    """The kernel runs per shard under a tensor-parallel mesh
    (``serving.paged_model._tp_paged_attn``): q split on heads, the pool
    on its kv-width — output equals the unsharded XLA fallback."""
    from jax.sharding import Mesh
    from vyomai_tpu.serving.paged_model import _tp_paged_attn
    cpus = jax.devices("cpu")
    if len(cpus) < 2:
        pytest.skip("needs 2 virtual CPU devices")
    q, pool, bt, seq_lens = _setup(seed=7)
    mesh = Mesh(np.asarray(cpus[:2]).reshape(1, 2), ("data", "model"))
    pdp.set_interpret(True)  # CPU mesh: kernel must interpret there even
    try:                     # when the process default backend is TPU
        with jax.default_device(cpus[0]):
            out = jax.jit(lambda *a: _tp_paged_attn(mesh, *a, h_kv=H_KV,
                                                    scales=None, window=None,
                                                    sinks=0))(
                q, pool, bt, seq_lens)
            ref = paged_attention_decode(q, pool, bt, seq_lens, H_KV)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)
    finally:
        pdp.set_interpret(not ON_TPU)


@pytest.mark.parametrize("window,sinks", [(8, 4), (16, 8), (5, 9), (40, 3)])
def test_kernel_window_with_sinks(window, sinks):
    """Two-range sweep (sink blocks + band blocks) == XLA fallback with
    the same window+sinks — incl. sinks > window and band overlapping the
    sink blocks."""
    q, pool, bt, seq_lens = _setup(seed=5)
    out = pdp.paged_attention_decode_pallas(q, pool, bt, seq_lens, H_KV,
                                            window=window, sinks=sinks)
    ref = paged_attention_decode(q, pool, bt, seq_lens, H_KV,
                                 window=window, sinks=sinks)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5 if not ON_TPU else 2e-2)
