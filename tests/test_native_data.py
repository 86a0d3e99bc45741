"""Native (C++) background batch loader vs its Python fallback: the
determinism contract (splitmix64 Fisher-Yates epoch shuffle) must make the
two backends produce bit-identical batch streams."""

import numpy as np
import pytest

from vyomai_tpu.training import native_data


def _stream(backend, tokens, batch, seq, seed, n):
    loader = native_data.BlockBatchLoader(tokens, batch, seq, seed=seed,
                                          backend=backend)
    it = iter(loader)
    out = [next(it)["ids"].copy() for _ in range(n)]
    loader.close()
    return loader.backend, out


def test_python_fallback_covers_every_block_once_per_epoch():
    tokens = np.arange(8 * 16, dtype=np.int32)
    be, batches = _stream("python", tokens, 2, 16, 7, 4)  # exactly 1 epoch
    assert be == "python"
    rows = np.concatenate([b.reshape(-1, 16) for b in batches])
    # every block appears exactly once (shuffled, not repeated/dropped)
    starts = sorted(int(r[0]) for r in rows)
    assert starts == [i * 16 for i in range(8)]


def test_epochs_reshuffle_deterministically():
    tokens = np.arange(64 * 8, dtype=np.int32)
    _, a = _stream("python", tokens, 4, 8, 3, 32)   # 2 epochs
    _, b = _stream("python", tokens, 4, 8, 3, 32)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    # different epochs differ
    assert not all((x == y).all() for x, y in zip(a[:16], a[16:]))


def test_native_matches_python_bit_exact():
    if not native_data.available():
        pytest.skip(f"no native loader: {native_data.build_error()}")
    tokens = np.random.default_rng(0).integers(
        0, 1000, size=32 * 64, dtype=np.int32)
    be_n, native = _stream("native", tokens, 4, 64, 123, 20)
    be_p, python = _stream("python", tokens, 4, 64, 123, 20)
    assert be_n == "native" and be_p == "python"
    for i, (x, y) in enumerate(zip(native, python)):
        np.testing.assert_array_equal(x, y, err_msg=f"batch {i}")


def test_loader_validates_sizes():
    with pytest.raises(ValueError, match="tokens"):
        native_data.BlockBatchLoader(np.arange(4, dtype=np.int32), 1, 16,
                                     backend="python")
    with pytest.raises(ValueError, match="blocks"):
        native_data.BlockBatchLoader(np.arange(32, dtype=np.int32), 8, 16,
                                     backend="python")
