"""Short-sequence (ViT-class) attention kernel tests.

Real Mosaic kernel on a TPU backend; the same kernel logic in Pallas
interpret mode anywhere else (the flash-test convention)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vyomai_tpu.layers.attention import _sdpa_xla, sdpa, set_sdpa_impl
from vyomai_tpu.ops import flash_attention as fa
from vyomai_tpu.ops import short_attention as sa

ON_TPU = jax.default_backend() == "tpu"


@pytest.fixture(scope="module", autouse=True)
def _interpret_off_tpu():
    if not ON_TPU:
        fa.set_interpret(True)   # short_attention shares the flash flag
    yield
    fa.set_interpret(False)


B, H, L, D = 2, 4, 197, 64   # the ViT-base shape (unaligned L on purpose)


@pytest.fixture(scope="module")
def qkv():
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, L, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, H, L, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, H, L, D))
    return q, k, v


def test_fwd_matches_xla(qkv):
    q, k, v = qkv
    with jax.default_matmul_precision("highest"):
        ref = _sdpa_xla(q, k, v)
        out = sa.short_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_fwd_bf16(qkv):
    q, k, v = (x.astype(jnp.bfloat16) for x in qkv)
    ref = _sdpa_xla(q, k, v)
    out = sa.short_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                               np.asarray(ref, dtype=np.float32), atol=3e-2)


def test_grads_match_xla(qkv):
    q, k, v = qkv

    def loss_short(q, k, v):
        return jnp.sum(sa.short_attention(q, k, v) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_sdpa_xla(q, k, v) ** 2)

    with jax.default_matmul_precision("highest"):
        g1 = jax.grad(loss_short, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        scale = max(float(jnp.abs(b).max()), 1.0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5 * scale)


def test_supported_gate(qkv):
    q, k, v = qkv
    assert sa.supported(q, k, None)
    assert not sa.supported(q, k, None, causal=True)
    assert not sa.supported(q, k, None, window=64)
    assert not sa.supported(q, k, None, segments=(1, 2))
    # key-padding additive bias IS supported (r5); full [B,1,L,L] is not
    assert sa.supported(q, k, jnp.zeros((B, 1, 1, L)))
    assert sa.supported(q, k, jnp.zeros((1, 1, 1, L)))
    assert not sa.supported(q, k, jnp.zeros((B, 1, L, L)))
    # GQA (h != h_kv) stays on flash/XLA
    assert not sa.supported(q, k[:, :2], None)
    # decode step and long sequences are out of scope
    assert not sa.supported(q[:, :, :1], k[:, :, :1], None)
    big = jnp.zeros((1, 4, 1024, 64))
    assert not sa.supported(big, big, None)
    # VMEM budget: very wide head count at max length is rejected
    huge = jnp.zeros((1, 64, 512, 128), jnp.float32)
    assert not sa.supported(huge, huge, None)


def _keypad_mask(n_pad):
    """Additive [B,1,1,L] mask: last ``n_pad`` keys padded out — the
    encoder model's (1-m)*finfo.min recipe."""
    valid = (jnp.arange(L) < L - n_pad).astype(jnp.float32)
    return ((1.0 - valid) * float(jnp.finfo(jnp.float32).min)
            ).reshape(1, 1, 1, L).repeat(B, axis=0)


def test_fwd_bias_matches_xla(qkv):
    q, k, v = qkv
    mask = _keypad_mask(31)
    with jax.default_matmul_precision("highest"):
        ref = _sdpa_xla(q, k, v, mask)
        out = sa.short_attention_bias(q, k, v, mask)
    # compare only non-padded query rows; fully-valid queries attend the
    # masked keys with weight 0 in both paths
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_fwd_bias_odd_heads(qkv):
    """Odd head count takes the unpaired kernel's bias path."""
    q, k, v = (x[:, :3] for x in qkv)
    mask = _keypad_mask(17)
    with jax.default_matmul_precision("highest"):
        ref = _sdpa_xla(q, k, v, mask)
        out = sa.short_attention_bias(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_grads_match_xla_bias(qkv):
    q, k, v = qkv
    mask = _keypad_mask(31)

    def loss_short(q, k, v):
        return jnp.sum(sa.short_attention_bias(q, k, v, mask) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_sdpa_xla(q, k, v, mask) ** 2)

    with jax.default_matmul_precision("highest"):
        g1 = jax.grad(loss_short, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        scale = max(float(jnp.abs(b).max()), 1.0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5 * scale)


def test_masked_encoder_auto_dispatch(qkv):
    """sdpa('auto') with a key-pad mask at short L routes to the kernel on
    TPU and stays numerically equal to the XLA path."""
    q, k, v = qkv
    mask = _keypad_mask(31)
    set_sdpa_impl("auto")
    with jax.default_matmul_precision("highest"):
        out = sdpa(q, k, v, mask)
        ref = _sdpa_xla(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_forced_short_rejects_unsupported(qkv):
    q, k, v = qkv
    set_sdpa_impl("short")
    try:
        with pytest.raises(ValueError):
            sdpa(q, k, v, causal=True)
        # supported masked call goes through
        mask = _keypad_mask(8)
        with jax.default_matmul_precision("highest"):
            out = sdpa(q, k, v, mask)
            ref = _sdpa_xla(q, k, v, mask)
    finally:
        set_sdpa_impl("auto")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_packed_qkv_matches_unpacked(qkv):
    """short_attention_qkv over the packed [B, L, 3HD] layout equals the
    [B,H,L,D] kernel and the XLA path; its VJP matches XLA autodiff."""
    q, k, v = qkv
    B_, H_, L_, D_ = q.shape
    x3 = jnp.stack([q, k, v], axis=1)            # [B, 3, H, L, D]
    x3 = x3.transpose(0, 3, 1, 2, 4).reshape(B_, L_, 3 * H_ * D_)
    with jax.default_matmul_precision("highest"):
        out = sa.short_attention_qkv(x3, H_)     # [B, L, H*D]
        ref = _sdpa_xla(q, k, v).transpose(0, 2, 1, 3).reshape(
            B_, L_, H_ * D_)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)

    def loss_packed(x3):
        return jnp.sum(sa.short_attention_qkv(x3, H_) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_sdpa_xla(q, k, v) ** 2)

    with jax.default_matmul_precision("highest"):
        gp = jax.grad(loss_packed)(x3)
        gq, gk, gv = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_ref = jnp.stack([gq, gk, gv], axis=1).transpose(
        0, 3, 1, 2, 4).reshape(B_, L_, 3 * H_ * D_)
    scale = max(float(jnp.abs(g_ref).max()), 1.0)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(g_ref),
                               atol=5e-5 * scale)


def test_vision_attention_fast_path_matches_generic():
    """encoder_attention_apply(kind="vision") takes the packed fast path;
    forced "short" (kernel, interpret off-TPU) equals forced "xla"."""
    import vyomai_tpu as vt
    from vyomai_tpu.layers import attention as attn
    cfg = vt.VisionConfig(num_hidden_layers=1, hidden_dropout_prob=0.0)
    key = jax.random.PRNGKey(0)
    p = attn.attention_init(key, cfg, kind="vision", dtype=jnp.float32)
    hidden = jax.random.normal(jax.random.PRNGKey(1),
                               (2, 197, cfg.hidden_size), jnp.float32)
    with jax.default_matmul_precision("highest"):
        set_sdpa_impl("short")
        try:
            out = attn.encoder_attention_apply(p, hidden, None, cfg,
                                               kind="vision")
        finally:
            set_sdpa_impl("auto")
        set_sdpa_impl("xla")
        try:
            ref = attn.encoder_attention_apply(p, hidden, None, cfg,
                                               kind="vision")
        finally:
            set_sdpa_impl("auto")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_sdpa_auto_dispatch_equivalence(qkv):
    """The auto dispatcher's short path equals the XLA path numerically
    (on CPU platform_dependent lowers to XLA; on TPU the kernel runs).
    "highest" matters: default-precision CPU fp32 dots go through oneDNN
    bf16 fastmath (~2e-3 noise) even jit-vs-eager on the SAME path."""
    q, k, v = qkv
    set_sdpa_impl("auto")
    with jax.default_matmul_precision("highest"):
        out = sdpa(q, k, v)
        ref = _sdpa_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_forced_short_impl(qkv):
    q, k, v = qkv
    set_sdpa_impl("short")
    try:
        with jax.default_matmul_precision("highest"):
            out = sdpa(q, k, v)
            ref = _sdpa_xla(q, k, v)
    finally:
        set_sdpa_impl("auto")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
