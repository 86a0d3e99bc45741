"""Packed-sequence training: packer, segment-masked attention (XLA and
in-kernel flash paths), and packed-vs-unpacked model parity.

The packed batch must be semantically identical to running each example
alone: segment ids block cross-example attention, positions restart per
example, labels never cross a segment boundary."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vyomai_tpu as vt
from vyomai_tpu.layers.attention import sdpa, set_sdpa_impl
from vyomai_tpu.ops import flash_attention as fa
from vyomai_tpu.ops.fused import cross_entropy
from vyomai_tpu.training import pack_sequences, pack_sft, packing_efficiency

ON_TPU = jax.default_backend() == "tpu"


@pytest.fixture(scope="module", autouse=True)
def _interpret_off_tpu():
    if not ON_TPU:
        fa.set_interpret(True)
    yield
    fa.set_interpret(False)


# ---------------------------------------------------------------------------
# Packer
# ---------------------------------------------------------------------------

def test_pack_sequences_layout():
    out = pack_sequences([[1, 2, 3], [4, 5], [6, 7, 8, 9]], seq_len=8,
                         pad_id=0)
    ids, seg, pos, lab = (out["ids"], out["segment_ids"], out["positions"],
                          out["labels"])
    # first-fit: row0 = [1,2,3] + [4,5] + pad; row1 = [6,7,8,9]
    assert ids.shape == (2, 8)
    np.testing.assert_array_equal(ids[0], [1, 2, 3, 4, 5, 0, 0, 0])
    np.testing.assert_array_equal(seg[0], [1, 1, 1, 2, 2, 0, 0, 0])
    np.testing.assert_array_equal(pos[0], [0, 1, 2, 0, 1, 0, 0, 0])
    # labels: next token within segment, -100 at the segment end / pad
    np.testing.assert_array_equal(
        lab[0], [2, 3, -100, 5, -100, -100, -100, -100])
    np.testing.assert_array_equal(lab[1][:4], [7, 8, 9, -100])
    assert packing_efficiency(out) == (5 + 4) / 16


def test_pack_sft_label_masking():
    out = pack_sft([([10, 11], [20, 21])], seq_len=8, eos_id=99)
    # tokens: 10 11 20 21 99; loss only on answer+eos tokens -> labels at
    # the positions PREDICTING them (prompt's last token predicts 20)
    np.testing.assert_array_equal(out["ids"][0][:5], [10, 11, 20, 21, 99])
    np.testing.assert_array_equal(
        out["labels"][0][:5], [-100, 20, 21, 99, -100])


def test_pack_truncates_oversized():
    out = pack_sequences([list(range(1, 20))], seq_len=8)
    assert out["ids"].shape == (1, 8)
    np.testing.assert_array_equal(out["ids"][0], np.arange(1, 9))


# ---------------------------------------------------------------------------
# Segment-masked attention: flash in-kernel vs XLA additive mask
# ---------------------------------------------------------------------------

def _rand_segments(key, b, l, n_seg=3):
    """Contiguous segment blocks with a padded (0) tail."""
    cuts = np.sort(np.asarray(
        jax.random.randint(key, (b, n_seg - 1), 1, l - 8)), axis=1)
    seg = np.zeros((b, l), dtype=np.int32)
    for r in range(b):
        bounds = [0] + list(cuts[r]) + [l - 4]   # last 4 slots = pad (0)
        for s in range(n_seg):
            seg[r, bounds[s]:bounds[s + 1]] = s + 1
    return jnp.asarray(seg)


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("gqa", [False, True])
def test_flash_segments_match_xla(causal, gqa):
    b, h, l, d = 2, 4, 256, 64
    hkv = 2 if gqa else h
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (b, h, l, d))
    k = jax.random.normal(ks[1], (b, hkv, l, d))
    v = jax.random.normal(ks[2], (b, hkv, l, d))
    seg = _rand_segments(ks[3], b, l)
    segs = (seg, seg)

    set_sdpa_impl("xla")
    from vyomai_tpu.layers.attention import repeat_kv
    ref = sdpa(q, repeat_kv(k, h // hkv), repeat_kv(v, h // hkv),
               causal=causal, segments=segs)
    set_sdpa_impl("flash")
    try:
        out = fa.flash_attention_bias(q, k, v, None, causal=causal,
                                      segments=segs)
    finally:
        set_sdpa_impl("auto")
    # compare only real (non-pad) query rows — fully-masked pad rows emit
    # uniform-softmax junk on the XLA path and zeros from the kernel floor
    valid = np.asarray(seg > 0)[:, None, :, None]
    np.testing.assert_allclose(np.where(valid, np.asarray(out), 0.0),
                               np.where(valid, np.asarray(ref), 0.0),
                               atol=2e-5 if not ON_TPU else 2e-2)


def test_flash_segments_grads_match_xla():
    b, h, l, d = 1, 2, 128, 64
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    q = jax.random.normal(ks[0], (b, h, l, d))
    k = jax.random.normal(ks[1], (b, h, l, d))
    v = jax.random.normal(ks[2], (b, h, l, d))
    seg = _rand_segments(ks[3], b, l)
    w = jax.random.normal(ks[3], (b, h, l, d))  # grad probe weights

    def loss(fn):
        def f(q_, k_, v_):
            out = fn(q_, k_, v_)
            valid = (seg > 0)[:, None, :, None]
            return jnp.sum(jnp.where(valid, out, 0.0) * w)
        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    def xla_fn(q_, k_, v_):
        set_sdpa_impl("xla")
        try:
            return sdpa(q_, k_, v_, causal=True, segments=(seg, seg))
        finally:
            set_sdpa_impl("auto")

    def flash_fn(q_, k_, v_):
        return fa.flash_attention_bias(q_, k_, v_, None, causal=True,
                                       segments=(seg, seg))

    g_ref = loss(xla_fn)
    g_out = loss(flash_fn)
    for a, b_ in zip(g_out, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=3e-5 if not ON_TPU else 3e-2)


def test_flash_segments_pad_shim():
    """Non-block-multiple lengths go through the pad-and-mask shim with
    sentinel-padded segment ids."""
    b, h, l, d = 1, 2, 100, 64   # 100 -> padded to 104 (interpret mult 8)
    ks = jax.random.split(jax.random.PRNGKey(2), 4)
    q = jax.random.normal(ks[0], (b, h, l, d))
    k = jax.random.normal(ks[1], (b, h, l, d))
    v = jax.random.normal(ks[2], (b, h, l, d))
    seg = jnp.asarray(np.repeat([[1, 2, 3, 4]], 25, axis=1).reshape(1, 100))
    set_sdpa_impl("xla")
    ref = sdpa(q, k, v, causal=True, segments=(seg, seg))
    set_sdpa_impl("auto")
    out = fa.flash_attention_bias(q, k, v, None, causal=True,
                                  segments=(seg, seg))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5 if not ON_TPU else 2e-2)


# ---------------------------------------------------------------------------
# Model-level parity: packed row == each example alone
# ---------------------------------------------------------------------------

CFG = vt.EncoderConfig(
    hidden_size=64, num_attention_heads=4, num_key_value_heads=2,
    num_hidden_layers=2, vocab_size=128, max_position_embeddings=64,
    intermediate_size=128, hidden_dropout_prob=0.0)


@pytest.mark.parametrize("pos_type,attn_type", [
    ("rope", "gqa"), ("absolute", None), ("sinusoidal", None)])
def test_packed_forward_matches_unpacked(pos_type, attn_type):
    model = vt.DecoderModel(CFG, pos_embedding_type=pos_type,
                            attention_type=attn_type)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    seqs = [list(rng.randint(1, 128, size=n)) for n in (9, 7, 5)]
    packed = pack_sequences(seqs, seq_len=24)
    assert packed["ids"].shape[0] == 1

    set_sdpa_impl("xla")
    try:
        out = model.apply(params, jnp.asarray(packed["ids"]),
                          segment_ids=jnp.asarray(packed["segment_ids"]),
                          positions=jnp.asarray(packed["positions"]))
        t = 0
        for s in seqs:
            ref = model.apply(params, jnp.asarray([s], dtype=jnp.int32))
            np.testing.assert_allclose(
                np.asarray(out.logits[0, t:t + len(s)]),
                np.asarray(ref.logits[0]), atol=2e-4)
            t += len(s)
    finally:
        set_sdpa_impl("auto")


def test_packed_loss_matches_unpacked():
    """Packed CE over pre-aligned labels == CE over the same examples run
    separately (mean over the identical set of valid positions)."""
    model = vt.DecoderModel(CFG, pos_embedding_type="rope")
    params = model.init(jax.random.PRNGKey(1))
    rng = np.random.RandomState(1)
    seqs = [list(rng.randint(1, 128, size=n)) for n in (10, 6)]
    packed = pack_sequences(seqs, seq_len=16)

    set_sdpa_impl("xla")
    try:
        out = model.apply(params, jnp.asarray(packed["ids"]),
                          segment_ids=jnp.asarray(packed["segment_ids"]),
                          positions=jnp.asarray(packed["positions"]))
        packed_loss = cross_entropy(out.logits,
                                    jnp.asarray(packed["labels"]))

        tot, cnt = 0.0, 0
        for s in seqs:
            ref = model.apply(params, jnp.asarray([s], dtype=jnp.int32))
            ll = cross_entropy(ref.logits[:, :-1],
                               jnp.asarray([s[1:]], dtype=jnp.int32))
            tot += float(ll) * (len(s) - 1)
            cnt += len(s) - 1
        np.testing.assert_allclose(float(packed_loss), tot / cnt, atol=1e-4)
    finally:
        set_sdpa_impl("auto")


def test_packed_qwen_matches_unpacked():
    """The modern (Qwen-style) stack supports packed batches too — the
    HF-importable family is what SFT actually runs on."""
    qcfg = vt.QwenConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=64, qk_norm=True,
        tie_word_embeddings=True)
    model = vt.ModelForCausalLM(qcfg)
    params = model.init(jax.random.PRNGKey(3))
    rng = np.random.RandomState(3)
    seqs = [list(rng.randint(1, 128, size=n)) for n in (11, 8)]
    packed = pack_sequences(seqs, seq_len=24)

    set_sdpa_impl("xla")
    try:
        out = model.apply(params, jnp.asarray(packed["ids"]),
                          segment_ids=jnp.asarray(packed["segment_ids"]),
                          positions=jnp.asarray(packed["positions"]))
        t = 0
        for s in seqs:
            ref = model.apply(params, jnp.asarray([s], dtype=jnp.int32))
            np.testing.assert_allclose(
                np.asarray(out.logits[0, t:t + len(s)]),
                np.asarray(ref.logits[0]), atol=2e-4)
            t += len(s)
    finally:
        set_sdpa_impl("auto")


def test_packed_train_step_dp_mesh():
    """Packed batches shard over a data-parallel mesh like any other batch
    (segment_ids/positions split on the batch axis; the XLA segment mask
    partitions trivially)."""
    cpus = jax.devices("cpu")
    if len(cpus) < 4:
        pytest.skip("needs 4 virtual CPU devices")
    import numpy as onp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from vyomai_tpu.parallel import shard_params
    from vyomai_tpu.training import (create_train_state, make_optimizer,
                                     make_train_step)
    mesh = Mesh(onp.asarray(cpus[:4]).reshape(4, 1), ("data", "model"))
    model = vt.DecoderModel(CFG, pos_embedding_type="rope")
    with jax.default_device(cpus[0]):
        params = model.init(jax.random.PRNGKey(4))
    params = shard_params(params, mesh)

    rng = np.random.RandomState(4)
    seqs = [list(rng.randint(1, 128, size=rng.randint(4, 14)))
            for _ in range(32)]
    packed = pack_sequences(seqs, seq_len=16)
    rows = (packed["ids"].shape[0] // 4) * 4
    assert rows >= 4

    def loss_fn(p, batch, rng_):
        out = model.apply(p, batch["ids"], segment_ids=batch["seg"],
                          positions=batch["pos"])
        return cross_entropy(out.logits, batch["labels"]), {}

    set_sdpa_impl("xla")
    try:
        opt = make_optimizer(1e-3)
        state = create_train_state(params, opt)
        step = make_train_step(loss_fn, opt)
        sh = NamedSharding(mesh, P("data"))
        batch = {
            "ids": jax.device_put(jnp.asarray(packed["ids"][:rows]), sh),
            "seg": jax.device_put(jnp.asarray(packed["segment_ids"][:rows]),
                                  sh),
            "pos": jax.device_put(jnp.asarray(packed["positions"][:rows]),
                                  sh),
            "labels": jax.device_put(jnp.asarray(packed["labels"][:rows]),
                                     sh)}
        state, m = step(state, batch, jax.random.PRNGKey(5))
        assert np.isfinite(float(m["loss"]))
    finally:
        set_sdpa_impl("auto")


def test_packed_rejects_cache():
    model = vt.DecoderModel(CFG, pos_embedding_type="rope")
    params = model.init(jax.random.PRNGKey(2))
    cache = model.init_cache(batch_size=1, max_len=16)
    with pytest.raises(ValueError):
        model.apply(params, jnp.ones((1, 4), jnp.int32), cache=cache,
                    segment_ids=jnp.ones((1, 4), jnp.int32))
