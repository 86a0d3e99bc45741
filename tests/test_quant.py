"""Int8 weight-only quantization: quantizer error bounds, matmul-path
equivalence (fallback vs Pallas interpret, kn vs nk layouts), and the
end-to-end serving invariant — the paged engine with quantized weights is
token-exact vs dense static-cache generate with the SAME quantized weights
(like-for-like: the invariant is path parity, not lossless quantization)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vyomai_tpu as vt
from vyomai_tpu.core import nn as cnn
from vyomai_tpu.generation import generate
from vyomai_tpu.ops import quant_matmul as qm
from vyomai_tpu.serving import ContinuousBatchEngine


def test_quantize_weight_error_bound():
    w = jax.random.normal(jax.random.PRNGKey(0), (96, 160)) * 0.04
    q, s = qm.quantize_weight(w, contract_axis=0)
    assert q.dtype == jnp.int8 and s.shape == (160,)
    recon = q.astype(jnp.float32) * s[None, :]
    # symmetric round-to-nearest: per-column error <= scale/2
    err = np.abs(np.asarray(w - recon))
    assert (err <= np.asarray(s)[None, :] * 0.5 + 1e-8).all()
    # zero column stays exactly zero with unit scale
    w0 = w.at[:, 3].set(0.0)
    q0, s0 = qm.quantize_weight(w0, contract_axis=0)
    assert float(s0[3]) == 1.0 and not np.asarray(q0[:, 3]).any()


def test_int8_matmul_fallback_matches_reference():
    # pin the CPU device: exact-f32 reference (the TPU MXU does fp32
    # matmuls with bf16 multiplies — documented ~1e-3 artifact)
    with jax.default_device(jax.devices("cpu")[0]):
        key = jax.random.PRNGKey(1)
        x = jax.random.normal(key, (5, 96), jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(2), (96, 160)) * 0.05
        q, s = qm.quantize_weight(w, contract_axis=0)
        out = qm.int8_matmul(x, q, s)                # CPU -> fallback path
        ref = x @ (q.astype(jnp.float32) * s[None, :])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("layout", ["kn", "nk"])
@pytest.mark.parametrize("m", [1, 5, 8])
def test_int8_matmul_kernel_interpret_matches_fallback(layout, m):
    """The Pallas kernel (interpret mode) equals the XLA fallback for both
    weight layouts, including M rows that need padding to the 8-sublane
    tile."""
    # CPU-pinned: both paths reduce in exact fp32 there. On the TPU the
    # XLA path computes M=1 matvecs exactly (VPU) while the MXU rounds
    # fp32 activations to bf16 — a device artifact, not an impl bug.
    k_dim, n_dim = 256, 384
    with jax.default_device(jax.devices("cpu")[0]):
        x = jax.random.normal(jax.random.PRNGKey(3), (m, k_dim), jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(4), (k_dim, n_dim)) * 0.05
        q, s = qm.quantize_weight(w, contract_axis=0)
        if layout == "nk":
            q = q.T
        ref = qm.int8_matmul(x, q, s, w_layout=layout)   # default XLA path
        qm.set_impl("pallas")
        qm.set_interpret(True)
        try:
            out = qm.int8_matmul(x, q, s, w_layout=layout)
        finally:
            qm.set_interpret(False)
            qm.set_impl("xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4,
                               rtol=1e-5)


def test_quantized_embedding_and_tied_head():
    with jax.default_device(jax.devices("cpu")[0]):  # exact-f32 reference
        w = jax.random.normal(jax.random.PRNGKey(5), (64, 32)) * 0.3
        p = {"weight": w}
        qp = vt.quantize_params({"embed_tokens": p})["embed_tokens"]
        assert qp["weight_q"].dtype == jnp.int8
        assert qp["scale"].shape == (64,)
        ids = jnp.asarray([[0, 7, 63, 7]])
        rows = cnn.embedding(qp, ids)
        recon = qp["weight_q"].astype(jnp.float32) * qp["scale"][:, None]
        np.testing.assert_allclose(np.asarray(rows),
                                   np.asarray(jnp.take(recon, ids, axis=0)),
                                   atol=1e-6)
        assert rows.dtype == w.dtype
        h = jax.random.normal(jax.random.PRNGKey(6), (3, 32), jnp.float32)
        logits = cnn.tied_lm_head(qp, h)
        ref = h @ recon.T
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref),
                               atol=1e-5)


QCFG = vt.QwenConfig(vocab_size=512, hidden_size=64, intermediate_size=128,
                     num_hidden_layers=2, num_attention_heads=4,
                     num_key_value_heads=2, head_dim=32,
                     max_position_embeddings=256, qk_norm=True,
                     eos_token_id=9999, tie_word_embeddings=True)


@pytest.fixture(scope="module")
def qwen_quant():
    model = vt.ModelForCausalLM(QCFG)
    params = model.init(jax.random.PRNGKey(2), dtype=jnp.float32)
    return model, vt.quantize_params(params)


def test_quantize_params_structure(qwen_quant):
    _, qparams = qwen_quant
    attn = qparams["layers"]["self_attn"]
    # scan-stacked layer kernels quantize per layer: [L, in, out] + [L, out]
    assert attn["q_proj"]["kernel_q"].dtype == jnp.int8
    assert attn["q_proj"]["kernel_q"].ndim == 3
    assert attn["q_proj"]["scale"].shape == \
        attn["q_proj"]["kernel_q"].shape[::2]
    assert "weight_q" in qparams["embed_tokens"]
    # norms stay fp
    assert "weight" in qparams["norm"]


def test_quantized_generate_runs_and_tracks_fp(qwen_quant):
    """Quantized greedy decode runs through the unchanged generate path and
    stays close to the fp trajectory on a smooth random model (first-token
    argmax agreement — quantization is lossy, so only the first greedy
    step, computed from identical inputs, is comparable)."""
    model, qparams = qwen_quant
    params = model.init(jax.random.PRNGKey(2), dtype=jnp.float32)
    ids = jnp.asarray([[3, 17, 42, 9, 21]], dtype=jnp.int32)
    out_q = model.apply(qparams, ids)
    out_f = model.apply(params, ids)
    assert out_q.logits.shape == out_f.logits.shape
    # int8 per-channel on a 64-wide model: logits err ~1e-2 scale
    np.testing.assert_allclose(np.asarray(out_q.logits),
                               np.asarray(out_f.logits), atol=0.1)
    toks = generate(model, qparams, ids, max_new_tokens=6, use_cache=True)
    assert toks.shape == (1, ids.shape[1] + 6)


def test_engine_quantized_matches_dense_quantized(qwen_quant):
    """Serving invariant, quantized edition: paged engine greedy with int8
    weights == dense static-cache greedy with the same int8 weights."""
    model, qparams = qwen_quant
    prompts = [[3, 17, 42, 9], [5, 11], [3, 17, 42, 9, 21, 33]]
    eng = ContinuousBatchEngine(model, qparams, num_blocks=64, block_size=8,
                                max_batch=4, max_blocks_per_seq=8,
                                max_new_tokens=6, dtype=jnp.float32,
                                prefill_buckets=(8, 16))
    sids = [eng.submit(p) for p in prompts]
    out = eng.run()
    for sid, prompt in zip(sids, prompts):
        ref = generate(model, qparams, jnp.asarray([prompt], jnp.int32),
                       max_new_tokens=6, use_cache=True)
        assert out[sid] == ref[0, len(prompt):].tolist(), f"seq {sid}"


def test_engine_quantized_weights_with_int8_pool(qwen_quant):
    """int8 weights and the int8 KV pool compose."""
    model, qparams = qwen_quant
    prompt = [3, 17, 42, 9, 21, 33]
    eng = ContinuousBatchEngine(model, qparams, num_blocks=64, block_size=8,
                                max_batch=2, max_blocks_per_seq=8,
                                max_new_tokens=5, dtype=jnp.int8,
                                prefill_buckets=(8,))
    sid = eng.submit(prompt)
    out = eng.run()
    assert len(out[sid]) == 5


def test_quantized_param_pspec_rules(qwen_quant):
    """Quantized trees shard like their fp originals: kernel_q takes the
    kernel rule; scales take the axis of the dim they scale (column-
    parallel out-dim → sharded with the columns; row-parallel → replicated;
    embedding → vocab-row-sharded)."""
    from jax.sharding import PartitionSpec as P
    from vyomai_tpu.parallel import param_pspec
    _, qparams = qwen_quant
    specs = param_pspec(qparams)
    attn = specs["layers"]["self_attn"]
    # stacked [L, in, out] column-parallel + its [L, out] scale
    assert attn["q_proj"]["kernel_q"] == P(None, None, "model")
    assert attn["q_proj"]["scale"] == P(None, "model")
    # row-parallel kernel: scale per out-channel is replicated
    assert attn["o_proj"]["kernel_q"] == P(None, "model", None)
    assert attn["o_proj"]["scale"] == P(None, None)
    # vocab-sharded embedding rows + per-row scale
    assert specs["embed_tokens"]["weight_q"] == P("model", None)
    assert specs["embed_tokens"]["scale"] == P("model")


def test_engine_tp_quantized_matches_single_chip(qwen_quant):
    """Int8 weights + tensor-parallel serving compose: the engine on a
    (1, 2) virtual CPU mesh with a quantized tree emits exactly the
    single-chip engine's greedy tokens with the same tree."""
    import numpy as np
    from jax.sharding import Mesh
    cpus = jax.devices("cpu")
    if len(cpus) < 2:
        pytest.skip("needs 2 virtual CPU devices")
    model, qparams = qwen_quant
    prompts = [[3, 17, 42, 9], [5, 11], [3, 17, 42, 9, 21, 33]]

    def run(mesh):
        eng = ContinuousBatchEngine(model, qparams, num_blocks=64,
                                    block_size=8, max_batch=4,
                                    max_blocks_per_seq=8, max_new_tokens=6,
                                    dtype=jnp.float32,
                                    prefill_buckets=(8, 16), mesh=mesh)
        sids = [eng.submit(p) for p in prompts]
        out = eng.run()
        return [out[s] for s in sids]

    with jax.default_device(cpus[0]):
        single = run(None)
        mesh = Mesh(np.asarray(cpus[:2]).reshape(1, 2), ("data", "model"))
        assert run(mesh) == single


def test_speculative_with_quantized_target(qwen_quant):
    """Speculative decoding composes with int8 weights: greedy speculative
    with a quantized target (and quantized drafter = same model) emits
    exactly the quantized greedy trajectory."""
    from vyomai_tpu.generation import speculative_generate, GreedyProcessor
    model, qparams = qwen_quant
    prompt = [3, 17, 42, 9, 21]
    ref = generate(model, qparams, jnp.asarray([prompt], jnp.int32),
                   max_new_tokens=8, use_cache=True)
    toks, acc = speculative_generate(
        [prompt], model, qparams, model, qparams, gamma=3,
        logits_processor=GreedyProcessor(), max_gen_len=8,
        eos_tokens_id=9999, pad_token_id=0)
    assert toks == ref[0, len(prompt):].tolist()
    assert acc == pytest.approx(1.0)  # drafter == target: all accepted


def test_dequantize_roundtrip_error(qwen_quant):
    model, qparams = qwen_quant
    params = model.init(jax.random.PRNGKey(2), dtype=jnp.float32)
    errs = vt.quantization_error(params, qparams)
    # every quantized tensor reconstructs within 1/254 of its abs-max
    assert max(errs.values()) <= 1.0 / 254 + 1e-6


def test_quantized_classic_decoder_generate():
    """The classic (reference-API) DecoderModel stack quantizes too:
    word_embeddings rows go int8 (the r3 name-detection fix — only
    embed_tokens matched before) and cached greedy generate runs."""
    cfg = vt.EncoderConfig(hidden_size=64, num_attention_heads=4,
                           num_key_value_heads=2, num_hidden_layers=2,
                           vocab_size=128, max_position_embeddings=64,
                           intermediate_size=256, hidden_dropout_prob=0.0)
    model = vt.DecoderModel(cfg, pos_embedding_type="rope",
                            attention_type="gqa")
    qparams = vt.quantize_params(model.init(jax.random.PRNGKey(0)))
    assert qparams["word_embeddings"]["weight_q"].dtype == jnp.int8
    assert qparams["lm_head"]["decoder"]["kernel_q"].dtype == jnp.int8
    ids = jnp.array([[3, 17, 42]], dtype=jnp.int32)
    out = model.generate(qparams, ids, max_len=6, use_cache=True)
    assert out.shape[1] == ids.shape[1] + 6


def test_quantized_checkpoint_roundtrip(qwen_quant, tmp_path):
    """Orbax save/restore preserves a quantized tree exactly — int8 leaves,
    fp scales, and the out_dtype marker (its dtype carries the embedding
    activation dtype through the checkpoint; one element, not zero —
    orbax refuses zero-size arrays)."""
    from vyomai_tpu.training import checkpoint as ckpt
    _, qparams = qwen_quant
    path = str(tmp_path / "q")
    ckpt.save_checkpoint(path, {"params": qparams, "step": 7})
    back = ckpt.restore_checkpoint(path,
                                   target={"params": qparams, "step": 0})
    assert back["step"] == 7
    rq = back["params"]
    assert rq["layers"]["self_attn"]["q_proj"]["kernel_q"].dtype == jnp.int8
    assert rq["embed_tokens"]["out_dtype"].dtype == \
        qparams["embed_tokens"]["out_dtype"].dtype
    for orig, rest in zip(jax.tree_util.tree_leaves(qparams),
                          jax.tree_util.tree_leaves(rq)):
        np.testing.assert_array_equal(np.asarray(orig), np.asarray(rest))


# ---------------------------------------------------------------------------
# Int4 (packed, group-scaled)
# ---------------------------------------------------------------------------

def test_quantize_weight_int4_roundtrip_and_bound():
    w = jax.random.normal(jax.random.PRNGKey(8), (256, 160)) * 0.04
    p, s = qm.quantize_weight_int4(w, group_size=128)
    assert p.dtype == jnp.int8 and p.shape == (128, 160)
    assert s.shape == (2, 160)
    lo, hi = qm._unpack_int4(p)
    assert int(jnp.max(jnp.abs(lo))) <= 7 and int(jnp.max(jnp.abs(hi))) <= 7
    recon = jnp.stack([lo, hi], axis=1).reshape(256, 160).astype(jnp.float32)
    recon = (recon.reshape(2, 128, 160) * s[:, None, :]).reshape(256, 160)
    err = np.abs(np.asarray(w) - np.asarray(recon))
    # symmetric round-to-nearest at 4 bits: error <= group scale / 2
    bound = np.repeat(np.asarray(s), 128, axis=0) * 0.5 + 1e-8
    assert (err <= bound).all()


def test_int4_matmul_fallback_matches_reference():
    with jax.default_device(jax.devices("cpu")[0]):  # exact-f32 reference
        x = jax.random.normal(jax.random.PRNGKey(9), (5, 256), jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(10), (256, 384)) * 0.05
        p, s = qm.quantize_weight_int4(w, group_size=128)
        out = qm.int4_matmul(x, p, s)                # CPU -> XLA path
        lo, hi = qm._unpack_int4(p)
        wq = jnp.stack([lo, hi], axis=1).reshape(256, 384).astype(jnp.float32)
        ref = x @ (wq.reshape(2, 128, 384) * s[:, None, :]).reshape(256, 384)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("m", [1, 5, 8])
@pytest.mark.parametrize("gs", [64, 128])
def test_int4_matmul_kernel_interpret_matches_fallback(m, gs):
    with jax.default_device(jax.devices("cpu")[0]):
        x = jax.random.normal(jax.random.PRNGKey(11), (m, 256), jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(12), (256, 384)) * 0.05
        p, s = qm.quantize_weight_int4(w, group_size=gs)
        ref = qm.int4_matmul(x, p, s)                # XLA path off-TPU
        qm.set_interpret(True)
        try:
            assert qm.supported_int4(256, 384, gs)
            out = qm.int4_matmul(x, p, s)            # Pallas (interpret)
        finally:
            qm.set_interpret(False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4,
                               rtol=1e-5)


@pytest.fixture(scope="module")
def qwen_quant4():
    model = vt.ModelForCausalLM(QCFG)
    params = model.init(jax.random.PRNGKey(2), dtype=jnp.float32)
    return model, vt.quantize_params(params, bits=4, group_size=64)


def test_quantize_params_bits4_structure(qwen_quant4):
    _, qp = qwen_quant4
    attn = qp["layers"]["self_attn"]
    # packed: [L, K/2, N]; scales: [L, K/gs, N]
    assert attn["q_proj"]["kernel_q4"].dtype == jnp.int8
    assert attn["q_proj"]["kernel_q4"].shape[1] * 2 == QCFG.hidden_size
    assert attn["q_proj"]["scale"].shape[1] == QCFG.hidden_size // 64
    # embeddings stay int8 rows (gather path wants whole dequantized rows)
    assert "weight_q" in qp["embed_tokens"]
    assert "weight" in qp["norm"]          # norms stay fp


def test_int4_dequantize_roundtrip_error(qwen_quant4):
    model, qp = qwen_quant4
    params = model.init(jax.random.PRNGKey(2), dtype=jnp.float32)
    errs = vt.quantization_error(params, qp)
    # group scale <= tensor amax / 7 -> error <= amax / 14
    assert max(errs.values()) <= 1.0 / 14 + 1e-6


def test_engine_int4_matches_dense_int4(qwen_quant4):
    """Serving invariant, int4 edition: paged engine greedy with packed
    int4 weights == dense static-cache greedy with the SAME weights (path
    parity, not lossless quantization)."""
    model, qp = qwen_quant4
    prompts = [[3, 17, 42, 9], [5, 11, 19]]
    eng = ContinuousBatchEngine(model, qp, num_blocks=64, block_size=8,
                                max_batch=4, max_blocks_per_seq=8,
                                max_new_tokens=6, dtype=jnp.float32,
                                prefill_buckets=(8, 16))
    sids = [eng.submit(p) for p in prompts]
    out = eng.run()
    for sid, prompt in zip(sids, prompts):
        ref = generate(model, qp, jnp.asarray([prompt], jnp.int32),
                       max_new_tokens=6, use_cache=True)
        assert out[sid] == ref[0, len(prompt):].tolist(), f"seq {sid}"


def test_quantize_params_bits4_indivisible_k_falls_back_int8():
    p = {"proj": {"kernel": jax.random.normal(jax.random.PRNGKey(13),
                                              (48, 64))}}
    qp = vt.quantize_params(p, bits=4, group_size=64)  # 48 % 64 != 0
    assert "kernel_q" in qp["proj"] and "kernel_q4" not in qp["proj"]


def test_int4_param_pspec_rules(qwen_quant4):
    """Int4 trees shard like fp: kernel_q4 (packed K/2 rows) takes the
    kernel rule; group scales [G, N] take the kernel's (K, N) axes — so
    row-parallel splits the group dim with the rows it scales."""
    from jax.sharding import PartitionSpec as P
    from vyomai_tpu.parallel import param_pspec
    _, qp = qwen_quant4
    specs = param_pspec(qp)
    attn = specs["layers"]["self_attn"]
    assert attn["q_proj"]["kernel_q4"] == P(None, None, "model")
    assert attn["q_proj"]["scale"] == P(None, None, "model")
    assert attn["o_proj"]["kernel_q4"] == P(None, "model", None)
    assert attn["o_proj"]["scale"] == P(None, "model", None)


def test_engine_tp_int4_matches_single_chip(qwen_quant4):
    """Int4 weights + tensor-parallel serving compose (XLA impl — the
    Pallas kernel is opaque to GSPMD): TP engine greedy == single-chip."""
    import numpy as np
    from jax.sharding import Mesh
    cpus = jax.devices("cpu")
    if len(cpus) < 2:
        pytest.skip("needs 2 virtual CPU devices")
    model, qp = qwen_quant4
    prompts = [[3, 17, 42, 9], [5, 11, 19]]

    def run(mesh):
        eng = ContinuousBatchEngine(model, qp, num_blocks=64,
                                    block_size=8, max_batch=4,
                                    max_blocks_per_seq=8, max_new_tokens=6,
                                    dtype=jnp.float32,
                                    prefill_buckets=(8, 16), mesh=mesh)
        sids = [eng.submit(list(p)) for p in prompts]
        out = eng.run()
        return [out[s] for s in sids]

    qm.set_impl4("xla")
    try:
        with jax.default_device(cpus[0]):
            single = run(None)
            mesh = Mesh(np.asarray(cpus[:2]).reshape(1, 2),
                        ("data", "model"))
            assert run(mesh) == single
    finally:
        qm.set_impl4("pallas")


@pytest.mark.parametrize("m,gs", [(8, 128), (1024, 128), (7, 256)])
def test_int4_matmul_kernel_on_tpu(m, gs):
    """Real-hardware compile of the int4 kernel (NOT interpret mode):
    Mosaic's block-mapping rules only apply here — the gs=128 per-group
    block (64 packed rows) once lowered fine in interpret mode but was
    rejected on the chip (r3 fix: K-blocks span whole 128-row tiles).
    m=1024 covers the prefill shape that first exposed it."""
    if jax.default_backend() != "tpu":
        pytest.skip("real TPU only")
    k, n = 512, 512
    w = jax.random.normal(jax.random.PRNGKey(20), (k, n)) * 0.05
    x = jax.random.normal(jax.random.PRNGKey(21), (m, k), jnp.bfloat16)
    p, s = qm.quantize_weight_int4(w, group_size=gs)
    assert qm.supported_int4(k, n, gs)
    out = qm.int4_matmul(x, p, s)                    # Pallas, on-chip
    lo, hi = qm._unpack_int4(p)
    wd = (jnp.stack([lo, hi], axis=1).reshape(k, n)
          .reshape(k // gs, gs, n).astype(jnp.float32)
          * s[:, None, :]).reshape(k, n)
    ref = x.astype(jnp.float32) @ wd
    rel = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)) /
                (jnp.max(jnp.abs(ref)) + 1e-9))
    assert rel < 0.01, rel


# ---------------------------------------------------------------------------
# W8A8 (dynamic per-token activation quant, int8 MXU contraction)
# ---------------------------------------------------------------------------

def test_quantize_activation_roundtrip_bound():
    x = jax.random.normal(jax.random.PRNGKey(30), (6, 96), jnp.float32) * 3.0
    xq, xs = qm.quantize_activation(x)
    assert xq.dtype == jnp.int8 and xs.shape == (6, 1)
    err = np.abs(np.asarray(x) - np.asarray(xq, np.float32) * np.asarray(xs))
    assert (err <= np.asarray(xs) * 0.5 + 1e-8).all()
    # zero row gets scale 1 and exact zeros
    xq0, xs0 = qm.quantize_activation(jnp.zeros((2, 96)))
    assert (np.asarray(xq0) == 0).all() and (np.asarray(xs0) == 1.0).all()


@pytest.mark.parametrize("layout", ["kn", "nk"])
def test_w8a8_matmul_matches_dequant_reference(layout):
    with jax.default_device(jax.devices("cpu")[0]):  # exact int32 contraction
        x = jax.random.normal(jax.random.PRNGKey(31), (5, 256), jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(32), (256, 128)) * 0.05
        wq, ws = qm.quantize_weight(w, contract_axis=0)
        xq, xs = qm.quantize_activation(x)
        ref = (xq.astype(jnp.float32) @ wq.astype(jnp.float32)) * xs * ws
        if layout == "kn":
            out = qm.w8a8_matmul(x, wq, ws)
        else:
            out = qm.w8a8_matmul(x, wq.T, ws, w_layout="nk")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-5)
    # both-operand rounding stays within the combined quant error bound
    full = np.asarray(x @ w)
    assert np.max(np.abs(np.asarray(out) - full)) / np.max(np.abs(full)) < 0.05


def test_w8a8_params_structure_and_guard():
    model = vt.ModelForCausalLM(QCFG)
    params = model.init(jax.random.PRNGKey(2), dtype=jnp.float32)
    qp = vt.quantize_params(params, act_bits=8)
    attn = qp["layers"]["self_attn"]
    assert "act_q" in attn["q_proj"] and "kernel_q" in attn["q_proj"]
    # embeddings/tied head stay weight-only (no act marker)
    assert "act_q" not in qp["embed_tokens"]
    with pytest.raises(AssertionError):
        vt.quantize_params(params, bits=4, act_bits=8)


def test_w8a8_untied_lm_head_stays_weight_only():
    # the docstring promises the logits head keeps weight-only dequant;
    # with tie_word_embeddings=False the head is a plain linear named
    # "lm_head" and must NOT receive the act_q marker.
    import dataclasses
    cfg = dataclasses.replace(QCFG, tie_word_embeddings=False)
    model = vt.ModelForCausalLM(cfg)
    params = model.init(jax.random.PRNGKey(2), dtype=jnp.float32)
    qp = vt.quantize_params(params, act_bits=8)
    assert "kernel_q" in qp["lm_head"]       # still weight-quantized
    assert "act_q" not in qp["lm_head"]      # but not W8A8
    assert "act_q" in qp["layers"]["self_attn"]["q_proj"]


def test_w8a8_nested_lm_head_decoder_stays_weight_only():
    """The classic DecoderModel nests its vocab projection as
    lm_head/decoder (models/encoder.py lm_head_init); under act_bits=8
    that inner linear must also keep weight-only dequant (ADVICE r3)."""
    cfg = vt.EncoderConfig(hidden_size=64, num_attention_heads=4,
                           num_key_value_heads=2, num_hidden_layers=2,
                           vocab_size=128, max_position_embeddings=64,
                           intermediate_size=256, hidden_dropout_prob=0.0)
    model = vt.DecoderModel(cfg, pos_embedding_type="rope",
                            attention_type="gqa")
    params = model.init(jax.random.PRNGKey(0), dtype=jnp.float32)
    qp = vt.quantize_params(params, act_bits=8)
    head = qp["lm_head"]["decoder"]
    assert "kernel_q" in head                # still weight-quantized
    assert "act_q" not in head               # but not W8A8
    # ordinary linears still get the W8A8 marker:
    assert "act_q" in qp["layers"]["attention"]["query"]


def test_w8a8_model_tracks_fp_and_decode_exact():
    """W8A8 apply stays close to fp logits, and cached greedy decode is
    token-exact vs uncached (per-token dynamic scales are batch- and
    position-independent, so prefill and single-token decode quantize each
    token identically)."""
    model = vt.ModelForCausalLM(QCFG)
    params = model.init(jax.random.PRNGKey(2), dtype=jnp.float32)
    qp = vt.quantize_params(params, act_bits=8)
    ids = jnp.asarray([[3, 17, 42, 9, 21]], dtype=jnp.int32)
    out_q = model.apply(qp, ids)
    out_f = model.apply(params, ids)
    np.testing.assert_allclose(np.asarray(out_q.logits),
                               np.asarray(out_f.logits), atol=0.15)
    cached = generate(model, qp, ids, max_new_tokens=6, use_cache=True)
    uncached = generate(model, qp, ids, max_new_tokens=6, use_cache=False)
    np.testing.assert_array_equal(np.asarray(cached), np.asarray(uncached))


def test_w8a8_engine_matches_dense_quantized():
    """Serving invariant, W8A8 edition: paged engine greedy == dense
    static-cache greedy with the same W8A8 params."""
    model = vt.ModelForCausalLM(QCFG)
    params = model.init(jax.random.PRNGKey(2), dtype=jnp.float32)
    qp = vt.quantize_params(params, act_bits=8)
    prompts = [[3, 17, 42, 9], [5, 11, 7]]
    eng = ContinuousBatchEngine(model, qp, num_blocks=64, block_size=8,
                                max_batch=4, max_blocks_per_seq=8,
                                max_new_tokens=5, dtype=jnp.float32,
                                prefill_buckets=(8,))
    sids = [eng.submit(p) for p in prompts]
    out = eng.run()
    for sid, prompt in zip(sids, prompts):
        ref = generate(model, qp, jnp.asarray([prompt], jnp.int32),
                       max_new_tokens=5, use_cache=True)
        assert out[sid] == ref[0, len(prompt):].tolist(), f"seq {sid}"
