"""PaliGemma / Gemma / Qwen / CLIP model tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vyomai_tpu as vt

VCFG = vt.SiglipVisionConfig(hidden_size=64, intermediate_size=128,
                             num_hidden_layers=2, num_attention_heads=4,
                             image_size=32, patch_size=8)
TCFG = vt.GemmaConfig(vocab_size=512, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=1, head_dim=32,
                      max_position_embeddings=128)
PGCFG = vt.PaliGemmaConfig(vision_config=VCFG, text_config=TCFG,
                           projection_dim=64, image_token_index=500)
QCFG = vt.QwenConfig(vocab_size=512, hidden_size=64, intermediate_size=128,
                     num_hidden_layers=2, num_attention_heads=4,
                     num_key_value_heads=2, head_dim=32,
                     max_position_embeddings=128, qk_norm=True)


@pytest.fixture(scope="module")
def paligemma():
    model = vt.PaliGemmaForConditionalGeneration(PGCFG)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


@pytest.fixture(scope="module")
def pg_inputs():
    B, n_img = 2, PGCFG.num_image_tokens
    ids = jnp.concatenate(
        [jnp.full((B, n_img), 500, dtype=jnp.int32),
         jnp.arange(6, dtype=jnp.int32)[None].repeat(B, 0) + 3], axis=1)
    px = jax.random.normal(jax.random.PRNGKey(1), (B, 3, 32, 32))
    return ids, px


def test_paligemma_forward_shapes(paligemma, pg_inputs):
    model, params = paligemma
    ids, px = pg_inputs
    tt = jnp.zeros_like(ids)
    out = model.apply(params, ids, px, token_type_ids=tt)
    assert out.logits.shape == (2, ids.shape[1], 512)
    assert jnp.all(jnp.isfinite(out.logits))


def test_paligemma_image_fusion_changes_image_positions(paligemma, pg_inputs):
    """Different pixels must change logits; different image content at the
    <image> positions feeds through the projector."""
    model, params = paligemma
    ids, px = pg_inputs
    o1 = model.apply(params, ids, px)
    o2 = model.apply(params, ids, px + 1.0)
    assert not jnp.allclose(o1.logits, o2.logits)


def test_paligemma_prefix_lm_mask(paligemma, pg_inputs):
    """Inside the prefix, later tokens influence earlier positions
    (bidirectional); with a causal-only mask they could not."""
    model, params = paligemma
    ids, px = pg_inputs
    tt = jnp.zeros_like(ids)  # everything is prefix
    o1 = model.apply(params, ids, px, token_type_ids=tt)
    ids2 = ids.at[:, -1].set(99)  # change the last prefix token
    o2 = model.apply(params, ids2, px, token_type_ids=tt)
    # position 0 logits change because prefix attention is bidirectional
    assert not jnp.allclose(o1.logits[:, 0], o2.logits[:, 0])


def test_paligemma_cached_decode_parity(paligemma, pg_inputs):
    model, params = paligemma
    ids, px = pg_inputs
    tt = jnp.zeros_like(ids)
    full = model.apply(params, ids, px, token_type_ids=tt)
    cache = model.init_cache(batch_size=2, max_len=32)
    pre = model.apply(params, ids, px, token_type_ids=tt, cache=cache,
                      start_pos=0)
    np.testing.assert_allclose(np.asarray(pre.logits),
                               np.asarray(full.logits), atol=1e-3)
    np.testing.assert_array_equal(
        np.asarray(jnp.argmax(pre.logits[:, -1], -1)),
        np.asarray(jnp.argmax(full.logits[:, -1], -1)))


def test_paligemma_generate(paligemma, pg_inputs):
    model, params = paligemma
    ids, px = pg_inputs
    toks = model.generate(params, ids, px, max_new_tokens=4)
    assert toks.shape == (2, ids.shape[1] + 4)
    np.testing.assert_array_equal(np.asarray(toks[:, :ids.shape[1]]),
                                  np.asarray(ids))


def test_qwen_incremental_parity():
    model = vt.ModelForCausalLM(QCFG)
    params = model.init(jax.random.PRNGKey(2))
    ids = jnp.arange(8, dtype=jnp.int32)[None] + 1
    full = model.apply(params, ids).logits
    cache = model.init_cache(batch_size=1, max_len=16)
    out = model.apply(params, ids[:, :4], cache=cache, start_pos=0)
    np.testing.assert_allclose(np.asarray(out.logits),
                               np.asarray(full[:, :4]), atol=1e-3)
    cache = out.kv_cache
    for t in range(4, 8):
        out = model.apply(params, ids[:, t:t + 1], cache=cache, start_pos=t)
        cache = out.kv_cache
        np.testing.assert_array_equal(
            np.asarray(jnp.argmax(out.logits[:, 0], -1)),
            np.asarray(jnp.argmax(full[:, t], -1)))


def test_qwen_qk_norm_params_exist():
    model = vt.ModelForCausalLM(QCFG)
    params = model.init(jax.random.PRNGKey(2))
    assert "q_norm" in params["layers"]["self_attn"]
    model2 = vt.ModelForCausalLM(QCFG.__class__(
        **{**QCFG.__dict__, "qk_norm": False}))
    params2 = model2.init(jax.random.PRNGKey(2))
    assert "q_norm" not in params2["layers"]["self_attn"]


def test_clip_loss_and_gradient():
    from vyomai_tpu.training import clip_loss
    ccfg = vt.CLIPConfig(
        text_config=vt.EncoderConfig(
            hidden_size=64, num_attention_heads=4, num_hidden_layers=2,
            vocab_size=128, max_position_embeddings=64,
            intermediate_size=128, hidden_dropout_prob=0.0),
        vision_config=vt.VisionConfig(
            hidden_size=64, num_attention_heads=4, num_hidden_layers=2,
            intermediate_size=128, image_size=(32, 32), patch_size=(8, 8),
            hidden_dropout_prob=0.0),
        projection_dim=32)
    clip = vt.CLIPModel(ccfg)
    params = clip.init(jax.random.PRNGKey(3))
    ids = jnp.ones((2, 10), jnp.int32)
    px = jax.random.normal(jax.random.PRNGKey(4), (2, 3, 32, 32))

    def loss(p):
        img, txt, scale = clip.apply(p, ids, px)
        return clip_loss(img, txt, scale)

    l, g = jax.value_and_grad(loss)(params)
    assert jnp.isfinite(l)
    gnorm = sum(float(jnp.abs(x).sum())
                for x in jax.tree_util.tree_leaves(g))
    assert gnorm > 0


def test_clip_loss_all_gather_multidevice():
    """clip_loss with axis_name gathers negatives across devices (virtual
    CPU mesh)."""
    from vyomai_tpu.training import clip_loss
    cpus = jax.devices("cpu")
    if len(cpus) < 4:
        pytest.skip("needs 4 virtual CPU devices")
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map
    mesh = Mesh(np.array(cpus[:4]), ("data",))
    img = jax.random.normal(jax.random.PRNGKey(0), (8, 16))
    txt = jax.random.normal(jax.random.PRNGKey(1), (8, 16))
    scale = jnp.asarray(1.0)

    global_loss = clip_loss(img, txt, scale)

    fn = shard_map(
        lambda i, t: clip_loss(i, t, scale, axis_name="data")[None],
        mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P("data"))
    with jax.default_device(cpus[0]):
        per_dev = fn(img, txt)
    # per-device means average to the global mean (fp32 reorder ~1e-4)
    np.testing.assert_allclose(float(jnp.mean(per_dev)), float(global_loss),
                               atol=1e-3)


def test_speculative_on_qwen_matches_greedy():
    """speculative_generate works on the modern CLM protocol; greedy
    drafter==target reproduces plain greedy (BASELINE config 5 requires
    speculative decoding on the modern/VLM text stack)."""
    from vyomai_tpu.generation import speculative_generate, GreedyProcessor
    from vyomai_tpu.generation import generate
    model = vt.ModelForCausalLM(QCFG.__class__(
        **{**QCFG.__dict__, "max_position_embeddings": 64}))
    params = model.init(jax.random.PRNGKey(4))
    prompt = jnp.array([[3, 17, 42]])
    toks, acc = speculative_generate(
        prompt, model, params, model, params, gamma=3,
        logits_processor=GreedyProcessor(), max_gen_len=8,
        eos_tokens_id=9999, pad_token_id=1)
    ref = generate(model, params, prompt, max_new_tokens=8, use_cache=True)
    assert toks == ref[0, 3:].tolist()
    assert acc == 1.0


def test_generate_free_function_on_gemma():
    """The jitted decode loop drives GemmaModel through the same protocol."""
    from vyomai_tpu.generation import generate
    model = vt.GemmaModel(TCFG)
    params = model.init(jax.random.PRNGKey(5))
    prompt = jnp.array([[3, 17, 42, 9]])
    t1 = generate(model, params, prompt, max_new_tokens=5, use_cache=True)
    t2 = generate(model, params, prompt, max_new_tokens=5, use_cache=False)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_rpad_vlm_fusion_and_prefix():
    from vyomai_tpu.models.rpad_vlm import RPADVisionLanguageModel
    vcfg = vt.VisionConfig(hidden_size=64, num_attention_heads=4,
                           num_hidden_layers=2, intermediate_size=128,
                           image_size=(32, 32), patch_size=(8, 8),
                           hidden_dropout_prob=0.0)
    tcfg = vt.EncoderConfig(hidden_size=64, num_attention_heads=4,
                            num_key_value_heads=2, num_hidden_layers=2,
                            vocab_size=512, max_position_embeddings=64,
                            intermediate_size=128, hidden_dropout_prob=0.0)
    model = RPADVisionLanguageModel(tcfg, vt.Vit(vcfg), image_token_id=500,
                                    pos_embedding_type="rope")
    params = model.init(jax.random.PRNGKey(0))
    n_img = vcfg.num_patches + 1
    ids = jnp.concatenate(
        [jnp.full((2, n_img), 500, jnp.int32),
         jnp.arange(5, dtype=jnp.int32)[None].repeat(2, 0) + 3], axis=1)
    px = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32, 32))
    tt = jnp.concatenate([jnp.zeros((2, n_img + 2), jnp.int32),
                          jnp.ones((2, 3), jnp.int32)], axis=1)
    out = model.apply(params, ids, px, token_type_ids=tt)
    assert out.logits.shape == (2, n_img + 5, 512)
    # image pixels reach logits
    out2 = model.apply(params, ids, px + 1.0, token_type_ids=tt)
    assert not jnp.allclose(out.logits, out2.logits)
    # prefix-LM: a later prefix token affects position 0
    ids2 = ids.at[:, n_img + 1].set(99)
    out3 = model.apply(params, ids2, px, token_type_ids=tt)
    assert not jnp.allclose(out.logits[:, 0], out3.logits[:, 0])


def test_chat_template():
    from vyomai_tpu.serving.chat import build_chat_prompt
    ids = build_chat_prompt(
        [("system", "be brief"), ("user", "hello")],
        tokenize=lambda s: [ord(c) % 50 + 10 for c in s],
        im_start_id=1, im_end_id=2, newline_id=3)
    assert ids[0] == 1 and ids.count(2) == 2
    # generation prompt appended
    assert ids[-1] == 3


def test_language_modeling_dataset(tmp_path):
    import os
    from vyomai_tpu.training import LanguageModeling
    path = os.path.join(str(tmp_path), "corpus.txt")
    open(path, "w").write("tok " * 200)
    tok = lambda t: list(range(len(t.split())))
    ds = LanguageModeling(tok, path, 16)
    assert len(ds) == 12
    assert ds[0]["input_ids"].shape == (16,)
    # cache round-trip
    ds2 = LanguageModeling(tok, path, 16)
    np.testing.assert_array_equal(ds[3]["input_ids"], ds2[3]["input_ids"])


def test_sharded_sdpa_matches_single_device():
    """shard_map-wrapped attention over a head-sharded CPU mesh equals the
    single-device result (TP attention without collectives)."""
    from jax.sharding import Mesh
    from vyomai_tpu.parallel.tp_attention import sharded_sdpa
    from vyomai_tpu.layers.attention import sdpa, set_sdpa_impl
    from vyomai_tpu.core.masks import causal_mask
    cpus = jax.devices("cpu")
    if len(cpus) < 4:
        pytest.skip("needs 4 virtual CPU devices")
    mesh = Mesh(np.array(cpus[:4]), ("model",))
    B, H, L, D = 2, 8, 32, 16
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, L, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, H, L, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, H, L, D))
    mask = causal_mask(L, None, batch_size=B)
    set_sdpa_impl("xla")
    with jax.default_device(cpus[0]):
        ref = sdpa(q, k, v, mask)
        out = sharded_sdpa(mesh, q, k, v, mask)
    set_sdpa_impl("auto")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_matches_full(causal):
    """Sequence-parallel ring attention over a 4-device CPU ring equals
    single-device full attention (both mask regimes)."""
    from jax.sharding import Mesh
    from vyomai_tpu.ops.ring_attention import ring_attention
    from vyomai_tpu.layers.attention import sdpa, set_sdpa_impl
    from vyomai_tpu.core.masks import causal_mask
    cpus = jax.devices("cpu")
    if len(cpus) < 4:
        pytest.skip("needs 4 virtual CPU devices")
    mesh = Mesh(np.array(cpus[:4]), ("sp",))
    B, H, L, D = 2, 4, 64, 16
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, L, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, H, L, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, H, L, D))
    set_sdpa_impl("xla")
    with jax.default_device(cpus[0]):
        mask = causal_mask(L, None, batch_size=B) if causal else None
        ref = sdpa(q, k, v, mask)
        out = ring_attention(q, k, v, mesh=mesh, causal=causal)
    set_sdpa_impl("auto")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("layout", ["contiguous", "zigzag"])
def test_ring_attention_gqa_layouts(layout):
    """Ring attention v2: GQA (H_kv < H) under both shard layouts equals
    single-device full attention. Zigzag inputs are pre-permuted with
    zigzag_shard and the output unpermuted."""
    from jax.sharding import Mesh
    from vyomai_tpu.ops.ring_attention import (ring_attention, zigzag_shard,
                                               zigzag_unshard)
    from vyomai_tpu.layers.attention import repeat_kv, sdpa, set_sdpa_impl
    cpus = jax.devices("cpu")
    if len(cpus) < 4:
        pytest.skip("needs 4 virtual CPU devices")
    n = 4
    mesh = Mesh(np.array(cpus[:n]), ("sp",))
    B, H, HKV, L, D = 2, 8, 2, 64, 16
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, L, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, HKV, L, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, HKV, L, D))
    set_sdpa_impl("xla")
    with jax.default_device(cpus[0]):
        ref = sdpa(q, repeat_kv(k, H // HKV), repeat_kv(v, H // HKV),
                   None, causal=True)
        if layout == "zigzag":
            qs, ks, vs = (zigzag_shard(x, n) for x in (q, k, v))
            out = ring_attention(qs, ks, vs, mesh=mesh, causal=True,
                                 layout="zigzag", block_k=8)
            out = zigzag_unshard(out, n)
        else:
            out = ring_attention(q, k, v, mesh=mesh, causal=True, block_k=8)
    set_sdpa_impl("auto")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_attention_long_context_32k():
    """32k-token causal ring attention runs on the 8-device CPU mesh with
    blockwise (O(Lc*block)) memory. Correctness probe: with v == 1 any
    correctly normalized attention returns exactly 1 everywhere, and every
    row must have at least one visible key (masking/skip reachability)."""
    from jax.sharding import Mesh
    from vyomai_tpu.ops.ring_attention import ring_attention, zigzag_shard
    cpus = jax.devices("cpu")
    if len(cpus) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    n = 8
    mesh = Mesh(np.array(cpus[:n]), ("sp",))
    B, H, HKV, L, D = 1, 2, 1, 32768, 16
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, L, D),
                          dtype=jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, HKV, L, D),
                          dtype=jnp.float32)
    v = jnp.ones((B, HKV, L, D), dtype=jnp.float32)
    qs, ks, vs = (zigzag_shard(x, n) for x in (q, k, v))
    out = ring_attention(qs, ks, vs, mesh=mesh, causal=True,
                         layout="zigzag", block_k=512)
    out = np.asarray(out)
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, np.ones_like(out), atol=1e-5)


@pytest.mark.parametrize("layout", ["contiguous", "zigzag"])
def test_ring_attention_flash_impl_matches_xla(layout):
    """The flash-kernel ring body (per-shard-pair Pallas calls merged via
    logsumexp) equals the blockwise XLA fold — GQA, causal, both layouts.
    Runs the kernel in interpret mode off-TPU."""
    from jax.sharding import Mesh
    from vyomai_tpu.ops import flash_attention as fa
    from vyomai_tpu.ops.ring_attention import (ring_attention, zigzag_shard,
                                               zigzag_unshard)
    cpus = jax.devices("cpu")
    if len(cpus) < 4:
        pytest.skip("needs 4 virtual CPU devices")
    n = 4
    mesh = Mesh(np.array(cpus[:n]), ("sp",))
    B, H, HKV, L, D = 1, 4, 2, 64, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, L, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, HKV, L, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, HKV, L, D))
    if layout == "zigzag":
        q, k, v = (zigzag_shard(x, n) for x in (q, k, v))
    with jax.default_device(cpus[0]):
        ref = ring_attention(q, k, v, mesh=mesh, causal=True, layout=layout,
                             impl="xla", block_k=8)
        fa.set_interpret(True)
        try:
            out = ring_attention(q, k, v, mesh=mesh, causal=True,
                                 layout=layout, impl="flash")
        finally:
            fa.set_interpret(False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("layout", ["contiguous", "zigzag"])
def test_ring_attention_flash_gradients(layout):
    """Sequence-parallel TRAINING: the flash ring's custom VJP (backward
    ring of per-pair flash-backward kernels, dk/dv rotating home) matches
    autodiff through single-device attention for q, k, and v grads."""
    from jax.sharding import Mesh
    from vyomai_tpu.ops import flash_attention as fa
    from vyomai_tpu.ops.ring_attention import (ring_attention, zigzag_shard,
                                               zigzag_unshard)
    from vyomai_tpu.layers.attention import repeat_kv, sdpa, set_sdpa_impl
    cpus = jax.devices("cpu")
    if len(cpus) < 4:
        pytest.skip("needs 4 virtual CPU devices")
    n = 4
    mesh = Mesh(np.array(cpus[:n]), ("sp",))
    B, H, HKV, L, D = 1, 4, 2, 64, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, L, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, HKV, L, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, HKV, L, D))
    g_out = jax.random.normal(jax.random.PRNGKey(3), (B, H, L, D))

    set_sdpa_impl("xla")
    with jax.default_device(cpus[0]):
        def ref_loss(q_, k_, v_):
            o = sdpa(q_, repeat_kv(k_, H // HKV), repeat_kv(v_, H // HKV),
                     None, causal=True)
            return jnp.sum(o * g_out)
        ref_grads = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)

        if layout == "zigzag":
            qs, ks, vs, gs = (zigzag_shard(x, n) for x in (q, k, v, g_out))
        else:
            qs, ks, vs, gs = q, k, v, g_out

        def ring_loss(q_, k_, v_):
            o = ring_attention(q_, k_, v_, mesh=mesh, causal=True,
                               layout=layout, impl="flash")
            return jnp.sum(o * gs)
        fa.set_interpret(True)
        try:
            grads = jax.grad(ring_loss, argnums=(0, 1, 2))(qs, ks, vs)
        finally:
            fa.set_interpret(False)
        if layout == "zigzag":
            grads = tuple(zigzag_unshard(g, n) for g in grads)
    set_sdpa_impl("auto")
    for g, r, name in zip(grads, ref_grads, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=5e-5,
                                   err_msg=f"d{name}")


def test_model_structural_identity_shares_jit_programs():
    """Two ModelForCausalLM instances with equal configs are equal and
    hash equal, so jitted programs taking the model as a static argument
    (serving/paged_model.py, generation/generate.py) are shared across
    rebuilt models/engines instead of recompiling — on the TPU rig a
    fresh 1B-param serving engine otherwise repays ~10 min of remote
    compilation. Dict/list config fields (rope_scaling, eos lists) are
    canonicalized by config.config_key."""
    import dataclasses
    from functools import partial

    cfg = vt.QwenConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=1,
        head_dim=8, max_position_embeddings=32)
    scaled = dataclasses.replace(
        cfg, rope_scaling={"rope_type": "yarn", "factor": 2.0})

    m1, m2 = vt.ModelForCausalLM(cfg), vt.ModelForCausalLM(cfg)
    m3 = vt.ModelForCausalLM(scaled)
    assert m1 == m2 and hash(m1) == hash(m2)
    assert m1 != m3 and hash(m1) != hash(m3)
    assert m3 == vt.ModelForCausalLM(scaled)  # dict field hashes fine

    traces = []

    @partial(jax.jit, static_argnums=(0,))
    def f(model, x):
        traces.append(model)
        return x * model.config.hidden_size

    f(m1, jnp.ones(2))
    f(m2, jnp.ones(2))          # equal-config instance: no retrace
    assert len(traces) == 1
    f(m3, jnp.ones(2))          # different config: its own program
    assert len(traces) == 2


def test_structural_identity_all_families():
    """The StructuralIdentity mixin covers every model family: equal
    constructor args => equal + hash-equal (shared jit programs across
    rebuilt instances); ANY differing option => unequal (no false program
    sharing). Composed models (seq2seq, VLM) compare via their
    sub-models."""
    ecfg = vt.EncoderConfig(
        hidden_size=32, num_attention_heads=4, num_key_value_heads=2,
        num_hidden_layers=1, vocab_size=64, max_position_embeddings=32,
        intermediate_size=64)

    # option fields are part of identity
    d1 = vt.DecoderModel(ecfg, "rope", "gqa")
    assert d1 == vt.DecoderModel(ecfg, "rope", "gqa")
    assert hash(d1) == hash(vt.DecoderModel(ecfg, "rope", "gqa"))
    assert d1 != vt.DecoderModel(ecfg, "rope")            # attention kind
    assert d1 != vt.DecoderModel(ecfg, "absolute", "gqa")  # pos embedding
    assert d1 != vt.DecoderModel(ecfg, "rope", "gqa", remat=True)
    assert vt.EncoderModel(ecfg, "rope") == vt.EncoderModel(ecfg, "rope")
    assert vt.EncoderModel(ecfg, "rope") != vt.DecoderModel(ecfg, "rope")

    # composed: seq2seq + VLM identity recurses through sub-models
    s1 = vt.EncoderDecoderModel(ecfg, ecfg, decoder_attention_type="gqa")
    assert s1 == vt.EncoderDecoderModel(ecfg, ecfg,
                                        decoder_attention_type="gqa")
    assert s1 != vt.EncoderDecoderModel(ecfg, ecfg)
    vcfg = vt.VisionConfig(hidden_size=32, num_attention_heads=4,
                           num_hidden_layers=1, image_size=(16, 16),
                           patch_size=(8, 8), intermediate_size=64)
    vlm = vt.VisionLanguageModel(ecfg, vt.Vit(vcfg), "rope")
    assert vlm == vt.VisionLanguageModel(ecfg, vt.Vit(vcfg), "rope")
    assert vlm != vt.VisionLanguageModel(ecfg, vt.Vit(vcfg), "absolute")

    # nested-config families (PaliGemma holds vision+text dataclasses)
    pcfg = vt.PaliGemmaConfig(
        vision_config=vt.SiglipVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=1,
            num_attention_heads=4, image_size=16, patch_size=8),
        text_config=vt.GemmaConfig(
            vocab_size=64, hidden_size=32, intermediate_size=64,
            num_hidden_layers=1, num_attention_heads=4,
            num_key_value_heads=2, head_dim=8,
            max_position_embeddings=32),
        projection_dim=32, image_token_index=60)
    p1 = vt.PaliGemmaForConditionalGeneration(pcfg)
    assert p1 == vt.PaliGemmaForConditionalGeneration(pcfg) and \
        hash(p1) == hash(vt.PaliGemmaForConditionalGeneration(pcfg))
