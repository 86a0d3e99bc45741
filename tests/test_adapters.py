"""LoRA/DoRA adapter tests (pattern from reference ``tests/test_adapters.py``
shape matrix, plus tree-transform behavior)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vyomai_tpu as vt
from vyomai_tpu.layers.adapters import (
    LoraLinear, DoraLinear, inject_lora, inject_dora, merge_adapters,
    count_params)

# reference tests use (768,768),(768,3072),(3072,768); scaled to compile fast on 1-core CPU CI
SHAPES = [(64, 64), (64, 256), (256, 64)]


@pytest.mark.parametrize("din,dout", SHAPES)
def test_lora_linear_shapes(din, dout):
    layer = LoraLinear(din, dout, rank=8)
    p = layer.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, din))
    y = layer.apply(p, x)
    assert y.shape == (2, 5, dout)
    # zero-init B: LoRA path contributes nothing initially
    base = x @ p["linear"]["kernel"] + p["linear"]["bias"]
    np.testing.assert_allclose(np.asarray(y), np.asarray(base), atol=1e-6)


@pytest.mark.parametrize("din,dout", SHAPES)
def test_dora_linear_shapes(din, dout):
    layer = DoraLinear(din, dout, rank=8)
    p = layer.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, din))
    y = layer.apply(p, x)
    assert y.shape == (2, 5, dout)
    # zero-init A and m = ||W||: DoRA initially reproduces the base linear.
    # m * (W / ||W||) only cancels exactly in infinite precision; on TPU the
    # MXU's default bf16-multiply fp32 matmul leaves ~1e-3 residue.
    base = x @ p["linear"]["kernel"] + p["linear"]["bias"]
    np.testing.assert_allclose(np.asarray(y), np.asarray(base), atol=3e-3)


CFG = vt.EncoderConfig(hidden_size=64, num_attention_heads=4,
                       num_key_value_heads=2, num_hidden_layers=2,
                       vocab_size=128, max_position_embeddings=64,
                       intermediate_size=256, hidden_dropout_prob=0.0)


def test_inject_lora_identity_and_trainability():
    model = vt.DecoderModel(CFG, pos_embedding_type="rope")
    params = model.init(jax.random.PRNGKey(0))
    ids = jnp.array([[3, 17, 42]])
    adapters = inject_lora(params, jax.random.PRNGKey(5), rank=4)
    merged = merge_adapters(params, adapters)
    o1 = model.apply(params, ids)
    o2 = model.apply(merged, ids)
    np.testing.assert_allclose(np.asarray(o1.logits), np.asarray(o2.logits),
                               atol=1e-6)
    # adapter param count is a small fraction of base
    assert count_params(adapters["tree"]) < 0.3 * count_params(params)

    # gradients flow into the adapter factors through the merge
    # (differentiate w.r.t. the factor tree; kind/alpha are static metadata)
    def loss(tree):
        ad = {**adapters, "tree": tree}
        out = model.apply(merge_adapters(params, ad), ids)
        return jnp.mean(out.logits ** 2)
    g = jax.grad(loss)(adapters["tree"])
    gnorm = sum(float(jnp.abs(x).sum())
                for x in jax.tree_util.tree_leaves(g))
    assert gnorm > 0.0


def test_inject_dora_identity():
    model = vt.DecoderModel(CFG, pos_embedding_type="rope")
    params = model.init(jax.random.PRNGKey(0))
    ids = jnp.array([[3, 17, 42]])
    adapters = inject_dora(params, jax.random.PRNGKey(5), rank=4)
    merged = merge_adapters(params, adapters)
    o1 = model.apply(params, ids)
    o2 = model.apply(merged, ids)
    np.testing.assert_allclose(np.asarray(o1.logits), np.asarray(o2.logits),
                               atol=1e-4)


def test_inject_lora_filter():
    model = vt.DecoderModel(CFG, pos_embedding_type="rope")
    params = model.init(jax.random.PRNGKey(0))
    adapters = inject_lora(params, jax.random.PRNGKey(5), rank=4,
                           filter_fn=lambda p: "attention" in p)
    flat = jax.tree_util.tree_leaves(adapters["tree"])
    # only attention linears got factors; ffn/lm_head did not
    full = inject_lora(params, jax.random.PRNGKey(5), rank=4)
    assert len(flat) < len(jax.tree_util.tree_leaves(full["tree"]))


QWEN_CFG = vt.QwenConfig(vocab_size=256, hidden_size=64,
                         intermediate_size=128, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         head_dim=32, max_position_embeddings=64,
                         qk_norm=True, eos_token_id=9999,
                         tie_word_embeddings=True)


def test_qlora_identity_over_int8_base():
    """LoRA over a quantized base: zero-init B means the merged forward
    equals the plain quantized forward, and the base stays int8 (no
    dequantized kernel materializes in the merged tree)."""
    model = vt.ModelForCausalLM(QWEN_CFG)
    params = model.init(jax.random.PRNGKey(0))
    qparams = vt.quantize_params(params)
    ids = jnp.array([[3, 17, 42, 9]])
    adapters = inject_lora(qparams, jax.random.PRNGKey(5), rank=4)
    merged = merge_adapters(qparams, adapters)
    assert merged["layers"]["self_attn"]["q_proj"]["kernel_q"].dtype == \
        jnp.int8
    assert "kernel" not in merged["layers"]["self_attn"]["q_proj"]
    o1 = model.apply(qparams, ids)
    o2 = model.apply(merged, ids)
    np.testing.assert_allclose(np.asarray(o1.logits), np.asarray(o2.logits),
                               atol=1e-6)


def test_qlora_trains_adapters_only():
    """A few SGD steps on the adapter tree reduce the loss while the int8
    base is untouched (it is not even an argument of the grad)."""
    import optax

    model = vt.ModelForCausalLM(QWEN_CFG)
    params = model.init(jax.random.PRNGKey(0))
    qparams = vt.quantize_params(params)
    ids = jnp.array([[3, 17, 42, 9, 21, 5]])
    targets = jnp.array([[17, 42, 9, 21, 5, 30]])
    adapters = inject_lora(qparams, jax.random.PRNGKey(5), rank=4)

    def loss_fn(tree):
        merged = merge_adapters(qparams, {**adapters, "tree": tree})
        logits = model.apply(merged, ids).logits
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, targets).mean()

    opt = optax.sgd(0.5)
    tree = adapters["tree"]
    state = opt.init(tree)
    losses = []
    for _ in range(5):
        l, g = jax.value_and_grad(loss_fn)(tree)
        updates, state = opt.update(g, state)
        tree = optax.apply_updates(tree, updates)
        losses.append(float(l))
    assert losses[-1] < losses[0] - 0.05, losses
    # grads reached the factors (B first step; A after B moves)
    gnorm = sum(float(jnp.abs(x).sum())
                for x in jax.tree_util.tree_leaves(g))
    assert gnorm > 0.0


def test_dora_over_int8_base_raises():
    model = vt.ModelForCausalLM(QWEN_CFG)
    params = model.init(jax.random.PRNGKey(0))
    qparams = vt.quantize_params(params)
    with pytest.raises(ValueError, match="DoRA over an int8"):
        inject_dora(qparams, jax.random.PRNGKey(5), rank=4)


def test_trainable_mask_and_masked_optimizer():
    """Frozen leaves never move; masked leaves train (reference
    paligemma.ipynb cell 26 freeze-all-but-attention recipe)."""
    import optax
    from vyomai_tpu.layers.adapters import trainable_mask, masked_optimizer

    model = vt.DecoderModel(CFG, pos_embedding_type="rope")
    params = model.init(jax.random.PRNGKey(0))
    mask = trainable_mask(params, lambda p: "attention" in p)
    # mask mirrors the params tree structure
    assert jax.tree_util.tree_structure(mask) == \
        jax.tree_util.tree_structure(
            jax.tree_util.tree_map(lambda _: True, params))
    opt = masked_optimizer(optax.sgd(0.5), mask)
    opt_state = opt.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = opt.update(grads, opt_state, params)

    def check(path, upd, m):
        if m:
            assert bool(jnp.any(upd != 0)), path
        else:
            assert bool(jnp.all(upd == 0)), path

    jax.tree_util.tree_map(lambda u, m: check("", u, m), updates, mask)
