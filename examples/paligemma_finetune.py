"""PaliGemma attention-only fine-tune + detection-box parsing (reference
``Examples/paligemma.ipynb`` cells 26/37: freeze everything whose name
lacks "attn", AdamW over the rest; cell 35: ``<locXXXX>`` quadruple
parsing).

TPU-first: the freeze is an optax mask (``trainable_mask`` +
``masked_optimizer``) instead of ``requires_grad`` flags — frozen params
carry no optimizer state and their updates are zeroed inside the one
jitted train step. Runs on synthetic data."""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

import vyomai_tpu as vt
from vyomai_tpu.models import parse_detection_boxes
from vyomai_tpu.ops.fused import cross_entropy
from vyomai_tpu.training import create_train_state, make_train_step


def main():
    cfg = vt.PaliGemmaConfig(
        vision_config=vt.SiglipVisionConfig(
            hidden_size=64, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, image_size=32, patch_size=8),
        text_config=vt.GemmaConfig(
            vocab_size=512, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=1, head_dim=16,
            max_position_embeddings=128),
        projection_dim=64, image_token_index=500)
    model = vt.PaliGemmaForConditionalGeneration(cfg)
    params = model.init(jax.random.PRNGKey(0))

    # --- attention-only freeze (notebook cell 26: "attn" in name) ---------
    mask = vt.trainable_mask(params, lambda p: "attn" in p)
    n_train = sum(int(np.prod(x.shape)) for x, m in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(mask))
        if m)
    n_total = sum(int(np.prod(x.shape))
                  for x in jax.tree_util.tree_leaves(params))
    print(f"trainable: {n_train}/{n_total} params "
          f"({100.0 * n_train / n_total:.1f}%)")
    opt = vt.masked_optimizer(optax.adamw(1e-4), mask)

    # --- synthetic detect-style batch -------------------------------------
    n_img = cfg.num_image_tokens
    rng = np.random.default_rng(0)
    bsz, suffix_len = 2, 12
    prompt = rng.integers(3, 499, size=(bsz, 6))
    suffix = rng.integers(3, 499, size=(bsz, suffix_len))
    ids = np.concatenate([np.full((bsz, n_img), cfg.image_token_index),
                          prompt, suffix], axis=1).astype(np.int32)
    ttype = np.concatenate([np.zeros((bsz, n_img + 6)),
                            np.ones((bsz, suffix_len))], axis=1)
    pixels = rng.normal(size=(bsz, 3, 32, 32)).astype(np.float32)
    batch = {"ids": jnp.asarray(ids), "ttype": jnp.asarray(ttype),
             "pixels": jnp.asarray(pixels)}

    def loss_fn(p, batch, rng):
        out = model.apply(p, batch["ids"], batch["pixels"],
                          token_type_ids=batch["ttype"])
        # suffix-only CLM loss (prefix tokens are conditioning)
        logits = out.logits[:, -suffix_len - 1:-1]
        labels = batch["ids"][:, -suffix_len:]
        return cross_entropy(logits, labels), {}

    step = make_train_step(loss_fn, opt)
    state = create_train_state(params, opt)
    # snapshot to host: the jitted step donates the state buffers
    frozen_before = np.asarray(
        state.params["vision_tower"]["post_layernorm"]["weight"])
    attn_before = np.asarray(
        state.params["language_model"]["layers"]["self_attn"]["q_proj"]
        ["kernel"])
    for i in range(5):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        print(f"step {i} loss {float(metrics['loss']):.4f}")
    frozen_after = np.asarray(
        state.params["vision_tower"]["post_layernorm"]["weight"])
    np.testing.assert_array_equal(frozen_before, frozen_after,
                                  err_msg="frozen param moved!")
    attn_after = np.asarray(
        state.params["language_model"]["layers"]["self_attn"]["q_proj"]
        ["kernel"])
    assert (attn_before != attn_after).any(), \
        "attention params did not train!"
    print("attention-only fine-tune OK (frozen towers untouched)")

    # --- detection output parsing (notebook cell 35) -----------------------
    text = ("<loc0256><loc0128><loc0768><loc0896> automobile ; "
            "<loc0100><loc0200><loc0300><loc0400> wheel")
    boxes, labels = parse_detection_boxes(text, image_size=(1024, 1024))
    print("boxes:", boxes.tolist(), "labels:", labels)
    assert boxes.shape == (2, 4) and labels[0].strip() == "automobile"


if __name__ == "__main__":
    main()
