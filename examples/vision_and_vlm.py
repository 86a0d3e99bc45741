"""Vision workloads: ViT classification (N13), CLIP contrastive
pretraining with mesh all-gathered negatives (N17), VLM captioning with
CLS-prepend fusion (N14), and OCR seq2seq (N15).

Synthetic data by default (zero-egress); swap the data loaders for
torchvision/HF datasets where available."""

import argparse

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import vyomai_tpu as vt
from vyomai_tpu.core import nn as cnn
from vyomai_tpu.generation import generate_multimodel, generate_seq2seq
from vyomai_tpu.models.ocr import OCRModel
from vyomai_tpu.ops.fused import cross_entropy
from vyomai_tpu.training import Trainer, clip_loss, make_optimizer

VCFG = vt.VisionConfig(hidden_size=256, num_attention_heads=8,
                       num_hidden_layers=4, intermediate_size=1024,
                       image_size=(64, 64), patch_size=(16, 16),
                       hidden_dropout_prob=0.0)
TCFG = vt.EncoderConfig(hidden_size=256, num_attention_heads=8,
                        num_hidden_layers=4, vocab_size=2048,
                        max_position_embeddings=128,
                        intermediate_size=1024, hidden_dropout_prob=0.0)


def run_vit(steps: int):
    model = vt.Vit(VCFG)
    key = jax.random.PRNGKey(0)
    params = {"vit": model.init(key),
              "head": cnn.linear_init(jax.random.fold_in(key, 1),
                                      VCFG.hidden_size, 6)}
    rng_np = np.random.default_rng(0)
    imgs = rng_np.normal(size=(64, 3, 64, 64)).astype(np.float32)
    labels = rng_np.integers(0, 6, size=(64,))

    def loss_fn(p, batch, rng):
        out = model.apply(p["vit"], batch["px"])
        logits = cnn.linear(p["head"], out.logits[:, 0, :])
        acc = jnp.mean(jnp.argmax(logits, -1) == batch["y"])
        return cross_entropy(logits, batch["y"]), {"acc": acc}

    tr = Trainer(model, loss_fn, optimizer=make_optimizer(3e-4))
    state = tr.init_state(params)
    for s in range(steps):
        i = (s * 16) % 48
        batch = {"px": jnp.asarray(imgs[i:i + 16]),
                 "y": jnp.asarray(labels[i:i + 16])}
        state, m = tr.step(state, batch, jax.random.PRNGKey(s))
        if s % 5 == 0:
            print(f"[vit] step {s}: loss={float(m['loss']):.4f}")


def run_clip(steps: int):
    cfg = vt.CLIPConfig(text_config=TCFG, vision_config=VCFG,
                        projection_dim=128)
    model = vt.CLIPModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    rng_np = np.random.default_rng(0)
    imgs = rng_np.normal(size=(64, 3, 64, 64)).astype(np.float32)
    caps = rng_np.integers(5, 2048, size=(64, 16)).astype(np.int32)

    def loss_fn(p, batch, rng):
        img, txt, scale = model.apply(p, batch["ids"], batch["px"])
        return clip_loss(img, txt, scale), {}

    tr = Trainer(model, loss_fn, optimizer=make_optimizer(3e-4))
    state = tr.init_state(params)
    for s in range(steps):
        i = (s * 16) % 48
        batch = {"px": jnp.asarray(imgs[i:i + 16]),
                 "ids": jnp.asarray(caps[i:i + 16])}
        state, m = tr.step(state, batch, jax.random.PRNGKey(s))
        if s % 5 == 0:
            print(f"[clip] step {s}: loss={float(m['loss']):.4f}")


def run_vlm(steps: int):
    vit = vt.Vit(VCFG.replace(hidden_size=TCFG.hidden_size))
    model = vt.VisionLanguageModel(TCFG, vit, pos_embedding_type="rope")
    params = model.init(jax.random.PRNGKey(0))
    rng_np = np.random.default_rng(0)
    imgs = rng_np.normal(size=(64, 3, 64, 64)).astype(np.float32)
    caps = rng_np.integers(5, 2048, size=(64, 16)).astype(np.int32)

    def loss_fn(p, batch, rng):
        out = model.apply(p, pixel_values=batch["px"],
                          decoder_input_ids=batch["ids"],
                          decoder_attention_mask=jnp.ones_like(batch["ids"]))
        # fused row i predicts text token i (image CLS occupies row 0)
        logits = out.logits[:, :-1]
        return cross_entropy(logits[:, :batch["ids"].shape[1]],
                             batch["ids"]), {}

    tr = Trainer(model, loss_fn, optimizer=make_optimizer(3e-4))
    state = tr.init_state(params)
    for s in range(steps):
        i = (s * 8) % 56
        batch = {"px": jnp.asarray(imgs[i:i + 8]),
                 "ids": jnp.asarray(caps[i:i + 8])}
        state, m = tr.step(state, batch, jax.random.PRNGKey(s))
        if s % 5 == 0:
            print(f"[vlm] step {s}: loss={float(m['loss']):.4f}")

    eo = model.encode(state.params, jnp.asarray(imgs[:2]))
    toks = generate_multimodel(model, state.params, eo,
                               decoder_start=jnp.asarray(caps[:2, :1]),
                               max_new_tokens=8, use_cache=True)
    print("[vlm] caption tokens:", toks[0].tolist())


def run_ocr(steps: int):
    cfg = TCFG.replace(vocab_size=16)  # digit + special chars
    model = OCRModel(cfg, in_channels=1)
    params = model.init(jax.random.PRNGKey(0))
    rng_np = np.random.default_rng(0)
    imgs = rng_np.normal(size=(64, 1, 64, 64)).astype(np.float32)
    digits = rng_np.integers(2, 12, size=(64, 6)).astype(np.int32)

    def loss_fn(p, batch, rng):
        out = model.apply(p, pixel_values=batch["px"],
                          decoder_input_ids=batch["ids"],
                          decoder_attention_mask=jnp.ones_like(batch["ids"]))
        return cross_entropy(out.logits[:, :-1], batch["ids"][:, 1:]), {}

    tr = Trainer(model, loss_fn, optimizer=make_optimizer(3e-4))
    state = tr.init_state(params)
    for s in range(steps):
        i = (s * 8) % 56
        batch = {"px": jnp.asarray(imgs[i:i + 8]),
                 "ids": jnp.asarray(digits[i:i + 8])}
        state, m = tr.step(state, batch, jax.random.PRNGKey(s))
        if s % 5 == 0:
            print(f"[ocr] step {s}: loss={float(m['loss']):.4f}")

    eo = model.get_encoder_output(state.params, jnp.asarray(imgs[:2]))
    toks = generate_seq2seq(model, state.params, eo, None,
                            jnp.asarray(digits[:2, :1]), max_new_tokens=5,
                            use_cache=True)
    print("[ocr] decoded:", toks[0].tolist())


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--mode", choices=["vit", "clip", "vlm", "ocr", "all"],
                    default="all")
    args = ap.parse_args()
    runners = {"vit": run_vit, "clip": run_clip, "vlm": run_vlm,
               "ocr": run_ocr}
    for name, fn in runners.items():
        if args.mode in (name, "all"):
            fn(args.steps)
