"""LoRA/DoRA/QLoRA fine-tuning + knowledge-distillation init (reference
``adapters.ipynb`` N12 and ``Knowledge_distilation.ipynb`` N11).

Distillation init: build a shallow student by copying alternating teacher
layers (one gather on the stacked layer axis); then freeze the student and
train only LoRA/DoRA factors. ``--adapter qlora`` quantizes the frozen
base to int8 first (half the HBM; the low-rank factors stay fp and train
through the embedded-factor path in ``core.nn.linear``)."""

import argparse

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

import vyomai_tpu as vt
from vyomai_tpu.core import nn as cnn
from vyomai_tpu.layers.adapters import (count_params, inject_dora,
                                        inject_lora, merge_adapters)
from vyomai_tpu.ops.fused import cross_entropy
from vyomai_tpu.training import default_student_indices, select_layers

TEACHER_CFG = vt.EncoderConfig(hidden_size=256, num_attention_heads=8,
                               num_hidden_layers=12, vocab_size=2048,
                               max_position_embeddings=64,
                               intermediate_size=1024,
                               hidden_dropout_prob=0.0)
STUDENT_CFG = TEACHER_CFG.replace(num_hidden_layers=6)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--adapter", choices=["lora", "dora", "qlora"],
                    default="lora")
    args = ap.parse_args()

    # 1. distillation init: 12-layer teacher -> 6-layer student
    teacher = vt.EncoderModel(TEACHER_CFG, pos_embedding_type="rope")
    t_params = teacher.init(jax.random.PRNGKey(0))
    idx = default_student_indices(12, 6)
    print("student layer indices:", idx)
    s_params = select_layers(t_params, idx)
    student = vt.EncoderModel(STUDENT_CFG, pos_embedding_type="rope")

    # 2. freeze the student; train only adapters + a task head
    key = jax.random.PRNGKey(1)
    if args.adapter == "qlora":
        # int8 frozen base: embeddings stay fp (the encoder's tied MLM
        # head is scale-sensitive), linear kernels quantize
        s_params = vt.quantize_params(s_params, embed=False)
        adapters = inject_lora(s_params, key, rank=8, alpha=2.0)
    elif args.adapter == "lora":
        adapters = inject_lora(s_params, key, rank=8, alpha=2.0)
    else:
        adapters = inject_dora(s_params, key, rank=8)
    head = cnn.linear_init(jax.random.fold_in(key, 1),
                           STUDENT_CFG.hidden_size, 150)
    print(f"base params: {count_params(s_params):,}  "
          f"trainable ({args.adapter}): "
          f"{count_params(adapters['tree']) + count_params(head):,}")

    data = np.random.default_rng(0).integers(
        5, 2048, size=(256, 32)).astype(np.int32)
    labels = np.random.default_rng(1).integers(0, 150, size=(256,))

    trainable = {"adapters": adapters["tree"], "head": head}
    opt = optax.adamw(3e-4)
    opt_state = opt.init(trainable)

    @jax.jit
    def step(trainable, opt_state, ids, y):
        def loss_fn(tr):
            merged = merge_adapters(s_params, {**adapters, "tree": tr["adapters"]})
            out = student.apply(merged, ids, jnp.ones_like(ids))
            logits = cnn.linear(tr["head"], out.logits[:, 0, :])
            return cross_entropy(logits, y)
        loss, grads = jax.value_and_grad(loss_fn)(trainable)
        updates, opt_state = opt.update(grads, opt_state, trainable)
        return optax.apply_updates(trainable, updates), opt_state, loss

    for s in range(args.steps):
        i = (s * 16) % (len(data) - 16)
        trainable, opt_state, loss = step(
            trainable, opt_state, jnp.asarray(data[i:i + 16]),
            jnp.asarray(labels[i:i + 16]))
        if s % 5 == 0:
            print(f"step {s}: loss={float(loss):.4f}")


if __name__ == "__main__":
    main()
