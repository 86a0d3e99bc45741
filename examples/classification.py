"""Text classification (reference ``vyom-ai-classification.ipynb`` — N10):
EncoderModel (rope) + CLS-token linear head, cosine LR, accuracy eval.

Runs on synthetic clinc_oos-shaped data by default (zero-egress friendly);
point ``--data`` at a tokenized .npz with {input_ids, attention_mask,
labels} for real runs.
"""

import argparse

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import vyomai_tpu as vt
from vyomai_tpu.core import nn as cnn
from vyomai_tpu.ops.fused import cross_entropy
from vyomai_tpu.training import Trainer, make_optimizer


def synthetic(rng, n=512, seq=32, vocab=1000, classes=150):
    ids = rng.integers(3, vocab, size=(n, seq)).astype(np.int32)
    mask = np.ones_like(ids)
    labels = rng.integers(0, classes, size=(n,)).astype(np.int32)
    return ids, mask, labels


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=None)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--classes", type=int, default=150)
    args = ap.parse_args()

    cfg = vt.EncoderConfig(hidden_size=256, num_attention_heads=8,
                           num_hidden_layers=4, vocab_size=1000,
                           max_position_embeddings=64,
                           intermediate_size=1024)
    model = vt.EncoderModel(cfg, pos_embedding_type="rope")

    if args.data:
        d = np.load(args.data)
        ids, mask, labels = d["input_ids"], d["attention_mask"], d["labels"]
    else:
        ids, mask, labels = synthetic(np.random.default_rng(0))

    key = jax.random.PRNGKey(0)
    params = {
        "encoder": model.init(key),
        "head": cnn.linear_init(jax.random.fold_in(key, 1),
                                cfg.hidden_size, args.classes),
    }

    def loss_fn(p, batch, rng):
        out = model.apply(p["encoder"], batch["ids"], batch["mask"],
                          deterministic=False, rng=rng)
        logits = cnn.linear(p["head"], out.logits[:, 0, :])  # CLS token
        loss = cross_entropy(logits, batch["labels"])
        acc = jnp.mean(jnp.argmax(logits, -1) == batch["labels"])
        return loss, {"acc": acc}

    tr = Trainer(model, loss_fn,
                 optimizer=make_optimizer(3e-4, schedule="cosine",
                                          total_steps=args.steps,
                                          warmup_steps=5))
    state = tr.init_state(params)
    rng = jax.random.PRNGKey(1)
    for step in range(args.steps):
        i = (step * args.batch) % (len(ids) - args.batch)
        batch = {"ids": jnp.asarray(ids[i:i + args.batch]),
                 "mask": jnp.asarray(mask[i:i + args.batch]),
                 "labels": jnp.asarray(labels[i:i + args.batch])}
        rng, r = jax.random.split(rng)
        state, m = tr.step(state, batch, r)
        if step % 10 == 0:
            print(f"step {step}: loss={float(m['loss']):.4f} "
                  f"acc={float(m['acc']):.3f}")


if __name__ == "__main__":
    main()
