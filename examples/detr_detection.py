"""DETR object detection (reference ``detr.ipynb`` workload — Global Wheat):
transformer detector with learned queries, Hungarian-matched set loss."""

import argparse

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vyomai_tpu.models.detr import DETRModel, DETRConfig
from vyomai_tpu.training.detection import detr_loss_single, hungarian_match


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    cfg = DETRConfig(num_classes=1, num_queries=25, hidden_size=128,
                     num_attention_heads=8, num_encoder_layers=2,
                     num_decoder_layers=2, intermediate_size=512)
    model = DETRModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(32, 3, 64, 64)).astype(np.float32)
    # synthetic boxes: 1-3 per image, cxcywh in [0,1]
    targets = []
    for _ in range(32):
        m = rng.integers(1, 4)
        boxes = np.clip(rng.uniform(0.2, 0.8, size=(m, 4)), 0.05, 0.95)
        boxes[:, 2:] *= 0.3
        targets.append((np.zeros(m, np.int64), boxes.astype(np.float32)))

    opt = optax.adamw(1e-4)
    opt_state = opt.init(params)

    @jax.jit
    def forward(p, px):
        return model.apply(p, px)

    def grad_step(params, opt_state, px, matches, batch_targets):
        def loss_fn(p):
            cls, boxes = model.apply(p, px)
            total = 0.0
            for j, (gt_l, gt_b) in enumerate(batch_targets):
                total = total + detr_loss_single(
                    cls[j], boxes[j], gt_l, gt_b, matches[j],
                    num_classes=cfg.num_classes)
            return total / len(batch_targets)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for s in range(args.steps):
        i = (s * 4) % 28
        px = jnp.asarray(imgs[i:i + 4])
        batch_targets = targets[i:i + 4]
        cls, boxes = forward(params, px)
        matches = [hungarian_match(cls[j], boxes[j], *batch_targets[j])
                   for j in range(4)]
        params, opt_state, loss = grad_step(params, opt_state, px, matches,
                                            batch_targets)
        if s % 5 == 0:
            print(f"[detr] step {s}: loss={float(loss):.4f}")


if __name__ == "__main__":
    main()
