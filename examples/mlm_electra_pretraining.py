"""MLM + Electra pretraining (reference ``masked_language_modeling.ipynb``
N8 and ``electra-pretraining.ipynb`` N7).

Electra: generator (EncoderForMaskedLM) + discriminator (EncoderModel +
1-unit head) with tied word embeddings, CE + weighted BCE loss."""

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
from vyomai_tpu.training import (Trainer, electra_inputs, electra_loss,
                                 make_optimizer, masked_language_modeling)

CFG = vt.EncoderConfig(hidden_size=256, num_attention_heads=8,
                       num_hidden_layers=4, vocab_size=2048,
                       max_position_embeddings=64, intermediate_size=1024,
                       hidden_dropout_prob=0.0)
MASK_TOKEN, PAD = 4, 1


def run_mlm(steps: int):
    model = vt.EncoderForMaskedLM(CFG, pos_embedding_type="rope")
    params = model.init(jax.random.PRNGKey(0))
    data = np.random.default_rng(0).integers(
        5, CFG.vocab_size, size=(256, 48)).astype(np.int32)

    def loss_fn(p, batch, rng):
        r1, r2 = jax.random.split(rng)
        special = batch["ids"] < 5
        masked_ids, labels, _ = masked_language_modeling(
            r1, batch["ids"], special, MASK_TOKEN, CFG.vocab_size)
        out = model.apply(p, masked_ids, jnp.ones_like(masked_ids))
        return cross_entropy(out.logits, labels), {}

    tr = Trainer(model, loss_fn, optimizer=make_optimizer(3e-4))
    state = tr.init_state(params)
    rng = jax.random.PRNGKey(1)
    for step in range(steps):
        i = (step * 16) % (len(data) - 16)
        rng, r = jax.random.split(rng)
        state, m = tr.step(state, {"ids": jnp.asarray(data[i:i + 16])}, r)
        if step % 5 == 0:
            print(f"[mlm] step {step}: loss={float(m['loss']):.4f}")
    return state


def run_electra(steps: int):
    generator = vt.EncoderForMaskedLM(CFG, pos_embedding_type="rope")
    discriminator = vt.EncoderModel(CFG, pos_embedding_type="rope")
    key = jax.random.PRNGKey(0)
    params = {
        "generator": generator.init(key),
        "discriminator": discriminator.init(jax.random.fold_in(key, 1)),
        "disc_head": cnn.linear_init(jax.random.fold_in(key, 2),
                                     CFG.hidden_size, 1),
    }
    # tie word embeddings between G and D (reference N7) structurally:
    # the discriminator reads the generator's table at apply time (aliasing
    # the same array twice in a donated pytree trips XLA buffer donation)
    del params["discriminator"]["word_embeddings"]
    data = np.random.default_rng(0).integers(
        5, CFG.vocab_size, size=(256, 48)).astype(np.int32)

    def loss_fn(p, batch, rng):
        r1, r2 = jax.random.split(rng)
        ids = batch["ids"]
        special = ids < 5
        masked_ids, labels, masked_idx = masked_language_modeling(
            r1, ids, special, MASK_TOKEN, CFG.vocab_size)
        gen_out = generator.apply(p["generator"], masked_ids,
                                  jnp.ones_like(ids))
        disc_in, disc_labels, non_pad = electra_inputs(
            r2, gen_out.logits, ids, masked_idx, PAD)
        disc_params = {**p["discriminator"],
                       "word_embeddings":
                       p["generator"]["encoder"]["word_embeddings"]}
        disc_hidden = discriminator.apply(disc_params, disc_in,
                                          jnp.ones_like(ids)).logits
        disc_logits = cnn.linear(p["disc_head"], disc_hidden)
        total, g_loss, d_loss = electra_loss(
            gen_out.logits, labels, disc_logits, disc_labels, non_pad)
        return total, {"g_loss": g_loss, "d_loss": d_loss}

    tr = Trainer(generator, loss_fn, optimizer=make_optimizer(3e-4))
    state = tr.init_state(params)
    rng = jax.random.PRNGKey(1)
    for step in range(steps):
        i = (step * 16) % (len(data) - 16)
        rng, r = jax.random.split(rng)
        state, m = tr.step(state, {"ids": jnp.asarray(data[i:i + 16])}, r)
        if step % 5 == 0:
            print(f"[electra] step {step}: total={float(m['loss']):.3f} "
                  f"g={float(m['g_loss']):.3f} d={float(m['d_loss']):.3f}")
    return state


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=15)
    ap.add_argument("--mode", choices=["mlm", "electra", "both"],
                    default="both")
    args = ap.parse_args()
    if args.mode in ("mlm", "both"):
        run_mlm(args.steps)
    if args.mode in ("electra", "both"):
        run_electra(args.steps)
