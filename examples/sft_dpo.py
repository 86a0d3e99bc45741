"""SFT + DPO fine-tuning recipes (reference
``vyom-ai-llm-sft-dpo-training.ipynb`` — N5/N6): instruction SFT with
dynamic right-padding collate, then DPO against a frozen reference policy."""

import argparse

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import vyomai_tpu as vt
from vyomai_tpu.training import (Trainer, compute_logprobs, dpo_collate,
                                 dpo_loss, make_optimizer, sft_collate,
                                 sft_loss)

CFG = vt.EncoderConfig(hidden_size=256, num_attention_heads=8,
                       num_hidden_layers=4, vocab_size=2048,
                       max_position_embeddings=128, intermediate_size=1024,
                       hidden_dropout_prob=0.0, pad_token_id=1)


def synthetic_instructions(rng, n=64):
    return [list(rng.integers(5, 2048, size=rng.integers(8, 24)))
            for _ in range(n)]


def run_sft(steps: int):
    model = vt.DecoderModel(CFG, pos_embedding_type="rope")
    params = model.init(jax.random.PRNGKey(0))
    rng_np = np.random.default_rng(0)
    seqs = synthetic_instructions(rng_np)

    def loss_fn(p, batch, rng):
        out = model.apply(p, batch["ids"], batch["mask"])
        return sft_loss(out.logits, batch["labels"]), {}

    tr = Trainer(model, loss_fn, optimizer=make_optimizer(3e-4))
    state = tr.init_state(params)
    rng = jax.random.PRNGKey(1)
    for step in range(steps):
        chunk = seqs[(step * 8) % 56:(step * 8) % 56 + 8]
        ids, labels, mask = sft_collate(chunk, CFG.pad_token_id)
        batch = {"ids": jnp.asarray(ids), "labels": jnp.asarray(labels),
                 "mask": jnp.asarray(mask)}
        rng, r = jax.random.split(rng)
        state, m = tr.step(state, batch, r)
        if step % 5 == 0:
            print(f"[sft] step {step}: loss={float(m['loss']):.4f}")
    return state.params


def run_dpo(policy_params, steps: int):
    model = vt.DecoderModel(CFG, pos_embedding_type="rope")
    ref_params = jax.tree_util.tree_map(jnp.copy, policy_params)  # frozen
    rng_np = np.random.default_rng(1)
    prompts = synthetic_instructions(rng_np, 32)
    chosen = [list(rng_np.integers(5, 2048, size=6)) for _ in prompts]
    rejected = [list(rng_np.integers(5, 2048, size=6)) for _ in prompts]

    def loss_fn(p, batch, rng):
        def lp(params, ids, mask):
            out = model.apply(params, ids, jnp.ones_like(ids))
            return compute_logprobs(out.logits, ids, mask)
        pc = lp(p, batch["chosen_ids"], batch["chosen_mask"])
        pr = lp(p, batch["rejected_ids"], batch["rejected_mask"])
        rc = lp(ref_params, batch["chosen_ids"], batch["chosen_mask"])
        rr = lp(ref_params, batch["rejected_ids"], batch["rejected_mask"])
        loss, cr, rj = dpo_loss(pc, pr, rc, rr, beta=0.1)
        return loss, {"chosen_reward": cr, "rejected_reward": rj}

    tr = Trainer(model, loss_fn, optimizer=make_optimizer(1e-5))
    state = tr.init_state(policy_params)
    rng = jax.random.PRNGKey(2)
    for step in range(steps):
        i = (step * 8) % 24
        batch = dpo_collate(prompts[i:i + 8], chosen[i:i + 8],
                            rejected[i:i + 8], CFG.pad_token_id)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        rng, r = jax.random.split(rng)
        state, m = tr.step(state, batch, r)
        if step % 5 == 0:
            print(f"[dpo] step {step}: loss={float(m['loss']):.4f} "
                  f"margin={float(m['chosen_reward'] - m['rejected_reward']):.4f}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()
    params = run_sft(args.steps)
    run_dpo(params, args.steps)
