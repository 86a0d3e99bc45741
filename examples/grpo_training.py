"""GRPO (group-relative policy optimization, DeepSeekMath Shao et al.
2024) — RLHF beyond the reference's SFT/DPO recipe set
(``vyom-ai-llm-sft-dpo-training.ipynb``), TPU-shaped:

- rollouts: ONE jitted sampled-``generate`` call per step (all prompts x
  group in a single static-shape batch — no per-rollout dispatch);
- no value network: the group mean is the baseline
  (``training.group_advantages``);
- update: clipped surrogate + k3 KL to the frozen reference policy
  (``training.grpo_loss``), one jitted step.

The demo reward is synthetic (fraction of completion tokens equal to a
target id, a stand-in for a programmatic verifier); mean reward climbs
within a few steps. Swap ``reward_fn`` for a real verifier/RM."""

import argparse

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

import vyomai_tpu as vt
from vyomai_tpu.training import group_advantages, grpo_loss, token_logprobs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--prompts", type=int, default=16)
    ap.add_argument("--group", type=int, default=8)
    ap.add_argument("--comp-len", type=int, default=16)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--kl-beta", type=float, default=0.04)
    args = ap.parse_args()

    cfg = vt.QwenConfig(vocab_size=256, hidden_size=128,
                        intermediate_size=256, num_hidden_layers=4,
                        num_attention_heads=4, num_key_value_heads=2,
                        head_dim=32, max_position_embeddings=128)
    model = vt.ModelForCausalLM(cfg)
    params = model.init(jax.random.PRNGKey(0), dtype=jnp.float32)
    ref_params = params                       # frozen KL anchor
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    TARGET, P_LEN = 7, 6
    rng = jax.random.PRNGKey(1)

    def reward_fn(seqs):
        return (seqs[:, P_LEN:] == TARGET).mean(axis=-1)

    @jax.jit
    def update(params, opt_state, seqs, adv):
        mask = jnp.zeros(seqs[:, 1:].shape, jnp.float32)
        mask = mask.at[:, P_LEN - 1:].set(1.0)
        old = token_logprobs(model.apply(params, seqs).logits, seqs)
        ref = token_logprobs(model.apply(ref_params, seqs).logits, seqs)

        def loss_fn(p):
            lp = token_logprobs(model.apply(p, seqs).logits, seqs)
            return grpo_loss(lp, old, ref, adv, mask, kl_beta=args.kl_beta)

        (loss, kl), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, kl

    for step in range(args.steps):
        rng, pk, sk = jax.random.split(rng, 3)
        prompts = jax.random.randint(pk, (args.prompts, P_LEN), 1,
                                     cfg.vocab_size)
        prompts = jnp.repeat(prompts, args.group, axis=0)
        seqs = vt.generate(model, params, prompts,
                           max_new_tokens=args.comp_len, do_sample=True,
                           rng=sk, use_cache=True)
        r = reward_fn(np.asarray(seqs))
        adv = group_advantages(jnp.asarray(r), args.group)
        params, opt_state, loss, kl = update(params, opt_state,
                                             jnp.asarray(seqs), adv)
        print(f"step {step:3d}  reward {float(r.mean()):.4f}  "
              f"loss {float(loss):+.4f}  kl {float(kl):.5f}")


if __name__ == "__main__":
    main()
