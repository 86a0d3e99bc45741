"""GRPO (group-relative policy optimization, DeepSeekMath): advantage
standardization, the clipped-surrogate + k3-KL objective, and a tiny
end-to-end RL loop whose reward must go UP. Beyond the reference's
SFT/DPO recipe set (``vyom-ai-llm-sft-dpo-training.ipynb``)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import vyomai_tpu as vt
from vyomai_tpu.training import (group_advantages, grpo_loss,
                                 token_logprobs)

CFG = vt.QwenConfig(vocab_size=32, hidden_size=32, intermediate_size=64,
                    num_hidden_layers=2, num_attention_heads=2,
                    num_key_value_heads=2, head_dim=16,
                    max_position_embeddings=64)


def test_group_advantages():
    r = jnp.array([1.0, 0.0, 1.0, 3.0, 3.0, 3.0])   # two groups of 3
    a = np.asarray(group_advantages(r, 3))
    # group 1: standardized within group; group 2: zero std -> ~0
    np.testing.assert_allclose(a[:3].mean(), 0.0, atol=1e-6)
    assert a[0] > 0 > a[1] and abs(a[0] - a[2]) < 1e-6
    np.testing.assert_allclose(a[3:], 0.0, atol=1e-2)


def test_grpo_loss_gradient_direction():
    """Positive advantage pushes taken-token logprobs UP, negative DOWN;
    at ratio 1 the KL term's gradient vanishes (k3 minimum at pi == ref)."""
    lp = jnp.log(jnp.full((2, 3), 0.25))
    adv = jnp.array([1.0, -1.0])
    mask = jnp.ones((2, 3))

    def f(p):
        return grpo_loss(p, lp, lp, adv, mask, kl_beta=0.04)[0]

    g = np.asarray(jax.grad(f)(lp))
    assert (g[0] < 0).all(), "positive advantage must increase logp"
    assert (g[1] > 0).all(), "negative advantage must decrease logp"
    # KL gradient at pi == ref is 0: beta has no effect at the start point
    g2 = np.asarray(jax.grad(
        lambda p: grpo_loss(p, lp, lp, adv, mask, kl_beta=10.0)[0])(lp))
    np.testing.assert_allclose(g, g2, atol=1e-6)


def test_grpo_clipping_bounds_update():
    """Ratios outside [1-eps, 1+eps] stop contributing gradient for
    positive advantages (the PPO pessimism bound)."""
    old = jnp.log(jnp.full((1, 1), 0.25))
    adv = jnp.ones((1,))
    mask = jnp.ones((1, 1))

    def f(p):
        return grpo_loss(p, old, old, adv, mask, kl_beta=0.0)[0]

    # already 1.5x above old: clipped at 1.2 -> zero gradient
    g = float(jax.grad(f)(old + jnp.log(1.5))[0, 0])
    assert abs(g) < 1e-7
    # below old: unclipped -> negative gradient (push up)
    g = float(jax.grad(f)(old + jnp.log(0.8))[0, 0])
    assert g < 0


def test_grpo_end_to_end_reward_improves():
    """8 prompts x group 4, reward = fraction of completion tokens equal to
    a target id. A few GRPO steps must raise mean reward (and the KL to the
    frozen init stays finite)."""
    model = vt.ModelForCausalLM(CFG)
    params = model.init(jax.random.PRNGKey(0), dtype=jnp.float32)
    ref_params = params
    opt = optax.adam(5e-3)
    opt_state = opt.init(params)
    TARGET, GROUP, P_LEN, C_LEN = 7, 4, 4, 8
    rng = jax.random.PRNGKey(1)

    def rollout(params, rng):
        """Sample GROUP completions for each of 8 random prompts."""
        rng, pk, sk = jax.random.split(rng, 3)
        prompts = jax.random.randint(pk, (8, P_LEN), 1, CFG.vocab_size)
        prompts = jnp.repeat(prompts, GROUP, axis=0)        # [32, P_LEN]
        toks = vt.generate(model, params, prompts, max_new_tokens=C_LEN,
                           do_sample=True, rng=sk, use_cache=True)
        return rng, toks                                    # [32, P+C]

    def reward_fn(seqs):
        comp = seqs[:, P_LEN:]
        return (comp == TARGET).mean(axis=-1)

    @jax.jit
    def update(params, opt_state, seqs, adv):
        mask = jnp.zeros(seqs[:, 1:].shape, jnp.float32)
        mask = mask.at[:, P_LEN - 1:].set(1.0)   # completion positions
        old = token_logprobs(model.apply(params, seqs).logits, seqs)
        ref = token_logprobs(model.apply(ref_params, seqs).logits, seqs)

        def loss_fn(p):
            lp = token_logprobs(model.apply(p, seqs).logits, seqs)
            return grpo_loss(lp, old, ref, adv, mask)

        (loss, kl), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, kl

    rewards = []
    for step in range(6):
        rng, seqs = rollout(params, rng)
        r = reward_fn(np.asarray(seqs))
        rewards.append(float(r.mean()))
        adv = group_advantages(jnp.asarray(r), GROUP)
        params, opt_state, loss, kl = update(params, opt_state,
                                             jnp.asarray(seqs), adv)
        assert np.isfinite(float(loss)) and float(kl) >= -1e-6
    rng, seqs = rollout(params, rng)
    final = float(reward_fn(np.asarray(seqs)).mean())
    assert final > rewards[0] + 0.05, (rewards, final)
