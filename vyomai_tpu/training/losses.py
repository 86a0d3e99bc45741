"""Training losses for the reference's recipe set (SURVEY.md §2.2 N5-N8).

- ``sft_loss`` — shifted masked CE (``vyom-ai-llm-sft-dpo-training.ipynb``
  ``sft_loss_fn``)
- ``compute_logprobs`` / ``dpo_loss`` — DPO with frozen reference policy
  (same notebook, cells 36-51)
- ``electra_loss`` — CE(generator) + BCE(discriminator over non-pad)
  (``electra-pretraining.ipynb`` ``ElectraLoss``)
- ``clip_loss`` — symmetric InfoNCE; pass ``axis_name`` inside
  ``shard_map``/``pmap`` to all-gather negatives over ICI for global-batch
  contrastive training (BASELINE north star). Under plain ``jit`` + GSPMD
  sharding the gather is implicit.
- ``distillation_loss`` — KL(student || teacher) + CE mix (N11).
"""

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.fused import cross_entropy, lm_head_ce_loss


def sft_loss(logits, labels, *, ignore_index: int = -100):
    """Shifted CLM loss: predict token t+1 from position t."""
    return cross_entropy(logits[:, :-1], labels[:, 1:],
                         ignore_index=ignore_index)


def compute_logprobs(logits, labels, mask):
    """Mask-averaged per-sequence log-probs of ``labels`` under ``logits``
    (shifted). mask: [B, L] with 1 where the token counts (answer tokens)."""
    logits = logits[:, :-1].astype(jnp.float32)
    labels = labels[:, 1:]
    mask = mask[:, 1:].astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    tok = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return jnp.sum(tok * mask, axis=-1) / jnp.maximum(mask.sum(-1), 1.0)


def dpo_loss(policy_chosen_lp, policy_rejected_lp,
             ref_chosen_lp, ref_rejected_lp, *, beta: float = 0.1):
    """-log sigmoid(beta * ((pi_c - pi_r) - (ref_c - ref_r))).
    Returns (loss, chosen_rewards, rejected_rewards)."""
    pi_diff = policy_chosen_lp - policy_rejected_lp
    ref_diff = ref_chosen_lp - ref_rejected_lp
    losses = -jax.nn.log_sigmoid(beta * (pi_diff - ref_diff))
    chosen_rewards = beta * (policy_chosen_lp - ref_chosen_lp)
    rejected_rewards = beta * (policy_rejected_lp - ref_rejected_lp)
    return losses.mean(), chosen_rewards.mean(), rejected_rewards.mean()


def electra_loss(gen_logits, gen_labels, disc_logits, disc_labels,
                 non_pad_mask, *, disc_weight: float = 50.0,
                 ignore_index: int = -100):
    """Generator MLM CE + weighted discriminator BCE over non-pad tokens."""
    g_loss = cross_entropy(gen_logits, gen_labels, ignore_index=ignore_index)
    d_logits = disc_logits[..., 0].astype(jnp.float32)
    bce = jnp.maximum(d_logits, 0) - d_logits * disc_labels + \
        jnp.log1p(jnp.exp(-jnp.abs(d_logits)))
    m = non_pad_mask.astype(jnp.float32)
    d_loss = jnp.sum(bce * m) / jnp.maximum(m.sum(), 1.0)
    return g_loss + disc_weight * d_loss, g_loss, d_loss


def clip_loss(image_embeds, text_embeds, logit_scale, *,
              axis_name: Optional[str] = None):
    """Symmetric contrastive loss over L2-normalized embeddings.

    With ``axis_name`` (inside shard_map/pmap) negatives are all-gathered
    across devices so every chip contrasts against the global batch.
    """
    img = image_embeds / jnp.linalg.norm(image_embeds, axis=-1, keepdims=True)
    txt = text_embeds / jnp.linalg.norm(text_embeds, axis=-1, keepdims=True)
    if axis_name is not None:
        all_txt = jax.lax.all_gather(txt, axis_name, tiled=True)
        all_img = jax.lax.all_gather(img, axis_name, tiled=True)
        idx = jax.lax.axis_index(axis_name)
        offset = idx * img.shape[0]
    else:
        all_txt, all_img = txt, img
        offset = 0
    scale = jnp.exp(logit_scale)
    logits_i2t = scale * img @ all_txt.T     # [b, B_global]
    logits_t2i = scale * txt @ all_img.T
    labels = offset + jnp.arange(img.shape[0])
    li = cross_entropy(logits_i2t, labels)
    lt = cross_entropy(logits_t2i, labels)
    return 0.5 * (li + lt)


def group_advantages(rewards, group_size: int, *, eps: float = 1e-4):
    """GRPO group-relative advantages (DeepSeekMath, Shao et al. 2024):
    rewards [B] laid out as ``B = n_prompts * group_size`` with each
    prompt's ``group_size`` rollouts contiguous. Each rollout's advantage
    is its reward standardized WITHIN its group — no learned value
    function (the group mean is the baseline). Returns [B] fp32."""
    r = rewards.astype(jnp.float32).reshape(-1, group_size)
    mean = r.mean(axis=1, keepdims=True)
    std = r.std(axis=1, keepdims=True)
    return ((r - mean) / (std + eps)).reshape(-1)


def grpo_loss(policy_logps, old_logps, ref_logps, advantages, mask, *,
              clip_eps: float = 0.2, kl_beta: float = 0.04):
    """GRPO objective: PPO-style clipped surrogate with group-relative
    advantages plus a per-token KL penalty to the frozen reference policy.

    policy_logps/old_logps/ref_logps: [B, T] per-token log-probs of the
    TAKEN tokens (``token_logprobs``) under the current, rollout-time, and
    reference policies; advantages: [B] (``group_advantages``); mask:
    [B, T] 1 where the token belongs to the completion. The KL term uses
    the k3 estimator ``exp(ref - pi) - (ref - pi) - 1`` (unbiased,
    non-negative — the GRPO paper's choice). Gradients flow only through
    ``policy_logps``. Returns (loss, mean_kl)."""
    m = mask.astype(jnp.float32)
    denom = jnp.maximum(m.sum(), 1.0)
    ratio = jnp.exp(policy_logps - jax.lax.stop_gradient(old_logps))
    adv = advantages[:, None].astype(jnp.float32)
    surr = jnp.minimum(
        ratio * adv,
        jnp.clip(ratio, 1.0 - clip_eps, 1.0 + clip_eps) * adv)
    d = jax.lax.stop_gradient(ref_logps) - policy_logps
    kl = jnp.exp(d) - d - 1.0
    loss = -jnp.sum((surr - kl_beta * kl) * m) / denom
    return loss, jnp.sum(kl * m) / denom


def token_logprobs(logits, labels):
    """Per-token log-probs of ``labels`` under ``logits``, SHIFTED for CLM
    (position t predicts token t+1): returns [B, L-1] fp32 where column i
    scores ``labels[:, i+1]``. Pair with a [B, L-1] completion mask."""
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(
        logp, labels[:, 1:][..., None], axis=-1)[..., 0]


def distillation_loss(student_logits, teacher_logits, labels, *,
                      temperature: float = 2.0, alpha: float = 0.5,
                      ignore_index: int = -100):
    """alpha * CE(student, labels) + (1-alpha) * T^2 * KL(teacher || student).

    ``labels=None`` gives the pure-KL mode (no hard-label CE term)."""
    ce = (0.0 if labels is None else
          cross_entropy(student_logits, labels, ignore_index=ignore_index))
    t = temperature
    s_logp = jax.nn.log_softmax(student_logits.astype(jnp.float32) / t, -1)
    t_prob = jax.nn.softmax(teacher_logits.astype(jnp.float32) / t, -1)
    kl = jnp.sum(t_prob * (jnp.log(t_prob + 1e-20) - s_logp), axis=-1)
    if labels is not None:
        valid = (labels != ignore_index).astype(jnp.float32)
        kl = jnp.sum(kl * valid) / jnp.maximum(valid.sum(), 1.0)
    else:
        kl = kl.mean()
    return alpha * ce + (1 - alpha) * (t ** 2) * kl


def medusa_loss(params, medusa, hidden, ids, *, ignore_index: int = -100,
                chunk_size: int = 1024):
    """Mean per-offset CE of the Medusa heads over a FROZEN target's hidden
    states (``layers.medusa``; Medusa-1 training, arXiv:2401.10774 §3.1).

    hidden: [B, T, H] final-normed hidden from the target's forward pass
    (gradient is stopped — heads-only training); ids: [B, T] the same
    batch's token ids. Head ``i`` at position ``t`` learns to predict
    ``ids[t + 2 + i]`` (the base lm_head owns ``t + 1``). Logits never
    materialize at [B, T, K, V]: each head runs the row-chunked fused
    lm-head CE (``ops.fused.lm_head_ce_loss``)."""
    from ..layers.medusa import medusa_hidden

    if "lm_head" in params:
        if "kernel" not in params["lm_head"]:  # int8/int4 quantized layouts
            raise ValueError("medusa_loss needs an fp vocabulary "
                             "projection (train heads before quantizing)")
        kernel = params["lm_head"]["kernel"]
        bias = params["lm_head"].get("bias")
    else:
        if "weight" not in params["embed_tokens"]:
            raise ValueError("medusa_loss needs an fp vocabulary "
                             "projection (train heads before quantizing)")
        kernel = params["embed_tokens"]["weight"].T
        bias = None
    # the whole target is frozen: hidden AND the reused vocab projection
    kernel = jax.lax.stop_gradient(kernel)
    if bias is not None:
        bias = jax.lax.stop_gradient(bias)
    hk = medusa_hidden(medusa, jax.lax.stop_gradient(hidden))  # [B,T,K,H]
    k_heads = hk.shape[2]
    total = jnp.float32(0.0)
    for i in range(k_heads):
        # head i predicts ids[:, t + 2 + i] from position t
        off = 2 + i
        total = total + lm_head_ce_loss(
            hk[:, :-off, i], kernel.astype(hk.dtype), bias, ids[:, off:],
            ignore_index=ignore_index, chunk_size=chunk_size)
    return total / k_heads
