"""Medusa speculative-decoding heads (arXiv:2401.10774, Medusa-1 style).

K extra residual heads bolted onto a frozen causal LM: head ``k`` reads the
final hidden state at position ``t`` and predicts the token at ``t + 2 + k``
(the base lm_head already predicts ``t + 1``). At decode time the heads
propose a gamma-token continuation FOR FREE from the hidden state the last
verification pass already computed — no draft model, no second KV pool, no
extra forward passes. Proposals are verified by the target's own argmax
(`serving.paged_model.medusa_horizon`), so serving output stays token-exact
vs the plain engine regardless of head quality; head training only moves
the ACCEPTANCE RATE.

This replaces the role of the reference's draft-model speculative decoding
(`/root/reference/VyomAI/speculative_decoding.py:85-245`) with a
self-speculation variant the reference does not have — on TPU serving the
draft model's per-token steps are dispatch-latency-bound, while Medusa
proposals are one batched einsum riding the verification dispatch.

Design choices vs the paper:

- The residual block matches Medusa-1: ``h + SiLU(h @ W1_k + b1_k)``.
- The vocabulary projection REUSES the base model's lm_head (or tied
  embedding) instead of a per-head ``W2`` clone — K x hidden x vocab fewer
  parameters, and the zero-initialised block then makes head ``k`` emit
  exactly the base model's next-token distribution at step 0 (the paper
  gets the same property by cloning lm_head into W2).
- Heads are trained with plain per-offset cross-entropy on the frozen
  target's hidden states (`training.losses.medusa_loss`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import nn as cnn

__all__ = ["medusa_init", "medusa_hidden", "medusa_propose"]


def medusa_init(rng, hidden_size: int, num_heads: int, *,
                dtype=jnp.float32):
    """K Medusa head blocks: ``{"w1": [K, H, H], "b1": [K, H]}``.

    Zero-initialised so ``head_k(h) == lm_head(h)`` at step 0 — proposals
    start as "repeat the next token", a sane untrained baseline (the
    gradient at zero is nonzero: SiLU'(0) = 0.5). ``rng`` is accepted for
    signature uniformity with the other init helpers."""
    del rng
    return {
        "w1": jnp.zeros((num_heads, hidden_size, hidden_size), dtype=dtype),
        "b1": jnp.zeros((num_heads, hidden_size), dtype=dtype),
    }


def medusa_hidden(medusa, h):
    """Residual head blocks over hidden states.

    h: ``[..., H]`` final-normed hidden -> ``[..., K, H]`` (one transformed
    hidden per head; feed each through the base lm_head for logits)."""
    w1 = medusa["w1"]
    b1 = medusa["b1"]
    hk = jnp.einsum("...h,khg->...kg", h.astype(w1.dtype), w1) + b1
    return h[..., None, :].astype(w1.dtype) + jax.nn.silu(hk)


def medusa_propose(params, medusa, h):
    """Per-head logits through the BASE model's vocabulary projection.

    h: ``[..., H]`` -> ``[..., K, V]``. ``params`` is the base model's
    param tree (``lm_head`` or tied ``embed_tokens`` — both the fp and the
    int8-quantized layouts work, same dispatch as the serving head)."""
    hk = medusa_hidden(medusa, h)
    if "lm_head" in params:
        return cnn.linear(params["lm_head"], hk)
    return cnn.tied_lm_head(params["embed_tokens"], hk)
