"""Fused / memory-bounded compute blocks.

TPU equivalents of the reference's hand-fused ``torch.compile`` autograd
kernels (SURVEY.md §2.3 item 2, ``vyomai-fused-kernals-2t4.ipynb``):

- ``lm_head_ce_loss`` — lm_head matmul + cross-entropy with ignore-index,
  **chunked over rows** so the fp32 ``[B*L, V]`` logits are never
  materialized (the reference's ``LinearCrossEntropyIgnoreIndex`` /
  ``MyLinearCrossEntropy`` with chunked CE). ``jax.checkpoint`` on the chunk
  body makes the backward recompute chunk logits instead of saving them —
  the same activation-memory saving the reference claims (1.3x peak mem).
- ``linear_residual_layernorm`` / ``ffn_gelu`` — expressed as plain jnp;
  under jit XLA fuses the elementwise tail into the matmuls, which is what
  the reference's ``LinearRms``/``FFNGeLU`` fusions buy on CUDA. They exist
  as named entry points so models and benchmarks can opt in explicitly and
  so remat policies can target them.

Shift semantics for CLM (``x[:, :-1]`` vs ``target[:, 1:]``) follow the
reference's fused decoder (``vyom-ai-decoder-fused.ipynb`` MyLinearCrossEntropy).
"""

import jax
import jax.numpy as jnp


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def lm_head_ce_loss(hidden, kernel, bias, targets, *,
                    ignore_index: int = -100, chunk_size: int = 1024,
                    shift: bool = False):
    """Mean cross-entropy of ``softmax(hidden @ kernel + bias)`` vs targets.

    hidden: [B, L, D]; kernel: [D, V]; bias: [V] or None; targets: [B, L].
    ``shift=True`` applies the CLM shift (predict t+1 from t).
    Returns scalar mean loss over positions where ``targets != ignore_index``.

    Row-chunked: peak logits memory is ``chunk_size x V`` fp32 in both
    forward and backward (chunk body is rematerialized).
    """
    if shift:
        hidden = hidden[:, :-1]
        targets = targets[:, 1:]
    b, l, d = hidden.shape
    n = b * l
    x = hidden.reshape(n, d)
    t = targets.reshape(n)

    n_pad = _round_up(n, chunk_size)
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
        t = jnp.pad(t, (0, n_pad - n), constant_values=ignore_index)
    num_chunks = n_pad // chunk_size
    x = x.reshape(num_chunks, chunk_size, d)
    t = t.reshape(num_chunks, chunk_size)

    @jax.checkpoint
    def chunk_loss(args):
        xc, tc = args
        logits = xc @ kernel
        if bias is not None:
            logits = logits + bias
        return _masked_ce_sum(logits, tc, ignore_index)

    def body(carry, args):
        s, c = carry
        ls, cnt = chunk_loss(args)
        return (s + ls, c + cnt), None

    acc = jnp.promote_types(hidden.dtype, jnp.float32)
    (total, count), _ = jax.lax.scan(body, (jnp.zeros((), acc),
                                            jnp.zeros((), acc)), (x, t))
    return total / jnp.maximum(count, 1.0)


def _masked_ce_sum(logits, targets, ignore_index: int):
    """Shared masked-CE core: fp32 logsumexp CE summed over positions where
    ``targets != ignore_index``. Returns ``(loss_sum, valid_count)``."""
    acc = jnp.promote_types(logits.dtype, jnp.float32)
    logits = logits.astype(acc)
    lse = jax.nn.logsumexp(logits, axis=-1)
    t_safe = jnp.clip(targets, 0, logits.shape[-1] - 1)
    tgt = jnp.take_along_axis(logits, t_safe[..., None], axis=-1)[..., 0]
    valid = (targets != ignore_index)
    losses = jnp.where(valid, lse - tgt, 0.0)
    return jnp.sum(losses), jnp.sum(valid.astype(acc))


def cross_entropy(logits, targets, *, ignore_index: int = -100):
    """Plain masked CE (fp32 softmax), mean over valid positions."""
    total, count = _masked_ce_sum(logits, targets, ignore_index)
    return total / jnp.maximum(count, 1.0)


def linear_residual_layernorm(p_linear, p_ln, x, residual, *,
                              eps: float = 1e-5):
    """linear -> +residual -> LayerNorm, one fusion boundary
    (reference ``LinearRms`` shape, with LN instead of RMS where the
    VyomAI blocks use post-LN)."""
    from ..core import nn as cnn
    y = cnn.linear(p_linear, x)
    return cnn.layer_norm(p_ln, y + residual, eps=eps)


def ffn_gelu(p_in, p_out, x):
    """linear -> GELU -> linear (reference ``FFNGeLU``); XLA fuses the GELU
    into the first matmul's epilogue on TPU."""
    from ..core import nn as cnn
    h = cnn.linear(p_in, x)
    h = cnn.gelu(h)
    return cnn.linear(p_out, h)
