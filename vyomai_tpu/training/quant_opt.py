"""8-bit optimizer states — blockwise-quantized AdamW moments (beyond
reference).

The reference trains with stock torch AdamW (fp32 ``exp_avg``/``exp_avg_sq``
— 8 bytes of optimizer state per parameter, ``Examples/*.ipynb`` main()
cells). On a 16 GB v5e chip those 8 bytes are often the binding constraint:
a 1.5 B-param model's Adam states alone are 12 GB. This module stores both
moments int8 with per-block absmax scales (Dettmers et al., "8-bit
Optimizers via Block-wise Quantization", arXiv:2110.02861), cutting
optimizer state to ~2.03 bytes/param (3.9×) while tracking fp32 AdamW's
training trajectory (test: ``tests/test_quant_opt.py``).

Design (TPU-native):

- **Blockwise linear absmax** quantization over flattened 256-element
  blocks. Each step dequantizes, applies the Adam recurrence in fp32, and
  requantizes — all elementwise VPU work that XLA fuses into one pass over
  the (int8) state, so the step is *faster* than fp32 Adam on
  bandwidth-bound shapes, not just smaller.
- The second moment is stored as **sqrt(v)** before quantization: v spans
  many decades within a block (it is a squared EMA), and the sqrt halves
  its dynamic range in linear space — the same role as bitsandbytes'
  nonlinear dynamic-tree quantization map, but expressible as two fused
  elementwise ops instead of a 256-entry table lookup (gathers are the
  slow path on the VPU).
- Small tensors (norm gains, biases — ``numel < min_size``) keep fp32
  moments, as in bitsandbytes: they contribute nothing to memory and are
  precision-sensitive.
- States are stored with the SAME pytree structure per leaf (a dict of
  arrays), so ``jax.jit`` donation, orbax checkpointing, and GSPMD
  sharding treat them like any other state. Blocks are formed by
  flattening; padded tails quantize zeros exactly (absmax of a zero block
  is 0 → scale 1 → stored 0).

Use via ``training.make_optimizer(kind="adamw8bit")`` or directly:

    opt = optax.chain(optax.clip_by_global_norm(1.0), adamw8bit(3e-4))
"""

from typing import Any, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import optax

BLOCK = 256


def _quantize_blockwise(x: jnp.ndarray, block: int = BLOCK):
    """Flatten → pad → [nblocks, block] int8 + f32 per-block scales."""
    flat = x.reshape(-1).astype(jnp.float32)
    n = flat.shape[0]
    nblocks = -(-n // block)
    pad = nblocks * block - n
    if pad:
        flat = jnp.pad(flat, (0, pad))
    blocks = flat.reshape(nblocks, block)
    absmax = jnp.max(jnp.abs(blocks), axis=1, keepdims=True)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(blocks / scale), -127, 127).astype(jnp.int8)
    return q, scale[:, 0]


def _dequantize_blockwise(q: jnp.ndarray, scale: jnp.ndarray, shape):
    flat = (q.astype(jnp.float32) * scale[:, None]).reshape(-1)
    n = 1
    for d in shape:
        n *= d
    return flat[:n].reshape(shape)


class _QMoment(NamedTuple):
    """One quantized moment tensor. ``q [nblocks, BLOCK]`` int8,
    ``scale [nblocks]`` f32 — ~2.03 bytes/param total."""
    q: jnp.ndarray
    scale: jnp.ndarray


class AdamW8bitState(NamedTuple):
    count: jnp.ndarray
    mu: Any    # per-leaf: _QMoment (large) or fp32 array (small)
    nu: Any    # per-leaf: _QMoment holding sqrt(v), or fp32 array holding v


def adamw8bit(learning_rate: Union[float, optax.Schedule] = 1e-4,
              b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
              weight_decay: float = 0.0, *, block: int = BLOCK,
              min_size: int = 4096,
              mask: Optional[Any] = None) -> optax.GradientTransformation:
    """AdamW with int8 blockwise-quantized moments (module docstring).

    ``min_size``: leaves with fewer elements keep fp32 moments.
    ``mask``: optional pytree/callable of bools — ``False`` leaves skip
    weight decay (same convention as ``optax.add_decayed_weights``).
    """

    def _big(p) -> bool:
        return p.size >= min_size

    def init_fn(params):
        def init_m(p):
            if _big(p):
                z = jnp.zeros(p.size, jnp.float32)
                q, s = _quantize_blockwise(z, block)
                return _QMoment(q, s)
            return jnp.zeros_like(p, jnp.float32)
        mu = jax.tree_util.tree_map(init_m, params)
        nu = jax.tree_util.tree_map(init_m, params)
        return AdamW8bitState(count=jnp.zeros((), jnp.int32), mu=mu, nu=nu)

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("adamw8bit requires params (for weight decay)")
        count = state.count + 1
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)
        # schedules evaluate at the PRE-increment count (optax
        # scale_by_schedule convention: first step sees schedule(0)), while
        # the bias corrections use the 1-based step as Adam requires.
        lr = learning_rate(state.count) if callable(learning_rate) \
            else learning_rate

        decay_mask = None
        if mask is not None:
            m = mask(params) if callable(mask) else mask
            decay_mask = jax.tree_util.tree_leaves(m)

        leaves_g, treedef = jax.tree_util.tree_flatten(updates)
        leaves_p = treedef.flatten_up_to(params)
        leaves_mu = treedef.flatten_up_to(state.mu)
        leaves_nu = treedef.flatten_up_to(state.nu)

        new_updates, new_mu, new_nu = [], [], []
        for i, (g, p, mu, nu) in enumerate(
                zip(leaves_g, leaves_p, leaves_mu, leaves_nu)):
            g32 = g.astype(jnp.float32)
            if isinstance(mu, _QMoment):
                m = _dequantize_blockwise(mu.q, mu.scale, g.shape)
                v = _dequantize_blockwise(nu.q, nu.scale, g.shape) ** 2
            else:
                m, v = mu, nu
            m = b1 * m + (1.0 - b1) * g32
            v = b2 * v + (1.0 - b2) * g32 * g32
            step = (m / c1) / (jnp.sqrt(v / c2) + eps)
            if weight_decay and (decay_mask is None or decay_mask[i]):
                step = step + weight_decay * p.astype(jnp.float32)
            new_updates.append((-lr * step).astype(p.dtype))
            if isinstance(mu, _QMoment):
                new_mu.append(_QMoment(*_quantize_blockwise(m, block)))
                new_nu.append(_QMoment(*_quantize_blockwise(
                    jnp.sqrt(v), block)))
            else:
                new_mu.append(m)
                new_nu.append(v)

        return (jax.tree_util.tree_unflatten(treedef, new_updates),
                AdamW8bitState(count=count,
                               mu=jax.tree_util.tree_unflatten(
                                   treedef, new_mu),
                               nu=jax.tree_util.tree_unflatten(
                                   treedef, new_nu)))

    return optax.GradientTransformation(init_fn, update_fn)


def optimizer_state_bytes(opt_state) -> int:
    """Total bytes held by an optimizer state pytree (diagnostics: the
    8-bit claim is ~2.03 bytes/param vs fp32 AdamW's 8)."""
    return sum(x.nbytes for x in jax.tree_util.tree_leaves(opt_state)
               if isinstance(x, (jnp.ndarray, jax.Array))
               or hasattr(x, "nbytes"))
