"""Primitive neural-net building blocks as pure init/apply function pairs.

Params are plain nested dicts of ``jnp.ndarray`` (pytrees). Every ``*_init``
returns a param dict; every ``*_apply`` is pure and jittable. Convention:
linear kernels are stored ``[in, out]`` (JAX convention; the reference's
torch ``nn.Linear`` stores ``[out, in]`` — transposed on import).

Numerics match the reference exactly where parity matters:
- GELU is the exact (erf) form, matching ``torch.nn.GELU()`` default
  (reference ``VyomAI/layers/ffn.py:8``, ``models/encoder.py:83``).
- LayerNorm has weight+bias and matches ``torch.nn.LayerNorm``.
"""

import contextlib
from typing import Optional

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Multi-LoRA lane context (per-request adapters in batched serving)
# ---------------------------------------------------------------------------

_LORA_LANES = None


@contextlib.contextmanager
def lora_lanes(lanes):
    """Trace-time context carrying per-lane adapter ids ``[B]`` int32
    (-1 = base model only). While active, :func:`linear` resolves stacked
    multi-adapter factors (``mlora_a [.., n, in, r]`` / ``mlora_b
    [.., n, r, out]`` — see ``layers.adapters.embed_multi_lora``) by
    gathering each lane's adapter and adding its low-rank delta. The
    context is consumed at TRACE time, so it must wrap the model ``apply``
    inside the jitted function whose argument ``lanes`` is."""
    global _LORA_LANES
    prev = _LORA_LANES
    _LORA_LANES = lanes
    try:
        yield
    finally:
        _LORA_LANES = prev


# ---------------------------------------------------------------------------
# Initializers (reference init: normal std=0.02, zero bias — utils.py:21-34)
# ---------------------------------------------------------------------------

def normal_init(key, shape, std: float = 0.02, dtype=jnp.float32):
    return (jax.random.normal(key, shape) * std).astype(dtype)


def linear_init(key, in_dim: int, out_dim: int, *, bias: bool = True,
                std: float = 0.02, dtype=jnp.float32):
    p = {"kernel": normal_init(key, (in_dim, out_dim), std=std, dtype=dtype)}
    if bias:
        p["bias"] = jnp.zeros((out_dim,), dtype=dtype)
    return p


def embedding_init(key, num_embeddings: int, dim: int, *, std: float = 0.02,
                   pad_idx: Optional[int] = None, dtype=jnp.float32):
    w = normal_init(key, (num_embeddings, dim), std=std, dtype=dtype)
    if pad_idx is not None:
        w = w.at[pad_idx].set(0.0)
    return {"weight": w}


def layer_norm_init(dim: int, dtype=jnp.float32):
    return {"weight": jnp.ones((dim,), dtype=dtype),
            "bias": jnp.zeros((dim,), dtype=dtype)}


def rms_norm_init(dim: int, dtype=jnp.float32):
    return {"weight": jnp.ones((dim,), dtype=dtype)}


# ---------------------------------------------------------------------------
# Apply functions
# ---------------------------------------------------------------------------

def linear(p, x):
    if "kernel_q" in p:  # int8 weight-only path (quant.quantize_params)
        if "act_q" in p:  # W8A8: dynamic per-token act quant, int8 MXU
            from ..ops.quant_matmul import w8a8_matmul
            y = w8a8_matmul(x, p["kernel_q"], p["scale"])
        else:
            from ..ops.quant_matmul import int8_matmul
            y = int8_matmul(x, p["kernel_q"], p["scale"])
    elif "kernel_q4" in p:  # packed int4 + group scales (bits=4)
        from ..ops.quant_matmul import int4_matmul
        y = int4_matmul(x, p["kernel_q4"], p["scale"])
    else:
        y = x @ p["kernel"]
    if "lora_a" in p:
        # embedded QLoRA factors (layers.adapters.merge_adapters over an
        # int8 base): low-rank term in fp next to the frozen int8 kernel;
        # alpha is pre-folded into lora_a by the merge
        y = y + (x @ p["lora_a"].astype(x.dtype)) @ \
            p["lora_b"].astype(x.dtype)
    if "mlora_a" in p:
        # stacked multi-adapter factors: each batch lane applies ITS OWN
        # adapter (or none), selected by the lora_lanes context — the
        # multi-tenant serving path (layers.adapters.embed_multi_lora).
        # alpha is pre-folded into mlora_a by the embed.
        if _LORA_LANES is None:
            raise RuntimeError(
                "params carry multi-LoRA factors (mlora_a) but no lane "
                "context is active — wrap apply in nn.lora_lanes(lanes)")
        sel = jnp.maximum(_LORA_LANES, 0)
        a = jnp.take(p["mlora_a"], sel, axis=0).astype(x.dtype)  # [B, in, r]
        bf = jnp.take(p["mlora_b"], sel, axis=0).astype(x.dtype)
        delta = jnp.einsum("b...r,bro->b...o",
                           jnp.einsum("b...i,bir->b...r", x, a), bf)
        on = (_LORA_LANES >= 0).astype(x.dtype)
        y = y + delta * on.reshape(on.shape + (1,) * (x.ndim - 1))
    if "bias" in p:
        y = y + p["bias"]
    return y


def embedding(p, ids, pad_idx: Optional[int] = None):
    """Row lookup. ``pad_idx`` replicates torch
    ``nn.Embedding(padding_idx=...)`` TRAINING semantics (reference
    ``models/encoder.py:104``, ``models/decoder.py:292``,
    ``custom_transformer.py:394``): the pad row's gradient is structurally
    zero. Implemented on the lookup side — contributions from positions
    where ``ids == pad_idx`` are detached — so no per-step scatter over the
    whole table is needed (forward values are unchanged)."""
    if "weight_q" in p:  # int8 rows: gather then exact per-row dequant
        rows = jnp.take(p["weight_q"], ids, axis=0).astype(jnp.float32)
        rows = rows * jnp.take(p["scale"], ids, axis=0)[..., None]
        return rows.astype(p["out_dtype"].dtype)
    rows = jnp.take(p["weight"], ids, axis=0)
    if pad_idx is not None:
        rows = jnp.where((ids == pad_idx)[..., None],
                         jax.lax.stop_gradient(rows), rows)
    return rows


def embedding_dtype(p):
    """Activation dtype of an embedding table — the table's own dtype, or
    the preserved fp dtype marker for int8-quantized tables."""
    return p["out_dtype"].dtype if "weight_q" in p else p["weight"].dtype


def tied_lm_head(embed_p, hidden):
    """Logits through a tied embedding table: ``hidden @ W.T`` for fp
    weights, or the int8 ``nk``-layout kernel for quantized tables (scale
    is per vocab row = per output channel of the transposed matmul)."""
    if "weight_q" in embed_p:
        from ..ops.quant_matmul import int8_matmul
        return int8_matmul(hidden, embed_p["weight_q"], embed_p["scale"],
                           w_layout="nk")
    return hidden @ embed_p["weight"].T.astype(hidden.dtype)


def remat_wrap(body, remat):
    """Wrap a scan body per the remat setting.

    - ``False``/``None``: no rematerialization.
    - ``True`` / ``"full"``: ``jax.checkpoint`` — O(1)-in-depth activation
      memory, but the backward RE-RUNS every layer matmul (+fwd FLOPs on
      top of the 3x train step = a hard 75% delivered-MFU ceiling; measured
      in benchmarks/mfu_profile.py).
    - ``"dots"``: ``checkpoint_policies.dots_with_no_batch_dims_saveable``
      — projection/FFN outputs are SAVED (no matmul recompute), only
      cheap elementwise/norm work and the batched attention einsums
      rematerialize. Costs ~per-layer matmul-output activations of HBM;
      the right default whenever they fit.
    """
    if not remat:
        return body
    if remat == "dots":
        return jax.checkpoint(
            body,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    return jax.checkpoint(body)


def layer_norm(p, x, eps: float = 1e-5):
    # Reduce in fp32 for bf16 inputs, cast back — matches torch numerics.
    # fp64 inputs keep fp64 (x64 parity runs must not floor at fp32 noise).
    dtype = x.dtype
    x32 = x.astype(jnp.promote_types(dtype, jnp.float32))
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["weight"] + p["bias"]).astype(dtype)


def rms_norm(p, x, eps: float = 1e-6, *, plus_one: bool = False):
    """RMSNorm. ``plus_one=True`` selects Gemma's ``x * (1 + w)`` form
    (reference ``paligemma.ipynb`` GemmaRMSNorm)."""
    dtype = x.dtype
    acc = jnp.promote_types(dtype, jnp.float32)
    x32 = x.astype(acc)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    y = x32 * jax.lax.rsqrt(var + eps)
    w = p["weight"].astype(acc)
    if plus_one:
        y = y * (1.0 + w)
    else:
        y = y * w
    return y.astype(dtype)


_GELU_C1, _GELU_C3, _GELU_C5 = 1.12814338, 0.10408119, -0.00178648


def _gelu_fast_fwd_math(x):
    xf = x.astype(jnp.float32)
    u = xf * (2 ** -0.5)
    u2 = u * u
    t = jnp.tanh(u * (_GELU_C1 + u2 * (_GELU_C3 + _GELU_C5 * u2)))
    return (0.5 * xf * (1.0 + t)).astype(x.dtype)


@jax.custom_vjp
def _gelu_bf16_fast(x):
    return _gelu_fast_fwd_math(x)


def _gelu_fast_fwd(x):
    # residual = the bf16 INPUT only (the erf path's memory footprint);
    # letting autodiff trace the fp32 intermediates instead saved fp32
    # activations per FFN and OOM'd bench.py's naive comparator
    return _gelu_fast_fwd_math(x), (x,)


def _gelu_fast_bwd(res, g):
    (x,) = res
    xf = x.astype(jnp.float32)
    u = xf * (2 ** -0.5)
    u2 = u * u
    t = jnp.tanh(u * (_GELU_C1 + u2 * (_GELU_C3 + _GELU_C5 * u2)))
    dP = _GELU_C1 + u2 * (3 * _GELU_C3 + 5 * _GELU_C5 * u2)
    dy = 0.5 * (1.0 + t) + 0.5 * xf * (1.0 - t * t) * dP * (2 ** -0.5)
    return ((g.astype(jnp.float32) * dy).astype(x.dtype),)


_gelu_bf16_fast.defvjp(_gelu_fast_fwd, _gelu_fast_bwd)


def gelu(x):
    """Exact (erf) GELU — matches ``torch.nn.GELU()`` default.

    bf16 fast path: erf evaluated via a fitted odd tanh-polynomial
    (``erf(u) ~ tanh(u(c1 + u^2(c3 + c5 u^2)))``, max |gelu error|
    5.4e-5 — ~70x below bf16's ulp at 1.0, so outputs differ from the
    true-erf form by at most 1 bf16 ulp). Why: XLA:TPU's erf expansion
    does not fuse into matmul epilogues (measured +760 us/layer on a
    ViT-base FFN, 47% over the pure matmul — benchmarks/vit_profile.py
    r4) while tanh is VPU-hardware-fast and fuses to ~zero cost. The
    custom VJP keeps only the bf16 input as residual (the erf path's
    memory footprint). fp32/fp64 inputs keep the true erf (all parity
    tests run there)."""
    if x.dtype == jnp.bfloat16:
        return _gelu_bf16_fast(x)
    return jax.nn.gelu(x, approximate=False)


def gelu_tanh(x):
    """Tanh-approximate GELU (SigLIP MLP, reference paligemma.ipynb)."""
    return jax.nn.gelu(x, approximate=True)


# Activation table mirroring reference ``layers/ffn.py:7-15`` (_ACT_).
ACT = {
    "gelu": gelu,
    "gelu_pytorch_tanh": gelu_tanh,
    "leaky_relu": lambda x: jax.nn.leaky_relu(x, negative_slope=0.01),
    "relu6": lambda x: jnp.clip(x, 0.0, 6.0),
    "sigmoid": jax.nn.sigmoid,
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
    "tanh": jnp.tanh,
}


def get_act(name: Optional[str]):
    return ACT.get(name, gelu)


def dropout(x, rate: float, *, deterministic: bool, rng=None):
    """Inverted dropout. No-op when deterministic or rate == 0."""
    if deterministic or rate == 0.0:
        return x
    if rng is None:
        raise ValueError("dropout requires an rng key when not deterministic")
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, p=keep, shape=x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)
