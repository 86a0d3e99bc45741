"""Weight-only int8 quantization of model param trees.

``quantize_params`` walks a params pytree and replaces every linear kernel
(dict with a 2-D/3-D ``"kernel"``) with ``{"kernel_q": int8, "scale": f32
per-output-channel}`` — 3-D kernels are scan-stacked layers and quantize
per layer. The embedding table (``embed_tokens``-style dicts holding a 2-D
``"weight"``) quantizes per row, which serves both the gather (exact row
dequant) and the tied lm_head (per-vocab-row scale applied on logits).

``core.nn.linear`` / ``core.nn.embedding`` / ``core.nn.tied_lm_head``
dispatch on the quantized keys, so the whole modern decode stack
(``models/qwen.py``, ``serving/paged_model.py``) runs quantized without
any call-site changes: pass the transformed tree where params went before.

The reference has no quantized inference at all — its weight streaming is
fp16 CUDA (SURVEY.md §2.3); this path halves decode HBM traffic instead
(see ``ops/quant_matmul.py`` for why the dequant must live in the kernel).

MoE expert banks (``w_in``/``w_gate``/``w_out``, stacked ``[..., E, in,
out]``) quantize per expert per output channel into ``w_*_q`` +
``w_*_scale`` siblings; ``layers.moe.moe_apply`` dispatches on the
quantized keys. The tiny router always stays fp (routing decisions are
scale-sensitive).

Deliberately NOT quantized: norm weights (1-D), biases, the MoE router,
convolution patchify kernels — decode-time bandwidth lives in the
attention/MLP/lm_head linears and the expert banks.
"""

import jax
import jax.numpy as jnp

from .ops.quant_matmul import quantize_weight, quantize_weight_int4

_EXCLUDE_DEFAULT = ("router",)
# token-embedding tables (quantize per vocab row); positional-embedding
# tables deliberately stay fp — they are small and add to every token
_EMBED_NAMES = ("embed_tokens", "word_embeddings")


def _quantize_linear(p, bits: int = 8, group_size: int = 128,
                     act_bits: int = 0):
    kern = p["kernel"]
    if bits == 4:
        key = "kernel_q4"
        fn = lambda w: quantize_weight_int4(w, group_size=group_size)
        if kern.shape[-2] % group_size:        # K not groupable: stay int8
            key, fn = "kernel_q", (
                lambda w: quantize_weight(w, contract_axis=0))
    else:
        key = "kernel_q"
        fn = lambda w: quantize_weight(w, contract_axis=0)
    if kern.ndim == 2:
        q, s = fn(kern)
    elif kern.ndim == 3:                       # scan-stacked [L, in, out]
        q, s = jax.vmap(fn)(kern)
    else:
        return p
    out = {key: q, "scale": s}
    if act_bits == 8 and key == "kernel_q":
        # size-1-per-layer marker (orbax refuses zero-size arrays):
        # core.nn.linear dispatches to the W8A8 int8-MXU path when present.
        # Scan-stacked kernels need the leading layer axis so lax.scan can
        # slice the marker alongside the kernel it tags.
        shape = (kern.shape[0], 1) if kern.ndim == 3 else (1,)
        out["act_q"] = jnp.zeros(shape, jnp.int8)
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def _quantize_nd(w):
    """Per-output-channel quantization of ``[..., in, out]`` weight stacks
    (vmapped over every leading dim)."""
    fn = lambda x: quantize_weight(x, contract_axis=0)
    for _ in range(w.ndim - 2):
        fn = jax.vmap(fn)
    return fn(w)


def _quantize_moe(p):
    """Expert banks → int8 + per-expert-per-channel scales; router and
    biases stay fp (see module docstring)."""
    out = dict(p)
    for name in ("w_in", "w_gate", "w_out"):
        if name in p:
            q, s = _quantize_nd(p[name])
            del out[name]
            out[name + "_q"], out[name + "_scale"] = q, s
    return out


def _quantize_embedding(p):
    w = p["weight"]
    if w.ndim == 2:
        q, s = quantize_weight(w, contract_axis=1)
    elif w.ndim == 3:
        q, s = jax.vmap(lambda x: quantize_weight(x, contract_axis=1))(w)
    else:
        return p
    # one-element marker preserving the activation dtype of the fp table
    # (only its dtype is read; size 1 rather than 0 because orbax refuses
    # to checkpoint zero-size arrays)
    return {"weight_q": q, "scale": s,
            "out_dtype": jnp.zeros((1,), dtype=w.dtype)}


def quantize_params(params, *, embed: bool = True,
                    exclude=_EXCLUDE_DEFAULT, bits: int = 8,
                    group_size: int = 128, act_bits: int = 0):
    """Return a copy of ``params`` with linear kernels (and, when ``embed``,
    2-D embedding tables) quantized to int8 + per-output-channel scales.

    ``bits=4`` packs linear kernels two-per-byte with per-``group_size``
    group scales (``ops.quant_matmul.quantize_weight_int4``) — quarter the
    weight bytes of bf16. Embedding tables and MoE expert banks stay int8
    (the gather path wants whole dequantized rows; kernels whose K doesn't
    divide ``group_size`` also fall back to int8).

    ``act_bits=8`` (requires ``bits=8``) additionally marks every linear
    for W8A8: activations are dynamically quantized per token at apply
    time and the contraction runs int8×int8→int32 on the MXU — ~2× the
    bf16 FLOP rate on the v5e for compute-bound (prefill/scoring) shapes.
    Embedding gathers, the tied lm_head, and MoE expert banks keep
    weight-only dequant (the logits head is accuracy-sensitive and the
    gather path wants whole rows). Prefill and cached decode quantize each
    token identically, so cached-vs-uncached token-exactness holds.

    ``exclude``: dict-key names whose kernels stay full precision (the MoE
    router by default — routing decisions are scale-sensitive and tiny).
    """
    assert bits in (8, 4), bits
    assert act_bits in (0, 8), act_bits
    assert not (act_bits == 8 and bits == 4), \
        "W8A8 needs unpacked int8 kernels (bits=8) for the int8 MXU path"

    def walk(node, name="", parent=""):
        if not isinstance(node, dict):
            return node
        if "w_in" in node and "w_out" in node:      # MoE expert bank
            return _quantize_moe(node)
        if "kernel" in node and name not in exclude and \
                node["kernel"].ndim in (2, 3):
            # the logits head keeps weight-only dequant under W8A8 (the
            # docstring's accuracy guarantee) — the tied head gets this via
            # the embedding path; the UNTIED "lm_head" must opt out here.
            # Both untied layouts exist: a flat {"lm_head": {"kernel"}}
            # (models/qwen.py) and the nested {"lm_head": {"decoder":
            # {"kernel"}}} of models/encoder.py's lm_head_init.
            head = name == "lm_head" or \
                (parent == "lm_head" and name == "decoder")
            ab = 0 if head else act_bits
            return _quantize_linear(node, bits=bits, group_size=group_size,
                                    act_bits=ab)
        if embed and "weight" in node and node["weight"].ndim in (2, 3) \
                and "bias" not in node and name in _EMBED_NAMES:
            return _quantize_embedding(node)
        return {k: walk(v, k, name) for k, v in node.items()}

    return walk(params)


def dequantize_params(params):
    """Inverse transform (fp reconstruction — for debugging/error studies)."""
    def walk(node):
        if not isinstance(node, dict):
            return node
        if "w_in_q" in node:                        # MoE expert bank
            out = dict(node)
            for name in ("w_in", "w_gate", "w_out"):
                if name + "_q" in out:
                    q = out.pop(name + "_q")
                    s = out.pop(name + "_scale")
                    out[name] = q.astype(jnp.float32) * s[..., None, :]
            return {k: walk(v) for k, v in out.items()}
        if "kernel_q" in node:
            s = node["scale"]
            kern = node["kernel_q"].astype(jnp.float32) * s[..., None, :]
            out = {"kernel": kern}
            if "bias" in node:
                out["bias"] = node["bias"]
            return out
        if "kernel_q4" in node:
            from .ops.quant_matmul import _unpack_int4

            def deq(p8, s):
                lo, hi = _unpack_int4(p8)
                k = 2 * p8.shape[0]
                w = jnp.stack([lo, hi], axis=1).reshape(k, p8.shape[1])
                gs = k // s.shape[0]
                return (w.reshape(s.shape[0], gs, -1).astype(jnp.float32)
                        * s[:, None, :]).reshape(k, -1)

            q4, s = node["kernel_q4"], node["scale"]
            kern = (jax.vmap(deq)(q4, s) if q4.ndim == 3 else deq(q4, s))
            out = {"kernel": kern}
            if "bias" in node:
                out["bias"] = node["bias"]
            return out
        if "weight_q" in node:
            w = node["weight_q"].astype(jnp.float32) * \
                node["scale"][..., :, None]
            if "out_dtype" in node:
                w = w.astype(node["out_dtype"].dtype)
            return {"weight": w}
        return {k: walk(v) for k, v in node.items()}

    return walk(params)


def quantization_error(params, qparams):
    """Max relative per-tensor reconstruction error (diagnostics). The two
    trees must have matching structure (``qparams = quantize_params(params)``
    — dequantization restores the original key layout)."""
    deq = dequantize_params(qparams)
    errs = {}
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(deq)):
        denom = jnp.maximum(jnp.max(jnp.abs(a)), 1e-9)
        errs[jax.tree_util.keystr(path)] = float(
            jnp.max(jnp.abs(a.astype(jnp.float32) - b)) / denom)
    return errs
