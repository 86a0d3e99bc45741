"""LoRA / DoRA adapters (reference ``VyomAI/layers/adapters.py``).

Two surfaces:

1. Single-layer classes ``LoraLinear`` / ``DoraLinear`` with the reference
   math, for drop-in use.
2. TPU-idiomatic **param-tree transforms**: ``inject_lora`` / ``inject_dora``
   walk a model's param pytree and attach low-rank factors next to every
   matched linear kernel (including stacked ``[L, in, out]`` scan kernels);
   ``merge_adapters`` produces effective params
   (``W_eff = W + alpha * A @ B`` — mathematically identical to the
   reference's two-path forward; gradients flow to the factors through the
   merge) and ``trainable_mask`` yields an optax mask that freezes the base.

QLoRA (beyond the reference): the transforms also accept an int8-quantized
base tree (``quant.quantize_params``). The delta cannot fold into integer
kernels, so ``merge_adapters`` embeds the fp factors in the quantized node
and ``core.nn.linear`` adds ``alpha * (x @ A) @ B`` at apply time — take
``jax.grad`` w.r.t. the adapters tree and the int8 base stays frozen in
HBM at half the fp16 footprint.

Reference math:
- LoRA: ``out = Wx + alpha * B(A(x))``, ``A ~ N(0, 1/sqrt(r))``, ``B = 0``
  (``adapters.py:7-47``).
- DoRA: magnitude ``m = ||W||_2`` per input column times direction-normalized
  ``(W + BA)`` (``adapters.py:50-75``).
"""

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..core import nn as cnn


# ---------------------------------------------------------------------------
# Single-layer API (reference parity)
# ---------------------------------------------------------------------------

class LoraLinear:
    def __init__(self, in_features: int, out_features: int, rank: int = 32,
                 alpha: float = 1.0, lora_dropout: float = 0.0):
        self.in_features, self.out_features = in_features, out_features
        self.rank, self.alpha, self.lora_dropout = rank, alpha, lora_dropout

    def init(self, key, base_linear_params=None, dtype=jnp.float32):
        k1, k2 = jax.random.split(key)
        std = 1.0 / (self.rank ** 0.5)
        p = {
            "lora_a": (jax.random.normal(k1, (self.in_features, self.rank))
                       * std).astype(dtype),
            "lora_b": jnp.zeros((self.rank, self.out_features), dtype=dtype),
        }
        if base_linear_params is None:
            base_linear_params = cnn.linear_init(k2, self.in_features,
                                                 self.out_features, dtype=dtype)
        p["linear"] = base_linear_params
        return p

    def apply(self, p, x, *, deterministic=True, rng=None):
        base = cnn.linear(p["linear"], x)
        lora = (x @ p["lora_a"]) @ p["lora_b"] * self.alpha
        lora = cnn.dropout(lora, self.lora_dropout,
                           deterministic=deterministic, rng=rng)
        return base + lora

    __call__ = apply


class DoraLinear:
    def __init__(self, in_features: int, out_features: int, rank: int = 32):
        self.in_features, self.out_features = in_features, out_features
        self.rank = rank

    def init(self, key, base_linear_params=None, dtype=jnp.float32):
        k1, k2 = jax.random.split(key)
        if base_linear_params is None:
            base_linear_params = cnn.linear_init(k2, self.in_features,
                                                 self.out_features, dtype=dtype)
        w = base_linear_params["kernel"]  # [in, out]
        std = 1.0 / (self.rank ** 0.5)
        return {
            "linear": base_linear_params,
            # reference: dora_a [out, r], dora_b [r, in]; ours transposed to
            # match the [in, out] kernel convention: a [in, r] (zeros side
            # swapped so the initial product is zero as in the reference)
            "dora_a": jnp.zeros((self.in_features, self.rank), dtype=dtype),
            "dora_b": (jax.random.normal(k1, (self.rank, self.out_features))
                       * std).astype(dtype),
            # magnitude: per input-column L2 norm of W^T == per-row of kernel
            "dora_m": jnp.linalg.norm(w, axis=1, keepdims=True).astype(dtype),
        }

    def apply(self, p, x):
        adapted = p["linear"]["kernel"] + p["dora_a"] @ p["dora_b"]
        col_norm = jnp.linalg.norm(adapted, axis=1, keepdims=True)
        calc = p["dora_m"] * adapted / col_norm
        y = x @ calc
        if "bias" in p["linear"]:
            y = y + p["linear"]["bias"]
        return y

    __call__ = apply


# ---------------------------------------------------------------------------
# Param-tree transforms
# ---------------------------------------------------------------------------

def _is_linear(node) -> bool:
    if not isinstance(node, dict):
        return False
    kern = node.get("kernel", node.get("kernel_q"))
    return kern is not None and getattr(kern, "ndim", 0) >= 2


def _base_kernel(node):
    """The (possibly int8) kernel array of a linear node — shape source for
    adapter factors."""
    return node["kernel"] if "kernel" in node else node["kernel_q"]


def _factor_dtype(node):
    """Adapter factors are fp even over an int8 base (QLoRA): use the scale
    dtype there, the kernel dtype otherwise."""
    return node["scale"].dtype if "kernel_q" in node else node["kernel"].dtype


def _walk(params, fn, path=()):
    if _is_linear(params):
        return fn(path, params)
    if isinstance(params, dict):
        return {k: _walk(v, fn, path + (k,)) for k, v in params.items()}
    return None  # non-linear leaf: no adapter (None vanishes from the tree)


def inject_lora(params, key, rank: int = 32, alpha: float = 1.0,
                filter_fn: Optional[Callable] = None):
    """Attach LoRA factors to every matched linear kernel. Returns an
    ``adapters`` pytree parallel to ``params``. ``filter_fn(path)`` selects
    which linears to adapt (default: all)."""
    counter = [0]

    def make(path, node):
        if filter_fn is not None and not filter_fn("/".join(path)):
            return {}
        counter[0] += 1
        k = jax.random.fold_in(key, counter[0])
        kern = _base_kernel(node)
        dtype = _factor_dtype(node)
        *lead, d_in, d_out = kern.shape
        std = 1.0 / (rank ** 0.5)
        return {
            "lora_a": (jax.random.normal(k, (*lead, d_in, rank))
                       * std).astype(dtype),
            "lora_b": jnp.zeros((*lead, rank, d_out), dtype=dtype),
        }

    return {"kind": "lora", "alpha": alpha, "tree": _walk(params, make)}


def inject_dora(params, key, rank: int = 32,
                filter_fn: Optional[Callable] = None):
    counter = [0]

    def make(path, node):
        if filter_fn is not None and not filter_fn("/".join(path)):
            return {}
        if "kernel_q" in node:
            raise ValueError(
                "DoRA over an int8-quantized base is unsupported: its "
                "column-norm renormalization needs the dequantized kernel "
                "every step, erasing the quantization win. Use LoRA "
                "(inject_lora) over quantized params, or DoRA over fp.")
        counter[0] += 1
        k = jax.random.fold_in(key, counter[0])
        kern = node["kernel"]
        *lead, d_in, d_out = kern.shape
        std = 1.0 / (rank ** 0.5)
        return {
            "dora_a": jnp.zeros((*lead, d_in, rank), dtype=kern.dtype),
            "dora_b": (jax.random.normal(k, (*lead, rank, d_out))
                       * std).astype(kern.dtype),
            "dora_m": jnp.linalg.norm(kern, axis=-1, keepdims=True),
        }

    return {"kind": "dora", "tree": _walk(params, make)}


def merge_adapters(params, adapters):
    """Effective params with adapters folded into kernels (pure/jittable;
    differentiable w.r.t. the adapter factors)."""
    kind = adapters["kind"]
    alpha = adapters.get("alpha", 1.0)

    def merge(params, ad):
        if _is_linear(params):
            if not ad:
                return params
            if "kernel_q" in params:
                # int8 base (QLoRA): a low-rank delta cannot fold into the
                # integer kernel — embed the factors; core.nn.linear adds
                # the (x @ A) @ B term at apply time, so gradients flow to
                # the factors while the base stays int8 in HBM. alpha folds
                # into A (a scalar leaf would break lax.scan layer slicing).
                return {**params,
                        "lora_a": ad["lora_a"] * jnp.asarray(
                            alpha, ad["lora_a"].dtype),
                        "lora_b": ad["lora_b"]}
            kern = params["kernel"]
            if kind == "lora":
                delta = jnp.einsum("...ir,...ro->...io",
                                   ad["lora_a"], ad["lora_b"]) * alpha
                return {**params, "kernel": kern + delta}
            adapted = kern + jnp.einsum("...ir,...ro->...io",
                                        ad["dora_a"], ad["dora_b"])
            col = jnp.linalg.norm(adapted, axis=-1, keepdims=True)
            return {**params, "kernel": ad["dora_m"] * adapted / col}
        if isinstance(params, dict):
            return {k: merge(v, ad.get(k, {}) if isinstance(ad, dict) else {})
                    for k, v in params.items()}
        return params

    return merge(params, adapters["tree"])


def embed_multi_lora(params, adapters_list):
    """Embed N LoRA adapters into one param tree for MULTI-TENANT batched
    inference (per-request adapters, S-LoRA style): every adapted linear
    node gains ``mlora_a [.., n, in, r]`` / ``mlora_b [.., n, r, out]``
    (adapter axis inserted AFTER any stacked-layer lead dims, so
    ``lax.scan`` layer slicing leaves it intact), with each adapter's alpha
    pre-folded into its A factor. At apply time ``core.nn.linear`` gathers
    each batch lane's adapter under the ``nn.lora_lanes(lanes)`` context
    (lane id -1 = base model, zero delta) — so one batched decode step
    serves requests with DIFFERENT adapters over one shared base (fp, int8
    or int4). Per-linear cost: two rank-r matmuls on gathered [B, ..]
    factors.

    ``adapters_list``: trees from :func:`inject_lora` over these
    ``params``. All must share the rank; a node some adapters skip
    (``filter_fn``) gets zero factors for them. The base params are
    unchanged — unlike :func:`merge_adapters` nothing folds into kernels
    (folding would bake ONE adapter into the shared weights).
    """
    if not adapters_list:
        raise ValueError("need at least one adapter")
    for ad in adapters_list:
        if ad["kind"] != "lora":
            raise ValueError("embed_multi_lora supports LoRA adapters only "
                             "(DoRA renormalizes the kernel per adapter — "
                             "cannot share one base matmul)")
    def walk(params, trees, alphas):
        if _is_linear(params):
            got = [(t, al) for t, al in zip(trees, alphas) if t]
            if not got:
                return params
            kern = _base_kernel(params)
            dtype = _factor_dtype(params)
            *lead, d_in, d_out = kern.shape
            rk = {t["lora_a"].shape[-1] for t, _ in got}
            if len(rk) > 1:
                raise ValueError(f"mixed LoRA ranks {sorted(rk)}: all "
                                 "adapters in one batch must share the rank")
            r = rk.pop()
            za = jnp.zeros((*lead, d_in, r), dtype)
            zb = jnp.zeros((*lead, r, d_out), dtype)
            a_parts, b_parts = [], []
            for t, al in zip(trees, alphas):
                if t:
                    a_parts.append(t["lora_a"].astype(dtype)
                                   * jnp.asarray(al, dtype))
                    b_parts.append(t["lora_b"].astype(dtype))
                else:
                    a_parts.append(za)
                    b_parts.append(zb)
            # adapter axis after lead dims: [.., n, in, r] — lax.scan
            # slices the LEADING layer axis, leaving [n, in, r] per layer
            return {**params,
                    "mlora_a": jnp.stack(a_parts, axis=-3),
                    "mlora_b": jnp.stack(b_parts, axis=-3)}
        if isinstance(params, dict):
            return {k: walk(v,
                            [t.get(k, {}) if isinstance(t, dict) else {}
                             for t in trees], alphas)
                    for k, v in params.items()}
        return params

    return walk(params, [ad["tree"] for ad in adapters_list],
                [ad.get("alpha", 1.0) for ad in adapters_list])


def trainable_mask(params, predicate: Callable[[str], bool]):
    """Boolean pytree parallel to ``params`` for optax param freezing.

    ``predicate("path/like/this")`` decides whether the subtree leaf is
    trainable. Combine with :func:`masked_optimizer` (or
    ``optax.multi_transform``) for partial fine-tunes — e.g. the PaliGemma
    attention-only recipe (reference ``Examples/paligemma.ipynb``
    freeze-all-but-attention cells):

        mask = trainable_mask(params, lambda p: "self_attn" in p)
        opt = masked_optimizer(optax.adamw(1e-5), mask)
    """
    def walk(node, path=()):
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        return bool(predicate("/".join(path)))

    return walk(params)


def masked_optimizer(optimizer, mask):
    """optax transform that applies ``optimizer`` where ``mask`` is True and
    zeroes updates elsewhere (frozen params never move; their optimizer
    state is not allocated)."""
    import optax
    labels = jax.tree_util.tree_map(
        lambda m: "train" if m else "freeze", mask)
    return optax.multi_transform(
        {"train": optimizer, "freeze": optax.set_to_zero()}, labels)


def count_params(tree) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(tree))
