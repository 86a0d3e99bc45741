"""Mixture-of-Experts FFN with expert parallelism (GShard/Switch style).

The reference has no MoE (SURVEY §2.4: EP n/a); this is a TPU-native
scaling extension completing the parallelism set (dp/tp/sp/pp/ep/fsdp).

Design: capacity-based dispatch expressed as dense einsums — the GShard
formulation, which is exactly what maps onto the MXU and onto GSPMD:

    dispatch [T, E, C]  one-hot routing of each token to its (expert,
                        buffer-slot); tokens beyond an expert's capacity
                        C = ceil(capacity_factor * k * T / E) are dropped
    expert_in [E, C, D] = einsum('tec,td->ecd', dispatch, x)
    h         [E, C, D] = ffn_e(expert_in)        # stacked expert weights
    out       [T, D]    = einsum('tec,ecd->td', combine, h)

Expert parallelism = sharding the stacked expert weights and the [E, C, D]
activations on the E dim over an ``ep`` mesh axis (``expert_pspec``); under
``jit`` GSPMD partitions the einsums over E and inserts the all-to-all-
equivalent collectives — no hand-written dispatch loops. The router's
load-balancing auxiliary loss is the Switch formulation
``E * sum_e(frac_tokens_e * mean_prob_e)``.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import nn as cnn


def moe_init(key, config, *, num_experts: int, gated: bool = False,
             dtype=jnp.float32):
    """Router + stacked expert FFN weights ([E, ...] leading expert dim).

    ``gated=True`` builds SwiGLU-style experts (gate/in/out, no biases —
    the modern-decoder MLP shape); default is the classic 2-layer FFN with
    biases."""
    d, f = config.hidden_size, config.intermediate_size
    kr, k1, k2, k3 = jax.random.split(key, 4)
    std = getattr(config, "initializer_range", 0.02)
    p = {
        "router": {"kernel": (jax.random.normal(kr, (d, num_experts))
                              * std).astype(dtype)},
        "w_in": (jax.random.normal(k1, (num_experts, d, f)) * std
                 ).astype(dtype),
        "w_out": (jax.random.normal(k2, (num_experts, f, d)) * std
                  ).astype(dtype),
    }
    if gated:
        p["w_gate"] = (jax.random.normal(k3, (num_experts, d, f)) * std
                       ).astype(dtype)
    else:
        p["b_in"] = jnp.zeros((num_experts, f), dtype=dtype)
        p["b_out"] = jnp.zeros((num_experts, d), dtype=dtype)
    return p


def moe_apply(params, x, *, top_k: int = 2,
              capacity_factor: Optional[float] = 1.25,
              act: str = "gelu",
              impl: str = "einsum") -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Route ``x [..., T, D]`` through the experts.

    Returns ``(out [..., T, D], aux_loss scalar)`` — add
    ``aux_weight * aux_loss`` (typical 0.01) to the training objective to
    balance expert load. Tokens over an expert's capacity pass through the
    residual unchanged (their combine weights are zero).

    ``capacity_factor=None`` = DROPLESS (capacity = T, enough for any
    routing): use at inference so cached single-token decode is token-exact
    vs a full-prefix forward — capacity dropping depends on the number of
    tokens in the call, so any dropping regime would make the two paths
    diverge. Gated (SwiGLU) experts are detected from the params.

    ``impl`` selects the dropless dispatch strategy:

    * ``"einsum"`` (default) — GShard dense dispatch/combine einsums.
      GSPMD-friendly (EP shards the E dim), but the dispatch tensors cost
      O(T·E·C) memory and O(T·C·D) FLOPs — quadratic in tokens when
      dropless (C=T).
    * ``"ragged"`` — megablocks-style: stable-sort the (token, choice)
      rows by expert id and run grouped matmuls with ``lax.ragged_dot``
      (one MXU pass over contiguous per-expert row blocks). Exactly the
      expert FLOPs plus O(T·k·D) gather/scatter; dropless only
      (``capacity_factor`` must be None). Prefer on a single device /
      inside a tp-sharded (not ep-sharded) program.
    """
    orig_shape = x.shape
    d = orig_shape[-1]
    x2 = x.reshape(-1, d)                                   # [T, D]
    t = x2.shape[0]
    e = params.get("w_in", params.get("w_in_q")).shape[0]
    k = min(top_k, e)
    cap = (t if capacity_factor is None
           else max(1, min(t, int(capacity_factor * k * t / e))))

    logits = x2 @ params["router"]["kernel"].astype(x2.dtype)   # [T, E]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    gate_v, gate_i = jax.lax.top_k(probs, k)                # [T, k]
    gate_v = gate_v / jnp.sum(gate_v, axis=-1, keepdims=True)

    if impl == "ragged":
        if capacity_factor is not None:
            raise ValueError("impl='ragged' is dropless-only "
                             "(capacity_factor must be None)")
        out = _moe_ragged(params, x2, gate_v, gate_i, act=act)
        frac = jnp.sum(jax.nn.one_hot(gate_i[:, 0], e,
                                      dtype=jnp.float32), axis=0) / t
        aux = jnp.asarray(e, jnp.float32) * jnp.sum(
            frac * jnp.mean(probs, axis=0))
        return out.reshape(orig_shape), aux

    onehot = jax.nn.one_hot(gate_i, e, dtype=jnp.float32)   # [T, k, E]
    # slot index of each (token, choice) inside its expert's buffer:
    # cumulative count of prior assignments to the same expert, counted
    # CHOICE-MAJOR (GShard): all top-1 routes claim capacity before any
    # top-2 route, so congestion drops secondary choices first
    oh_cm = onehot.transpose(1, 0, 2)                       # [k, T, E]
    pos_cm = jnp.cumsum(oh_cm.reshape(k * t, e), axis=0
                        ).reshape(k, t, e) - oh_cm
    pos = jnp.sum(pos_cm.transpose(1, 0, 2) * onehot, axis=-1)  # [T, k]
    keep = (pos < cap).astype(jnp.float32)
    slot = jax.nn.one_hot(pos.astype(jnp.int32), cap,
                          dtype=jnp.float32)                # [T, k, C]

    dispatch = jnp.einsum("tke,tkc->tec", onehot * keep[..., None], slot)
    combine = jnp.einsum("tk,tke,tkc->tec", gate_v * keep, onehot, slot)

    def edot(a, name):
        """Per-expert matmul ``a [E,C,in] @ w [E,in,out]`` with optional
        int8 bank (``quant.quantize_params`` siblings): widen inside the
        einsum then scale-on-output per expert per channel — the same
        fused-dequant form as ``ops.quant_matmul``."""
        if name + "_q" in params:
            y = jnp.einsum("ecx,exy->ecy", a,
                           params[name + "_q"].astype(a.dtype))
            return y * params[name + "_scale"][:, None, :].astype(a.dtype)
        return jnp.einsum("ecx,exy->ecy", a, params[name].astype(a.dtype))

    xin = jnp.einsum("tec,td->ecd", dispatch.astype(x2.dtype), x2)
    up = edot(xin, "w_in")
    gated = "w_gate" in params or "w_gate_q" in params
    if gated:                                               # SwiGLU experts
        h = cnn.ACT[act](edot(xin, "w_gate")) * up
    else:
        h = cnn.ACT[act](up + params["b_in"][:, None, :].astype(x2.dtype))
    h = edot(h, "w_out")
    if "b_out" in params:
        h = h + params["b_out"][:, None, :].astype(x2.dtype)
    out = jnp.einsum("tec,ecd->td", combine.astype(x2.dtype), h)

    # Switch load-balancing loss: E * sum_e(frac_tokens_e * mean_prob_e)
    frac = jnp.sum(onehot[:, 0, :], axis=0) / t             # top-1 load [E]
    aux = jnp.asarray(e, jnp.float32) * jnp.sum(
        frac * jnp.mean(probs, axis=0))

    return out.reshape(orig_shape), aux


def _moe_ragged(params, x2, gate_v, gate_i, *, act: str) -> jnp.ndarray:
    """Sorted grouped-matmul dispatch (dropless).

    Rows = the T·k (token, choice) pairs, stable-sorted by expert id so
    each expert's rows are contiguous; ``lax.ragged_dot`` then runs the
    per-expert matmuls as one ragged MXU sweep with ``group_sizes`` from a
    bincount. Combine = scatter-add of gate-weighted rows back to their
    source tokens. Int8 expert banks (``w_*_q``/``w_*_scale``) dequantize
    by a per-row scale gather on the output (same fused-dequant form as
    ``ops.quant_matmul``)."""
    t, d = x2.shape
    e = params.get("w_in", params.get("w_in_q")).shape[0]
    k = gate_i.shape[1]
    flat_e = gate_i.reshape(-1).astype(jnp.int32)           # [T*k]
    order = jnp.argsort(flat_e, stable=True)                # sorted rows
    sorted_e = flat_e[order]
    tok = order // k                                        # source token
    xs = x2[tok]                                            # [T*k, D]
    gs = jnp.bincount(flat_e, length=e).astype(jnp.int32)   # group sizes

    def rdot(a, name):
        if name + "_q" in params:
            y = jax.lax.ragged_dot(a, params[name + "_q"].astype(a.dtype),
                                   gs)
            return y * params[name + "_scale"][sorted_e].astype(a.dtype)
        return jax.lax.ragged_dot(a, params[name].astype(a.dtype), gs)

    up = rdot(xs, "w_in")
    if "w_gate" in params or "w_gate_q" in params:          # SwiGLU experts
        h = cnn.ACT[act](rdot(xs, "w_gate")) * up
    else:
        h = cnn.ACT[act](up + params["b_in"][sorted_e].astype(xs.dtype))
    y = rdot(h, "w_out")
    if "b_out" in params:
        y = y + params["b_out"][sorted_e].astype(xs.dtype)
    w = gate_v.reshape(-1)[order][:, None].astype(y.dtype)
    return jnp.zeros_like(x2).at[tok].add(y * w)


def expert_pspec(params):
    """PartitionSpecs sharding the expert dim over the ``ep`` mesh axis
    (router replicated)."""
    return {k: ({"kernel": P()} if k == "router" else P("ep"))
            for k in params}


def shard_experts(params, mesh: Mesh):
    """Place MoE params expert-parallel on ``mesh`` (axis ``ep``)."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, expert_pspec(params))
