"""Device mesh + sharding rules (SURVEY.md §2.4/§2.5).

Replaces the reference's NCCL/Accelerate DDP with ``jax.sharding``: one
mesh with a ``data`` axis (batch sharding == DDP) and a ``model`` axis
(Megatron-style tensor parallelism over attention heads / FFN intermediate).
Params get ``NamedSharding`` annotations; under ``jit`` XLA GSPMD inserts
the all-reduces/all-gathers over ICI — the gradient psum the reference got
implicitly from ``accelerator.backward`` falls out of the same machinery.

Caveat: Pallas kernels are opaque to GSPMD — under a model-parallel mesh
XLA will insert gathers around ``pallas_call`` rather than partitioning it.
The sdpa auto-dispatch therefore pairs best with pure data parallelism;
for tensor-parallel training either run the XLA attention path
(``set_sdpa_impl("xla")``, fully partitionable) or wrap the attention in
``jax.shard_map`` so each shard calls the kernel on its local heads.
(On CPU meshes no override is needed: auto-dispatch resolves per lowering
platform via ``lax.platform_dependent``, so a computation placed on CPU
takes the XLA path even when the process default backend is TPU.)

Rules (path-pattern -> PartitionSpec) follow the classic two-way split:
- qkv / FFN-in kernels: column-parallel (shard the output dim)
- attention-out / FFN-out kernels: row-parallel (shard the input dim)
- embeddings & lm-head vocab projections: shard the vocab dim
- norms, biases of row-parallel layers: replicated
"""

import re
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(shape: Optional[Tuple[int, int]] = None,
                axis_names: Tuple[str, str] = ("data", "model"),
                devices=None, backend: Optional[str] = None) -> Mesh:
    """Build a 2-D mesh. Default: all devices on ``data`` (pure DP).

    ``backend="cpu"`` builds the mesh from the (virtual) CPU devices even
    when TPU is the default — used for multi-chip dry runs on one host
    (``--xla_force_host_platform_device_count``)."""
    if devices is None:
        devices = jax.devices(backend) if backend else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    assert shape[0] * shape[1] == n, f"mesh {shape} != {n} devices"
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def create_hybrid_mesh(ici_shape: Tuple[int, ...],
                       dcn_shape: Optional[Tuple[int, ...]] = None,
                       axis_names: Tuple[str, ...] = ("data", "model"),
                       devices=None) -> Mesh:
    """Multi-slice mesh: ICI for intra-slice traffic, DCN between slices
    (SURVEY.md §2.5's TPU-native plan).

    ``ici_shape`` is the per-slice layout and ``dcn_shape`` the
    slice-count factor per axis (default: all slices stacked on the FIRST
    axis — data parallelism over DCN, the standard multi-slice recipe:
    model/tensor axes stay inside a slice where ICI bandwidth is, and the
    per-axis mesh size is the elementwise product ``dcn * ici``). GSPMD
    then emits hierarchical collectives — per-slice reduce over ICI, then
    the small cross-slice hop over DCN — from the same ``P("data", ...)``
    annotations used everywhere else; no model-code changes.

    On a single process/slice (this rig) ``dcn_shape`` defaults to all
    ones and the helper degrades to :func:`create_mesh`; under multi-
    process ``jax.distributed`` it uses
    ``mesh_utils.create_hybrid_device_mesh`` so device order respects
    slice locality.
    """
    if devices is None:
        devices = jax.devices()
    if dcn_shape is None:
        nproc = getattr(jax, "process_count", lambda: 1)()
        dcn_shape = (nproc,) + (1,) * (len(ici_shape) - 1)
    assert len(dcn_shape) == len(ici_shape) == len(axis_names)
    if int(np.prod(dcn_shape)) == 1:
        # single slice: the hybrid helper requires > 1 granule; a plain
        # reshape gives the identical mesh
        shape = tuple(ici_shape)
        assert int(np.prod(shape)) == len(devices), \
            f"mesh {shape} != {len(devices)} devices"
        return Mesh(np.asarray(devices).reshape(shape), axis_names)
    from jax.experimental import mesh_utils
    arr = mesh_utils.create_hybrid_device_mesh(
        tuple(ici_shape), tuple(dcn_shape), devices=devices)
    return Mesh(arr, axis_names)


# (regex over "/".join(path), PartitionSpec-maker taking ndim)
# Kernels may carry a leading stacked-layer axis: specs are right-aligned.
_RULES = [
    # classic (post-LN) stack
    (r"(query|key|value|qkv)/kernel$",       lambda: P(None, "model")),
    (r"(query|key|value|qkv)/bias$",         lambda: P("model")),
    (r"out/dense/kernel$",                   lambda: P("model", None)),
    (r"ffn/intermediate/kernel$",            lambda: P(None, "model")),
    (r"ffn/intermediate/bias$",              lambda: P("model")),
    (r"ffn/out/kernel$",                     lambda: P("model", None)),
    # vocab-sharded like the modern stack's embed_tokens (the table is
    # [vocab, hidden]; sharding hidden would all-gather on every lookup)
    (r"word_embeddings/weight$",             lambda: P("model", None)),
    (r"lm_head/decoder/kernel$",             lambda: P(None, "model")),
    (r"lm_head/decoder/bias$",               lambda: P("model")),
    # modern (pre-LN RMSNorm/SwiGLU) stack: qkv/FFN-in column-parallel,
    # o_proj/FFN-out row-parallel, embeddings + tied/untied lm_head
    # vocab-sharded
    (r"(q_proj|k_proj|v_proj)/kernel$",      lambda: P(None, "model")),
    (r"(q_proj|k_proj|v_proj)/bias$",        lambda: P("model")),
    (r"o_proj/kernel$",                      lambda: P("model", None)),
    (r"(gate_proj|up_proj)/kernel$",         lambda: P(None, "model")),
    (r"down_proj/kernel$",                   lambda: P("model", None)),
    (r"embed_tokens/weight$",                lambda: P("model", None)),
    (r"lm_head/kernel$",                     lambda: P(None, "model")),
    # MoE expert stacks: expert dim over the ``ep`` axis, router replicated
    # (int8 banks resolve through the same rules via the ``_q`` strip;
    # their per-expert-per-channel scales shard with the expert dim)
    (r"mlp/(w_gate|w_in|w_out)$",            lambda: P("ep", None, None)),
    (r"mlp/(w_gate|w_in|w_out)_scale$",      lambda: P("ep", None)),
    (r"mlp/(b_in|b_out)$",                   lambda: P("ep", None)),
]


def _prune_axes(spec: P, mesh: Mesh) -> P:
    """Drop axis names the mesh doesn't have (e.g. ``ep`` rules under a
    (data, model) mesh) so one rule table serves every mesh shape."""
    return P(*(a if a in mesh.shape else None for a in tuple(spec)))


def _right_align(spec: P, ndim: int) -> P:
    """Pad a trailing-dims spec with leading Nones for stacked-layer axes."""
    parts = tuple(spec)
    if len(parts) < ndim:
        parts = (None,) * (ndim - len(parts)) + parts
    return P(*parts)


def param_pspec(params):
    """PartitionSpec pytree for a model's params (model-parallel rules).

    Quantized trees (``quant.quantize_params``) shard like their fp
    originals: ``kernel_q``/``kernel_q4``/``weight_q`` take the
    ``kernel``/``weight`` rule (int4's packed K/2 rows split exactly like
    K rows), and each ``scale`` takes the axes of the dims it scales —
    int8 per-output-channel scales get the kernel's last-dim axis (so
    column-parallel scales split with their columns and row-parallel
    scales replicate; embedding scales the vocab row dim), int4 group
    scales ``[G, N]`` get the kernel's (K, N) axes (row-parallel splits
    the group dim with the rows it scales)."""
    def _kernel_rule(path):
        sib = "/".join(path + ("kernel",))
        for pat, mk in _RULES:
            if re.search(pat, sib):
                return tuple(mk())
        return None

    def walk(tree, path=()):
        if isinstance(tree, dict):
            out = {}
            for k, v in tree.items():
                if k == "scale" and "kernel_q4" in tree:
                    rule = _kernel_rule(path)
                    out[k] = (_right_align(P(rule[-2], rule[-1]), v.ndim)
                              if rule else P())
                else:
                    out[k] = walk(v, path + (k,))
            return out
        name = "/".join(path)
        if name.endswith("_q4"):
            name = name[:-3]
        elif name.endswith("_q"):
            name = name[:-2]
        for pat, mk in _RULES:
            if re.search(pat, name):
                return _right_align(mk(), tree.ndim)
        if path and path[-1] == "scale":
            for sibling, dim in (("kernel", -1), ("weight", 0)):
                sib = "/".join(path[:-1] + (sibling,))
                for pat, mk in _RULES:
                    if re.search(pat, sib):
                        return _right_align(P(tuple(mk())[dim]), tree.ndim)
        return P()  # replicated
    return walk(params)


def shard_params(params, mesh: Mesh):
    """Place params on the mesh according to the partition rules (rules
    naming axes the mesh lacks degrade to replicated on those dims)."""
    specs = param_pspec(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(
            x, NamedSharding(mesh, _prune_axes(s, mesh))), params, specs)


def fsdp_pspec(params, mesh: Mesh, *, axis: str = "data",
               min_weight_size: int = 2 ** 16):
    """ZeRO-3-style fully-sharded specs: on top of the tensor-parallel
    rules, shard each large weight's largest still-unsharded dim over the
    data axis. Under ``jit`` GSPMD inserts the all-gather at use and the
    matching reduce-scatter on gradients — per-device param/optimizer
    memory drops ~n_data-fold with no model-code changes. Small tensors
    (below ``min_weight_size`` elements: norms, biases) stay replicated,
    the usual FSDP wrapping granularity trade-off."""
    n = mesh.shape[axis]
    base = jax.tree_util.tree_map(
        lambda s: _prune_axes(s, mesh), param_pspec(params),
        is_leaf=lambda s: isinstance(s, P))

    def walk(x, spec):
        parts = list(tuple(spec))
        parts += [None] * (x.ndim - len(parts))
        if x.size < min_weight_size:
            return P(*parts)
        cand = [i for i in range(x.ndim)
                if parts[i] is None and x.shape[i] % n == 0]
        if not cand:
            return P(*parts)
        parts[max(cand, key=lambda i: x.shape[i])] = axis
        return P(*parts)

    return jax.tree_util.tree_map(walk, params, base)


def shard_params_fsdp(params, mesh: Mesh, *, axis: str = "data",
                      min_weight_size: int = 2 ** 16):
    """Place params fully-sharded (see ``fsdp_pspec``)."""
    specs = fsdp_pspec(params, mesh, axis=axis,
                       min_weight_size=min_weight_size)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def data_sharding(mesh: Mesh, *, axis: str = "data"):
    """Sharding for a [B, ...] batch: shard the leading batch dim."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
