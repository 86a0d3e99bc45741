"""Device-side paged-KV model execution for the serving engine.

Adapts a modern-layer CLM (``models.qwen.ModelForCausalLM`` params layout)
to paged KV: prefill writes the prompt's K/V into pool blocks and attends
over cached-prefix + suffix; decode is a batched single-token step with
``ops.paged_attention.paged_attention_decode``.

Static shapes throughout: prefill is bucketed by (padded) suffix length,
decode runs a fixed max batch with invalid lanes masked — batch composition
changes never trigger recompiles (SURVEY.md §7 hard part #2).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import nn as cnn
from ..layers.modern import swiglu_apply
from ..layers.positional import rotate_half
from ..ops.paged_attention import (gather_kv, paged_attention_decode,
                                   write_kv, NEG_INF)
from ..ops import paged_decode_pallas


def _mlp(lp_mlp, x, config, act: str):
    """Dense SwiGLU or (for MoE configs) dropless top-k expert routing —
    serving never drops tokens, so paged decode matches the dense
    static-cache decode token-for-token (same rule as
    ``layers.modern.modern_layer_apply`` at inference)."""
    if "router" in lp_mlp:
        from ..layers.moe import moe_apply
        out, _ = moe_apply(lp_mlp, x,
                           top_k=getattr(config, "num_experts_per_tok", 2),
                           capacity_factor=None, act=act,
                           impl=getattr(config, "moe_impl", "einsum"))
        return out
    return swiglu_apply(lp_mlp, x, act=act)


def init_pool(config, num_blocks: int, block_size: int, dtype=jnp.bfloat16):
    """Combined K/V pool: [L, NB, 2, BS, H_kv * D] (k row 0, v row 1).

    ``dtype=jnp.int8`` stores the pool quantized (2x the block capacity at
    equal HBM): rows are quantized symmetrically at write time with one f32
    scale per (layer, block, k/v, slot) kept in the small ``scale`` sidecar
    and dequantized inside the decode kernel's block sweep — fp32 scores/
    accumulation throughout, so greedy decode stays argmax-stable.

    ``dtype="int4"`` packs two KV values per byte (4x block capacity at
    equal HBM, quarter the decode DMA bytes) with per-(row, kv-head)
    scales — finer than int8's per-row scale; see
    ``ops.paged_attention.quantize_rows_int4``. Unlike the int8 pool
    (greedy-token-exact in practice), int4 is a LOSSY cache: 4-bit keys
    cost ~sqrt(D)/2 quantization steps of score precision, so outputs can
    deviate where score margins are thin (calibrated worst-case bounds in
    ``tests/test_int4_pool.py``). Kernel-vs-XLA parity stays exact —
    both paths read the same quantized values."""
    width = config.num_key_value_heads * config.head_dim
    if isinstance(dtype, str) and dtype == "int4":
        shape = (config.num_hidden_layers, num_blocks, 2, block_size,
                 width // 2)
        return {"kv": jnp.zeros(shape, dtype=jnp.int8),
                "scale": jnp.ones(
                    shape[:3] + (config.num_key_value_heads, block_size),
                    dtype=jnp.float32)}
    shape = (config.num_hidden_layers, num_blocks, 2, block_size, width)
    pool = {"kv": jnp.zeros(shape, dtype=dtype)}
    if dtype == jnp.int8:
        pool["scale"] = jnp.ones(shape[:4], dtype=jnp.float32)
    return pool


def pool_pspec():
    """Tensor-parallel pool sharding: split the flattened H_kv*D minor dim
    over the ``model`` axis (each shard holds its own kv heads' pool)."""
    return P(None, None, None, None, "model")


def shard_serving_state(params, pool, mesh: Mesh):
    """Place model params (Megatron column/row rules from
    ``parallel.mesh``) and the paged KV pool tensor-parallel on ``mesh``.

    Requires ``num_key_value_heads`` divisible by the ``model`` axis size.
    Returns (params, pool) with committed shardings — the jitted
    prefill/decode steps then run SPMD over the mesh, GSPMD inserting the
    per-layer o_proj/down_proj all-reduces (activation-sized, riding ICI);
    the pool, weights, and KV writes all stay fully sharded.
    """
    from ..parallel.mesh import shard_params
    params = shard_params(params, mesh)
    sharded = {"kv": jax.device_put(
        pool["kv"], NamedSharding(mesh, pool_pspec()))}
    if "scale" in pool:
        if pool["scale"].ndim == 5:   # int4: per-head scales shard with
            sharded["scale"] = jax.device_put(   # their heads
                pool["scale"],
                NamedSharding(mesh, P(None, None, None, "model", None)))
        else:                         # int8 sidecar: tiny, replicated
            sharded["scale"] = jax.device_put(
                pool["scale"], NamedSharding(mesh, P()))
    return params, sharded


def _head(params, h):
    """lm_head (or tied-embedding head) over hidden states."""
    if "lm_head" in params:
        return cnn.linear(params["lm_head"], h)
    return cnn.tied_lm_head(params["embed_tokens"], h)


def _tp_size(mesh) -> int:
    return mesh.shape.get("model", 1) if mesh is not None else 1


def _mesh_is_tpu(mesh) -> bool:
    """Kernel lowering keys off the MESH devices' platform, not the process
    default backend (tests run CPU meshes under a TPU default backend; the
    interpret toggles make the kernels runnable there too)."""
    return mesh.devices.flat[0].platform == "tpu"


def _tp_paged_attn(mesh, q, pkv, block_tables, seq_lens, h_kv, scales,
                   window, sinks):
    """Paged-decode Pallas kernel under a tensor-parallel mesh.

    Every device runs the DMA sweep on its OWN shard — q split on heads
    (P(None, "model", None)), the pool on the flattened kv width
    (``pool_pspec``) — exactly the shards GSPMD already placed, so TP
    serving decodes at kernel speed instead of falling back to the XLA
    gather path (the kernel alone is opaque to GSPMD; shard_map makes the
    placement explicit). Head chunk j owns kv heads [j*h_kv/tp,
    (j+1)*h_kv/tp) = pool width columns [j*width/tp, ...): the contiguous
    head split lines up with the contiguous width split by construction.
    check_vma=False — pallas outputs carry no varying-mesh-axes type.
    Block tables / lengths / int8 scales are replicated."""
    tp = mesh.shape["model"]

    def local(qL, pkvL, bt, sl, scL):
        return paged_decode_pallas.paged_attention_decode_pallas(
            qL, pkvL, bt, sl, h_kv // tp, scL, window=window, sinks=sinks)

    qs = P(None, "model", None)
    ps = P(None, None, None, "model")
    if scales is None:
        return jax.shard_map(
            lambda qL, pkvL, bt, sl: local(qL, pkvL, bt, sl, None),
            mesh=mesh, in_specs=(qs, ps, P(None, None), P(None)),
            out_specs=qs, check_vma=False)(q, pkv, block_tables, seq_lens)
    # int8 scales [NB, 2, BS] are replicated; int4's [NB, 2, H_kv, BS]
    # shard with their heads (packed width splits on head boundaries by
    # the per-head-local packing — ops.paged_attention.pack_int4_rows)
    sc_spec = (P(None, None, "model", None) if scales.ndim == 4
               else P(None, None, None))
    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(qs, ps, P(None, None), P(None), sc_spec),
        out_specs=qs, check_vma=False)(q, pkv, block_tables, seq_lens,
                                       scales)


def _tp_flash_prefill(mesh, qh, kk, vv, bias):
    """Flash-attention prefill under a tensor-parallel mesh: the kernel
    runs per device on its local q/kv heads (contiguous GQA groups — the
    q-head split lines up with the kv-head split because
    num_key_value_heads divides the model axis); the additive
    causal-with-offset bias is replicated."""
    from ..ops import flash_attention as fa
    hs = P(None, "model", None, None)
    return jax.shard_map(
        lambda qq, kkh, vvh, bb: fa.flash_attention_bias(qq, kkh, vvh, bb),
        mesh=mesh, in_specs=(hs, hs, hs, P(None, None, None, None)),
        out_specs=hs, check_vma=False)(qh, kk, vv, bias)


def _multi_core(model, plus_one: bool, params, pool, ids, positions,
                slot_blocks, slot_offsets, block_tables, ctx_len,
                allow_pallas: bool = True, mesh=None, embeds=None,
                embed_len=None, bidir_len=None, rope_offset: int = 0):
    """Multi-token paged step (traced core shared by ``prefill`` and
    speculative verification): writes each token's K/V at its slot and
    attends causally-with-offset over the gathered paged context.

    ids/positions/slot_blocks/slot_offsets: [N, T] (slot -1 = padding or
    dead lane, write dropped); block_tables: [N, MAXB]; ctx_len: [N] total
    valid context (0 = dead lane). Returns (final-normed hidden [N, T, Dm],
    pool) — callers apply the lm head themselves (prefill only needs the
    last position's logits; verification needs every position's).

    Attention: long prefill chunks (suffix and context >= the flash
    threshold) run the Pallas flash kernel with the causal-with-offset
    mask streamed in as bias — no [N, H, Tp, Tctx] fp32 score
    materialization, GQA via index maps (the ``flash_attn_varlen_func``
    role the reference's serving notebook fills with the CUDA wheel,
    ``simple_vllm.ipynb`` cell 2). Short chunks keep the einsum path.
    Under a tensor-parallel ``mesh`` the kernel runs per shard via
    shard_map on each device's local heads (``_tp_flash_prefill``).
    Measured end-to-end prefill (4L x 1024h GQA4 bf16, v5e): 1.32x at
    T=2048, 1.64x at T=4096 vs the einsum path.

    MULTIMODAL / prefix-LM operands (all optional; the reference's
    PaliGemma regime — ``paligemma.ipynb`` cell 17 — run through the
    serving engine):
    - ``embeds [N, T, Dm]`` + ``embed_len [N]``: positions < embed_len use
      the provided hidden values (projected image features) instead of the
      token embedding — the ``masked_scatter`` fusion, post input scaling.
    - ``bidir_len [N]``: context positions < bidir_len are attendable by
      EVERY query of the lane (bidirectional image+prompt prefix, causal
      suffix). The caller must guarantee the whole bidirectional region's
      KV is cached or written by THIS chunk (the engine enforces
      prompt_len <= the largest prefill bucket for such requests).
    - ``rope_offset``: static position offset for the RoPE tables only
      (PaliGemma's 1-indexed positions); mask positions are unaffected.
    """
    cfg = model.config
    emb_freq = model.emb_freq
    n, t_pad = ids.shape
    nh, nkv_h, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                     cfg.head_dim)
    hidden = cnn.embedding(params["embed_tokens"], ids)       # [N, Tp, Dm]
    if plus_one:  # gemma input scaling
        hidden = hidden * jnp.asarray(cfg.hidden_size ** 0.5, hidden.dtype)
    if embeds is not None:
        use = (positions < embed_len[:, None])[..., None]     # [N, Tp, 1]
        hidden = jnp.where(use, embeds.astype(hidden.dtype), hidden)

    nb, bs = pool["kv"].shape[1], pool["kv"].shape[3]
    maxb = block_tables.shape[1]
    tables = jnp.where(block_tables < 0, 0, block_tables)
    flat_blocks = slot_blocks.reshape(-1)
    flat_offsets = slot_offsets.reshape(-1)

    # causal-with-offset mask over the gathered context [N, Tp, MAXB*BS]
    t_ctx = maxb * bs
    k_pos = jnp.arange(t_ctx)[None, None, :]
    q_abs = positions[:, :, None]
    causal_ok = k_pos <= q_abs
    if bidir_len is not None:   # prefix-LM: bidirectional over the prefix
        causal_ok = causal_ok | (k_pos < bidir_len[:, None, None])
    ok = causal_ok & (k_pos < ctx_len[:, None, None])
    window = getattr(cfg, "sliding_window", None)
    if window is not None:   # Mistral band (+ StreamingLLM sinks)
        band = k_pos > q_abs - window
        sinks = getattr(cfg, "attention_sinks", 0)
        if sinks:
            band = band | (k_pos < sinks)
        ok = ok & band
    attn_mask = jnp.where(ok, 0.0, NEG_INF)

    # per-token RoPE tables [N, Tp, D]
    freqs = jnp.take(emb_freq[0], positions.reshape(-1) + rope_offset,
                     axis=0)
    emb = jnp.concatenate([freqs, freqs], axis=-1).reshape(n, t_pad, 1, -1)
    rs = getattr(model, "rope_scale", 1.0)   # YaRN attention mscale
    cos = jnp.cos(emb) * rs
    sin = jnp.sin(emb) * rs

    quant = pool["kv"].dtype == jnp.int8

    # pool as a flattened-layer loop CARRY (see _decode_core): scanning it
    # as xs/ys rewrote the whole pool once per prefill call
    nl = cfg.num_hidden_layers
    nb_pool = pool["kv"].shape[1]
    kv_shape = pool["kv"].shape
    kvf0 = pool["kv"].reshape((nl * nb_pool,) + kv_shape[2:])
    scf0 = None
    if quant:
        sc_shape = pool["scale"].shape
        scf0 = pool["scale"].reshape((nl * nb_pool,) + sc_shape[2:])

    def body(carry, xs):
        h, kvf, psc = carry
        lp, layer = xs
        off = layer * nb_pool
        normed = cnn.rms_norm(lp["input_layernorm"], h, eps=cfg.rms_norm_eps,
                              plus_one=plus_one)
        q = cnn.linear(lp["self_attn"]["q_proj"], normed).reshape(
            n, t_pad, nh, hd)
        k = cnn.linear(lp["self_attn"]["k_proj"], normed).reshape(
            n, t_pad, nkv_h, hd)
        v = cnn.linear(lp["self_attn"]["v_proj"], normed).reshape(
            n, t_pad, nkv_h, hd)
        if "q_norm" in lp["self_attn"]:
            q = cnn.rms_norm(lp["self_attn"]["q_norm"], q,
                             eps=cfg.rms_norm_eps)
            k = cnn.rms_norm(lp["self_attn"]["k_norm"], k,
                             eps=cfg.rms_norm_eps)
        c = cos.astype(q.dtype)
        si = sin.astype(q.dtype)
        q = q * c + rotate_half(q) * si                      # [N, Tp, H, D]
        k = k * c + rotate_half(k) * si
        fbl = jnp.where(flat_blocks >= 0, flat_blocks + off, -1)
        written = write_kv(kvf, k.reshape(n * t_pad, nkv_h, hd),
                           v.reshape(n * t_pad, nkv_h, hd),
                           fbl, flat_offsets, scales=psc)
        kvf, psc = written if quant else (written, None)
        kk, vv = jax.vmap(lambda t: gather_kv(kvf, t, nkv_h, psc))(
            tables + off)
        qh = q.transpose(0, 2, 1, 3)                         # [N, H, Tp, D]
        bias = attn_mask[:, None]                            # [N,1,Tp,Tctx]

        def _einsum_attn(qq, kkh, vvh, bb):
            group = nh // nkv_h
            kkr = jnp.repeat(kkh, group, axis=1)             # [N,H,Tctx,D]
            vvr = jnp.repeat(vvh, group, axis=1)
            scale = 1.0 / (hd ** 0.5)
            scores = jnp.einsum("nhtd,nhsd->nhts", qq.astype(jnp.float32),
                                kkr.astype(jnp.float32)) * scale
            scores = scores + bb
            probs = jax.nn.softmax(scores, axis=-1)
            return jnp.einsum("nhts,nhsd->nhtd", probs,
                              vvr.astype(jnp.float32)).astype(qq.dtype)

        from ..ops import flash_attention as fa
        tp = _tp_size(mesh)
        if tp > 1:
            flash_ok = (allow_pallas
                        and (_mesh_is_tpu(mesh) or fa._INTERPRET)
                        and fa.supported_shapes(
                            jax.ShapeDtypeStruct(
                                (n, nh // tp, t_pad, hd), qh.dtype),
                            jax.ShapeDtypeStruct(
                                (n, nkv_h // tp, kk.shape[2], hd), kk.dtype),
                            bias))
            if flash_ok:
                attn = _tp_flash_prefill(mesh, qh, kk, vv, bias)
            else:
                attn = _einsum_attn(qh, kk, vv, bias)
        elif allow_pallas and fa.supported_shapes(qh, kk, bias):
            def _flash_attn(qq, kkh, vvh, bb):
                return fa.flash_attention_bias(qq, kkh, vvh, bb)

            attn = jax.lax.platform_dependent(
                qh, kk, vv, bias, tpu=_flash_attn, default=_einsum_attn)
        else:
            attn = _einsum_attn(qh, kk, vv, bias)
        attn = attn.astype(h.dtype).transpose(0, 2, 1, 3).reshape(
            n, t_pad, -1)
        h = h + cnn.linear(lp["self_attn"]["o_proj"], attn)
        normed = cnn.rms_norm(lp["post_attention_layernorm"], h,
                              eps=cfg.rms_norm_eps, plus_one=plus_one)
        h = h + _mlp(lp["mlp"], normed, cfg,
                     act="gelu_pytorch_tanh" if plus_one else "silu")
        return (h, kvf, psc), None

    (hidden, kvf, scf), _ = jax.lax.scan(
        body, (hidden, kvf0, scf0), (params["layers"], jnp.arange(nl)))
    pool = {"kv": kvf.reshape(kv_shape)}
    if quant:
        pool["scale"] = scf.reshape(sc_shape)
    hidden = cnn.rms_norm(params["norm"], hidden, eps=cfg.rms_norm_eps,
                          plus_one=plus_one)
    return hidden, pool


@partial(jax.jit, static_argnums=(0, 1), donate_argnums=(3,),
         static_argnames=("allow_pallas", "mesh", "rope_offset"))
def prefill(model, plus_one: bool, params, pool, ids, positions,
            slot_blocks, slot_offsets, block_tables, ctx_len, true_len,
            lora_lanes=None, allow_pallas: bool = True, mesh=None,
            embeds=None, embed_len=None, bidir_len=None,
            rope_offset: int = 0):
    """Batched prefill of uncached prompt suffixes (one device call for a
    whole group of admissions — the engine packs same-bucket sequences).

    ids/positions/slot_blocks/slot_offsets: [N, T_pad] (slot -1 = padding or
    dead lane); block_tables: [N, MAXB]; ctx_len/true_len: [N] (total
    context after prefill / number of real suffix tokens; 0 = dead lane).
    ``lora_lanes`` [N]: per-lane adapter ids for multi-LoRA params
    (``layers.adapters.embed_multi_lora``; -1 = base model).
    Returns (last-token logits [N, V], pool).
    """
    with cnn.lora_lanes(lora_lanes):
        hidden, pool = _multi_core(model, plus_one, params, pool, ids,
                                   positions, slot_blocks, slot_offsets,
                                   block_tables, ctx_len,
                                   allow_pallas=allow_pallas, mesh=mesh,
                                   embeds=embeds, embed_len=embed_len,
                                   bidir_len=bidir_len,
                                   rope_offset=rope_offset)
        last = jnp.take_along_axis(
            hidden,
            jnp.maximum(true_len - 1, 0)[:, None, None].astype(jnp.int32),
            axis=1)[:, 0]                                    # [N, Dm]
        return _head(params, last), pool


def _decode_core(model, plus_one, params, pool, tokens, positions,
                 block_tables, seq_lens, slot_blocks, slot_offsets,
                 allow_pallas: bool = True, mesh=None,
                 rope_offset: int = 0):
    """One decode step over the paged pool. Returns (logits [B, V], pool).

    ``allow_pallas=False`` forces the XLA attention path. Under a
    tensor-parallel ``mesh`` the Pallas kernel runs per shard via
    shard_map on each device's local heads/pool columns
    (``_tp_paged_attn``) — the kernel alone is opaque to GSPMD (XLA would
    all-gather the pool around it), the explicit placement keeps the pool
    fully sharded; when the local shard shapes don't satisfy the kernel's
    alignment, the XLA gather+einsum path (which partitions cleanly over
    the kv-head/width sharding) is used instead."""
    cfg = model.config
    emb_freq = model.emb_freq
    b = tokens.shape[0]
    hidden = cnn.embedding(params["embed_tokens"], tokens)       # [B, Dm]
    if plus_one:
        hidden = hidden * jnp.asarray(cfg.hidden_size ** 0.5, hidden.dtype)

    window = getattr(cfg, "sliding_window", None)
    tp = _tp_size(mesh)
    if tp > 1:
        nb_, _, bs_, width_ = pool["kv"].shape[1:]
        use_pallas = (allow_pallas
                      and (_mesh_is_tpu(mesh)
                           or paged_decode_pallas._INTERPRET)
                      and paged_decode_pallas.supported(
                          jax.ShapeDtypeStruct(
                              (b, cfg.num_attention_heads // tp,
                               cfg.head_dim), jnp.float32),
                          jax.ShapeDtypeStruct(
                              (nb_, 2, bs_, width_ // tp),
                              pool["kv"].dtype),
                          cfg.num_key_value_heads // tp))
    else:
        use_pallas = allow_pallas and paged_decode_pallas.supported(
            jnp.zeros((b, cfg.num_attention_heads, cfg.head_dim)),
            pool["kv"][0], cfg.num_key_value_heads)
    quant = pool["kv"].dtype == jnp.int8

    # The pool is a LOOP CARRY with layers flattened into the block dim
    # ([L*NB, 2, BS, W]; the reshape is a free leading-dim bitcast), NOT a
    # scan xs/ys pair: stacking per-layer outputs rewrites the ENTIRE pool
    # every step, so decode cost grew with pool SIZE (measured r5: 95 ->
    # 160 ms/tick going from a 100 MB to a 400 MB pool, identical work).
    # In-carry scatters touch only the B written rows; the kernels address
    # blocks through the (layer-offset) tables, so they never slice the
    # pool either.
    nl = cfg.num_hidden_layers
    nb = pool["kv"].shape[1]
    kv_shape = pool["kv"].shape
    kvf = pool["kv"].reshape((nl * nb,) + kv_shape[2:])
    scf = None
    if quant:
        sc_shape = pool["scale"].shape
        scf = pool["scale"].reshape((nl * nb,) + sc_shape[2:])

    def body(carry, xs):
        h, kvf, psc = carry
        lp, layer = xs
        off = layer * nb
        normed = cnn.rms_norm(lp["input_layernorm"], h, eps=cfg.rms_norm_eps,
                              plus_one=plus_one)
        nh, nkv, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                       cfg.head_dim)
        q = cnn.linear(lp["self_attn"]["q_proj"], normed).reshape(b, nh, hd)
        k = cnn.linear(lp["self_attn"]["k_proj"], normed).reshape(b, nkv, hd)
        v = cnn.linear(lp["self_attn"]["v_proj"], normed).reshape(b, nkv, hd)
        if "q_norm" in lp["self_attn"]:
            q = cnn.rms_norm(lp["self_attn"]["q_norm"], q,
                             eps=cfg.rms_norm_eps)
            k = cnn.rms_norm(lp["self_attn"]["k_norm"], k,
                             eps=cfg.rms_norm_eps)
        freqs = jnp.take(emb_freq[0], positions + rope_offset,
                         axis=0)                                 # [B, D/2]
        emb = jnp.concatenate([freqs, freqs], axis=-1)[:, None, :]
        rs = getattr(model, "rope_scale", 1.0)   # YaRN attention mscale
        cos = (jnp.cos(emb) * rs).astype(q.dtype)
        sin = (jnp.sin(emb) * rs).astype(q.dtype)
        q = q * cos + rotate_half(q) * sin
        k = k * cos + rotate_half(k) * sin
        sbl = jnp.where(slot_blocks >= 0, slot_blocks + off, -1)
        written = write_kv(kvf, k, v, sbl, slot_offsets, scales=psc)
        kvf, psc = written if quant else (written, None)
        btl = jnp.where(block_tables >= 0, block_tables + off,
                        block_tables)
        sinks = getattr(cfg, "attention_sinks", 0)

        def _pl_attn():
            return paged_decode_pallas.paged_attention_decode_pallas(
                q, kvf, btl, seq_lens, nkv, psc, window=window,
                sinks=sinks)                                     # [B, H, D]

        def _xla_attn():
            return paged_attention_decode(
                q, kvf, btl, seq_lens, nkv, psc, window=window,
                sinks=sinks)

        if use_pallas and tp > 1:
            attn = _tp_paged_attn(mesh, q, kvf, btl, seq_lens,
                                  nkv, psc, window, sinks)       # [B, H, D]
        elif use_pallas:
            # dispatch on the LOWERING platform, not the process default
            # backend (a CPU-device engine under a TPU default backend must
            # take the XLA path — flash prefill does the same); interpret
            # mode pins the kernel for off-TPU tests
            if paged_decode_pallas._INTERPRET:
                attn = _pl_attn()
            else:
                attn = jax.lax.platform_dependent(tpu=_pl_attn,
                                                  default=_xla_attn)
        else:
            attn = _xla_attn()
        attn = attn.reshape(b, -1)
        h = h + cnn.linear(lp["self_attn"]["o_proj"], attn)
        normed = cnn.rms_norm(lp["post_attention_layernorm"], h,
                              eps=cfg.rms_norm_eps, plus_one=plus_one)
        h = h + _mlp(lp["mlp"], normed, cfg,
                     act="gelu_pytorch_tanh" if plus_one else "silu")
        return (h, kvf, psc), None

    (hidden, kvf, scf), _ = jax.lax.scan(
        body, (hidden, kvf, scf),
        (params["layers"], jnp.arange(nl)))
    pool = {"kv": kvf.reshape(kv_shape)}
    if quant:
        pool["scale"] = scf.reshape(sc_shape)
    hidden = cnn.rms_norm(params["norm"], hidden, eps=cfg.rms_norm_eps,
                          plus_one=plus_one)
    return _head(params, hidden), pool


@partial(jax.jit, static_argnums=(0, 1), donate_argnums=(3,),
         static_argnames=("allow_pallas", "mesh", "rope_offset"))
def decode(model, plus_one: bool, params, pool, tokens, positions,
           block_tables, seq_lens, slot_blocks, slot_offsets,
           allow_pallas: bool = True, lora_lanes=None, mesh=None,
           rope_offset: int = 0):
    """Batched single-token decode.

    tokens: [B] int32; positions: [B] absolute positions; block_tables:
    [B, MAXB]; seq_lens: [B] context lengths incl. the new token;
    slot_blocks/slot_offsets: [B] pool write targets (-1 = dead lane);
    lora_lanes: [B] per-lane adapter ids (multi-LoRA params; -1 = base).
    Returns (logits [B, V], pool).
    """
    with cnn.lora_lanes(lora_lanes):
        return _decode_core(model, plus_one, params, pool, tokens, positions,
                            block_tables, seq_lens, slot_blocks, slot_offsets,
                            allow_pallas=allow_pallas, mesh=mesh,
                            rope_offset=rope_offset)


def sampling_mask(logits, temperature, top_p, min_p=0.0):
    """Temperature + nucleus (top-p) + min-p masked logits ready for
    ``jax.random.categorical``. logits: [B, V]; temperature/top_p/min_p:
    f32 scalars or [B] per-lane vectors (per-request sampling params;
    min_p=0 disables, vLLM order: after temperature).

    Reuses ``generation.sampling`` masks so serving and the decode loops
    share one implementation (same boundary semantics)."""
    from ..generation.sampling import _min_p_mask, _top_p_mask

    temperature = jnp.asarray(temperature, jnp.float32)
    top_p = jnp.asarray(top_p, jnp.float32)
    min_p = jnp.asarray(min_p, jnp.float32)
    if temperature.ndim == 1:
        temperature = temperature[:, None]
    if top_p.ndim == 1:
        top_p = top_p[:, None]
    if min_p.ndim == 1:
        min_p = min_p[:, None]
    logits = logits.astype(jnp.float32) / jnp.maximum(temperature, 1e-6)
    masked = _top_p_mask(logits, top_p)
    return _min_p_mask(masked, min_p)


def sample_tokens(logits, rng, temperature, top_p, min_p=0.0,
                  lane_keys=None, seeded=None):
    """Sample [B] int32 from masked logits (see :func:`sampling_mask`).

    ``lane_keys`` [B, 2] uint32 + ``seeded`` [B] bool enable PER-LANE
    sampling streams (vLLM per-request ``seed``): seeded lanes draw from
    their own key (deterministic regardless of batch composition or the
    engine's rng), the rest share ``rng``."""
    masked = sampling_mask(logits, temperature, top_p, min_p)
    batch = jax.random.categorical(rng, masked, axis=-1).astype(jnp.int32)
    if lane_keys is None:
        return batch
    per = jax.vmap(lambda k, l: jax.random.categorical(k, l))(
        lane_keys, masked).astype(jnp.int32)
    return jnp.where(seeded, per, batch)


@partial(jax.jit, static_argnums=(0, 1, 8, 9), donate_argnums=(3,),
         static_argnames=("allow_pallas", "with_logprobs", "mesh",
                          "rope_offset"))
def decode_horizon(model, plus_one: bool, params, pool, tokens, positions,
                   block_tables, live, horizon: int, do_sample: bool = False,
                   eos=-1, rng=None, temperature=1.0, top_p=1.0, min_p=0.0,
                   budget=None, allow_pallas: bool = True,
                   fsm_next=None, fsm_ids=None, fsm_states=None,
                   lora_lanes=None, with_logprobs: bool = False,
                   token_counts=None, presence_penalty=0.0,
                   frequency_penalty=0.0, rep_penalty=None, seen_mask=None,
                   min_steps=None, bias_idx=None, bias_val=None,
                   lane_seeds=None, gen_base=None, mesh=None,
                   rope_offset: int = 0, dead_mask=None):
    """Run up to ``horizon`` decode steps fully on device — ONE host
    round-trip per ``horizon`` tokens instead of per token. The engine
    pre-allocates blocks to cover ``positions + horizon`` so in-graph slot
    arithmetic (``table[pos // BS], pos % BS``) always lands on live blocks.

    Lanes that emit ``eos`` (pass -1 to disable) go dead: their KV writes
    are dropped, their token/position freeze, and the loop exits early once
    every lane is dead — no wasted steps in EOS-heavy workloads.

    tokens: [B] latest token per lane; positions: [B] its absolute
    position; live: [B] bool lane validity; budget: [B] int32 granted steps
    per lane (lanes freeze once exhausted; None = ``horizon`` for all).
    With ``do_sample`` the next token is temperature+top-p sampled using
    ``rng`` (greedy otherwise); ``temperature``/``top_p`` may be scalars
    or [B] per-lane vectors (per-request sampling params).

    Guided decoding: ``fsm_next`` [F, S, V] int32 stacked FSM transition
    tables (``generation.constrained.TokenFSM``, -1 = disallowed),
    ``fsm_ids`` [B] which FSM constrains each lane (-1 = unconstrained),
    ``fsm_states`` [B] each lane's current FSM state — the mask is one
    gather per step, the state threads through the device loop.

    Penalties (OpenAI semantics, over OUTPUT tokens only):
    ``token_counts`` [B, V] int32 counts of already-generated tokens per
    lane (the engine rebuilds it per tick; updated in-loop as tokens
    emit), ``presence_penalty``/``frequency_penalty`` scalars or [B]
    per-lane — ``logits[t] -= presence * (count[t] > 0)
    + frequency * count[t]``. Logprobs stay raw-model (unpenalized).

    ``rep_penalty`` [B] f32 + ``seen_mask`` [B, V] bool enable the
    CTRL/HF repetition penalty over prompt AND output tokens (vLLM
    convention): seen positive logits divide by the penalty, negative
    multiply; the mask updates in-loop as tokens emit. ``min_steps`` [B]
    int32 bans EOS for that many more steps per lane (vLLM
    ``min_tokens``). ``eos`` may be a scalar or a [B] per-lane vector
    (-1 entries never match — per-request ``ignore_eos``).
    ``bias_idx``/``bias_val`` [B, K] sparse per-lane logit biases
    (OpenAI ``logit_bias``; pad index = vocab_size, dropped), scattered
    to a dense [B, V] once before the loop.

    ``lane_seeds`` [B] int32 (-1 = unseeded) + ``gen_base`` [B] int32
    (tokens already generated per lane at tick start) give seeded lanes
    their own sampling stream (vLLM per-request ``seed``): the draw for a
    lane's n-th generated token always uses ``fold_in(PRNGKey(seed), n)``
    — deterministic across batch compositions, engine seeds, tick
    boundaries, and preemption replays.

    ``with_logprobs``: also return the RAW model log-probability (fp32
    log-softmax of the unmasked, untempered logits) of each chosen token —
    the serving-API ``logprobs`` convention (HF
    ``compute_transition_scores(normalize_logits=True)`` on unprocessed
    scores). Dead-lane entries are 0.

    Returns ``(generated [B, horizon], logprobs [B, horizon] fp32,
    (final_tokens [B] int32, eos_dead [B] bool), pool)`` — the final-carry
    pair lets the engine dispatch the NEXT tick from device-side state
    before fetching this one (pipelined decode: the host+tunnel tax of a
    tick overlaps the next tick's device execution). ``final_tokens`` is
    each lane's last emitted token (the next tick's input); ``eos_dead``
    marks lanes killed by eos (NOT by the budget freeze, which is
    revivable)."""
    b = tokens.shape[0]
    bs = pool["kv"].shape[3]
    if dead_mask is not None:
        # lanes killed by a previous chained tick's eos (engine pipelining)
        # — folded in-graph so the host never runs eager mask ops (each
        # eager dispatch costs ~10 ms through the remote tunnel)
        live = live & jnp.logical_not(dead_mask)
    out_buf = jnp.zeros((b, horizon), dtype=jnp.int32)
    lp_buf = jnp.zeros((b, horizon), dtype=jnp.float32)
    eos = jnp.asarray(eos, dtype=jnp.int32)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    if budget is None:
        budget = jnp.full((b,), horizon, dtype=jnp.int32)
    if fsm_states is None:
        fsm_states = jnp.zeros((b,), jnp.int32)
    if token_counts is None:
        token_counts = jnp.zeros((b, 0), jnp.int32)  # disabled sentinel
    penalize = token_counts.shape[1] > 0
    pp = jnp.asarray(presence_penalty, jnp.float32)
    fp = jnp.asarray(frequency_penalty, jnp.float32)
    if pp.ndim == 1:
        pp = pp[:, None]
    if fp.ndim == 1:
        fp = fp[:, None]
    if seen_mask is None:
        seen_mask = jnp.zeros((b, 0), bool)  # disabled sentinel
    repetition = seen_mask.shape[1] > 0
    rp = (jnp.ones((b, 1), jnp.float32) if rep_penalty is None
          else jnp.asarray(rep_penalty, jnp.float32).reshape(b, 1))
    min_gate = min_steps is not None
    if min_steps is None:
        min_steps = jnp.zeros((b,), jnp.int32)
    rows_b = jnp.arange(b)
    bias = None
    if bias_idx is not None:
        bias = jnp.zeros((b, model.config.vocab_size), jnp.float32).at[
            rows_b[:, None], bias_idx].add(bias_val, mode="drop")
    seed_keys = None
    if lane_seeds is not None:
        seed_keys = jax.vmap(jax.random.PRNGKey)(
            jnp.maximum(lane_seeds, 0))                       # [B, 2]
        if gen_base is None:
            gen_base = jnp.zeros((b,), jnp.int32)

    def cond(carry):
        i, _, _, alive, _, _, _, _, _, _, _, _ = carry
        return (i < horizon) & jnp.any(alive)

    def body(carry):
        i, toks, pos, alive, key, fst, pl_, out, lps, cnt, seen, eosd = carry
        blk_idx = pos // bs
        slot_blocks = jnp.where(
            alive, jnp.take_along_axis(block_tables, blk_idx[:, None],
                                       axis=1)[:, 0], -1)
        slot_offsets = pos % bs
        seq_lens = jnp.where(alive, pos + 1, 0)
        logits, pl_ = _decode_core(model, plus_one, params, pl_, toks, pos,
                                   block_tables, seq_lens, slot_blocks,
                                   slot_offsets, allow_pallas=allow_pallas,
                                   mesh=mesh, rope_offset=rope_offset)
        raw = logits
        if penalize:
            c = cnt.astype(jnp.float32)
            logits = logits.astype(jnp.float32) - pp * (c > 0) - fp * c
        if repetition:
            l32 = logits.astype(jnp.float32)
            pen = jnp.where(l32 > 0, l32 / rp, l32 * rp)
            logits = jnp.where(seen, pen, l32)
        if bias is not None:
            logits = logits.astype(jnp.float32) + bias
        if min_gate:
            # vLLM min_tokens: ban EOS while the lane still owes tokens
            eos_b = eos if eos.ndim == 1 else jnp.broadcast_to(eos, (b,))
            ban = (min_steps > i) & (eos_b >= 0)
            logits = logits.astype(jnp.float32).at[
                rows_b, jnp.maximum(eos_b, 0)].add(
                jnp.where(ban, jnp.float32(-1e30), 0.0))
        if fsm_next is not None:
            con = fsm_ids >= 0
            row = fsm_next[jnp.maximum(fsm_ids, 0),
                           jnp.maximum(fst, 0)]              # [B, V]
            logits = jnp.where(con[:, None] & (row < 0),
                               jnp.float32(-1e30),
                               logits.astype(jnp.float32))
        if do_sample:
            key, sub = jax.random.split(key)
            if seed_keys is not None:
                lk = jax.vmap(jax.random.fold_in)(seed_keys, gen_base + i)
                nxt = sample_tokens(logits, sub, temperature, top_p, min_p,
                                    lane_keys=lk, seeded=lane_seeds >= 0)
            else:
                nxt = sample_tokens(logits, sub, temperature, top_p, min_p)
        else:
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(alive, nxt, toks)                # freeze dead lanes
        if with_logprobs:
            # logit[chosen] - logsumexp: no [B, V] log-softmax materialized
            # (the full-distribution write was the measured cost driver)
            r32 = raw.astype(jnp.float32)
            lse = jax.scipy.special.logsumexp(r32, axis=-1)
            lp = jnp.take_along_axis(r32, nxt[:, None], axis=1)[:, 0] - lse
            lps = lps.at[:, i].set(jnp.where(alive, lp, 0.0))
        if fsm_next is not None:
            step = jnp.take_along_axis(row, nxt[:, None], axis=1)[:, 0]
            fst = jnp.where(con & alive, step, fst)
        if penalize:
            # EOS is terminal, counting it is harmless; dead lanes frozen
            cnt = cnt.at[jnp.arange(b), nxt].add(alive.astype(jnp.int32))
        if repetition:
            seen = seen.at[rows_b, nxt].max(alive)
        out = out.at[:, i].set(jnp.where(alive, nxt, 0))
        # eos-death is tracked SEPARATELY from the budget freeze so the
        # engine can chain ticks device-side (pipelined decode): a
        # budget-frozen lane is revivable next tick, an eos'd one is not
        eosd = eosd | (alive & (nxt == eos))
        alive = alive & (nxt != eos) & (i + 1 < budget)
        pos = jnp.where(alive, pos + 1, pos)
        return (i + 1, nxt, pos, alive, key, fst, pl_, out, lps, cnt, seen,
                eosd)

    # the eos-death carry ACCUMULATES across chained ticks: a lane killed
    # two ticks ago is in dead_mask but can't re-enter this tick's body,
    # so seeding eosd from it keeps the flag visible to the NEXT chain
    eosd0 = (jnp.zeros((b,), bool) if dead_mask is None
             else jnp.asarray(dead_mask, bool))
    with cnn.lora_lanes(lora_lanes):
        (_, toks_f, _, _, _, _, pool, out_buf, lp_buf, _, _,
         eosd_f) = jax.lax.while_loop(
            cond, body, (jnp.int32(0), tokens.astype(jnp.int32), positions,
                         live, rng, fsm_states, pool, out_buf, lp_buf,
                         token_counts, seen_mask, eosd0))
    return out_buf, lp_buf, (toks_f, eosd_f), pool


def _slot_of(block_tables, bs, p, alive):
    """Pool write targets for absolute positions p ([B] or [B, T]);
    dead lanes -> block -1 (dropped by the scatter)."""
    pp = p if p.ndim == 2 else p[:, None]
    blk = jnp.take_along_axis(block_tables, pp // bs, axis=1)
    blk = jnp.where(alive[:, None], blk, -1)
    off = pp % bs
    if p.ndim == 1:
        return blk[:, 0], off[:, 0]
    return blk, off


def _verify_accept(model, plus_one, params, pl, t2, drafted, pos,
                   block_tables, bs, alive, gamma: int, eos,
                   allow_pallas, mesh):
    """Shared verification + greedy acceptance for all three speculative
    flavors (draft-model / ngram / medusa): the target scores
    ``[last, drafted...]`` (gamma+1 positions) in one ``_multi_core`` pass,
    accepts the longest drafted prefix matching its own argmax, and emits
    its correction token — the acceptance rule of reference
    ``speculative_decoding.py:85-245``. EOS truncates the round's emission.

    Returns ``(t_hidden [B,g+1,H], emitted [B,g+1], n accepted [B],
    c committed [B], hit-EOS [B], pool)``.
    """
    b = t2.shape[0]
    gp1 = gamma + 1
    iota = jnp.arange(gp1)[None, :]
    ids_v = jnp.concatenate([t2[:, 1:2], drafted], axis=1)     # [B, g+1]
    pos_v = pos[:, None] + iota
    sbv, sov = _slot_of(block_tables, bs, pos_v, alive)
    ctxv = jnp.where(alive, pos + gp1, 0)
    t_hidden, pl = _multi_core(model, plus_one, params, pl, ids_v, pos_v,
                               sbv, sov, block_tables, ctxv,
                               allow_pallas=allow_pallas, mesh=mesh)
    t_hat = jnp.argmax(_head(params, t_hidden),
                       axis=-1).astype(jnp.int32)              # [B, g+1]
    miss = t_hat[:, :gamma] != drafted
    n = jnp.where(miss.any(axis=1), jnp.argmax(miss, axis=1),
                  gamma).astype(jnp.int32)
    corr = jnp.take_along_axis(t_hat, n[:, None], axis=1)      # [B, 1]
    drafted_pad = jnp.concatenate(
        [drafted, jnp.zeros((b, 1), jnp.int32)], axis=1)
    emitted = jnp.where(iota < n[:, None], drafted_pad, corr)
    c = n + 1
    stop = (emitted == eos) & (iota < c[:, None])
    hit = stop.any(axis=1)
    c = jnp.where(hit, jnp.argmax(stop, axis=1).astype(jnp.int32) + 1, c)
    return t_hidden, emitted, n, c, hit, pl


def _commit_round(emitted, n, c, hit, alive, rem, counts, acc, spec, out,
                  t2, pos, gamma: int, width: int):
    """Shared per-round commit for the speculative horizons: scatter this
    round's tokens at each lane's output offset (OOB index = drop), update
    the accept/speculate stats, and advance the lane state (last-two
    tokens, position, remaining budget, aliveness).

    Returns ``(out, counts, acc, spec, t2, pos, rem, alive)``.
    """
    b, gp1 = emitted.shape
    iota = jnp.arange(gp1)[None, :]
    rows = jnp.arange(b)[:, None]
    idx = jnp.where(alive[:, None] & (iota < c[:, None]),
                    counts[:, None] + iota, width)             # OOB = drop
    out = out.at[rows, idx].set(emitted, mode="drop")
    counts = jnp.where(alive, counts + c, counts)
    acc = acc + jnp.where(alive, n, 0)
    spec = spec + jnp.where(alive, gamma, 0)
    new_last = jnp.take_along_axis(emitted, (c - 1)[:, None], axis=1)[:, 0]
    new_prev = jnp.where(
        c >= 2,
        jnp.take_along_axis(emitted,
                            jnp.maximum(c - 2, 0)[:, None], axis=1)[:, 0],
        t2[:, 1])
    t2 = jnp.where(alive[:, None],
                   jnp.stack([new_prev, new_last], axis=1), t2)
    pos = jnp.where(alive, pos + c, pos)
    rem = jnp.where(alive, rem - c, rem)
    alive = alive & ~hit & (rem >= gp1)
    return out, counts, acc, spec, t2, pos, rem, alive


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 12, 13), donate_argnums=(6, 7),
         static_argnames=("allow_pallas", "mesh"))
def speculative_horizon(model, draft_model, plus_one: bool,
                        draft_plus_one: bool, params, draft_params,
                        pool, draft_pool, tokens2, positions, block_tables,
                        live, gamma: int, rounds: int, eos=-1, budget=None,
                        allow_pallas: bool = True, mesh=None):
    """Speculative continuous-batching decode: up to ``rounds`` rounds of
    (draft ``gamma`` tokens -> one multi-token target verification) fully on
    device — each round costs ONE target weight stream for up to
    ``gamma + 1`` emitted tokens (reference ``speculative_decoding.py:85-245``
    composed with ``simple_vllm.ipynb``'s engine, which has no speculative
    path — this goes beyond the reference).

    The draft model keeps its own paged pool indexed by the SAME block
    tables (positions are allocated once; both pools are written at the
    same slots, so radix prefix blocks stay valid for both). Per round and
    lane (batched):

    - draft catch-up: a 2-token step over the last two committed tokens
      rewrites any draft-pool slot left stale by the previous round's
      target correction (the scheme of
      ``generation.speculative._round_body``);
    - draft proposes greedily: ``gamma - 1`` more single-token steps;
    - the target scores all ``gamma + 1`` positions in one ``_multi_core``
      pass (writing its KV as it goes) and accepts the longest drafted
      prefix matching its own argmax, then emits its correction token.

    Rollback is free: slots past the accepted point hold stale KV that the
    next round's catch-up/verification rewrites before any read, and the
    pools' validity masks (``ctx_len``/``seq_lens``) never expose them.
    Greedy only — output is token-exact vs the non-speculative engine.

    tokens2: [B, 2] last two committed tokens; positions: [B] the latest
    token's absolute position; budget: [B] granted new-token slots beyond
    ``positions`` (a lane starts a round only while ``gamma + 1`` slots
    remain, so in-graph writes never leave allocated blocks). Returns
    (emitted [B, rounds*(gamma+1)], counts [B], accepted [B],
    speculated [B], pool, draft_pool).
    """
    b = tokens2.shape[0]
    bs = pool["kv"].shape[3]
    gp1 = gamma + 1
    width = rounds * gp1
    eos = jnp.asarray(eos, jnp.int32)
    if budget is None:
        budget = jnp.full((b,), width, dtype=jnp.int32)
    out0 = jnp.zeros((b, width), dtype=jnp.int32)
    zeros = jnp.zeros((b,), dtype=jnp.int32)

    def slot_of(p, alive):
        return _slot_of(block_tables, bs, p, alive)

    def cond(carry):
        r, _, _, alive = carry[0], carry[1], carry[2], carry[3]
        return (r < rounds) & jnp.any(alive)

    def body(carry):
        (r, t2, pos, alive, rem, counts, acc, spec, out, pl, dpl) = carry
        # -- draft catch-up: 2-token step over the last committed tokens
        pos2 = jnp.stack([pos - 1, pos], axis=1)
        sb2, so2 = slot_of(pos2, alive)
        ctx2 = jnp.where(alive, pos + 1, 0)
        d_hidden, dpl = _multi_core(draft_model, draft_plus_one,
                                    draft_params, dpl, t2, pos2, sb2, so2,
                                    block_tables, ctx2,
                                    allow_pallas=allow_pallas, mesh=mesh)
        d1 = jnp.argmax(_head(draft_params, d_hidden[:, 1]),
                        axis=-1).astype(jnp.int32)

        # -- draft gamma-1 more tokens (single steps, greedy)
        def draft_step(c2, j):
            dpl_, prev = c2
            p = pos + j
            sb1, so1 = slot_of(p, alive)
            lg, dpl_ = _decode_core(draft_model, draft_plus_one,
                                    draft_params, dpl_, prev, p,
                                    block_tables, jnp.where(alive, p + 1, 0),
                                    sb1, so1, allow_pallas=allow_pallas,
                                    mesh=mesh)
            return (dpl_, jnp.argmax(lg, axis=-1).astype(jnp.int32)), prev

        if gamma > 1:
            (dpl, d_last), d_prev = jax.lax.scan(
                draft_step, (dpl, d1), jnp.arange(1, gamma))
            drafted = jnp.concatenate(
                [d_prev.transpose(1, 0), d_last[:, None]], axis=1)  # [B, g]
        else:
            drafted = d1[:, None]

        # -- verify + greedy-accept + commit (shared helpers)
        _, emitted, n, c, hit, pl = _verify_accept(
            model, plus_one, params, pl, t2, drafted, pos, block_tables,
            bs, alive, gamma, eos, allow_pallas, mesh)
        out, counts, acc, spec, t2, pos, rem, alive = _commit_round(
            emitted, n, c, hit, alive, rem, counts, acc, spec, out, t2,
            pos, gamma, width)
        return (r + 1, t2, pos, alive, rem, counts, acc, spec, out, pl, dpl)

    carry = (jnp.int32(0), tokens2.astype(jnp.int32), positions, live,
             budget, zeros, zeros, zeros, out0, pool, draft_pool)
    (_, _, _, _, _, counts, acc, spec, out, pool, draft_pool) = \
        jax.lax.while_loop(cond, body, carry)
    return out, counts, acc, spec, pool, draft_pool


@partial(jax.jit, static_argnums=(0, 1, 10, 11), donate_argnums=(3,),
         static_argnames=("allow_pallas", "mesh"))
def ngram_horizon(model, plus_one: bool, params, pool, tokens2, positions,
                  block_tables, live, history, hist_len, gamma: int,
                  rounds: int, eos=-1, budget=None,
                  allow_pallas: bool = True, mesh=None):
    """Drafter-free speculative decode by PROMPT LOOKUP (n-gram): up to
    ``rounds`` rounds of (propose ``gamma`` tokens from the sequence's own
    history -> one multi-token target verification) fully on device.

    vLLM's ngram speculator proposes on the host between engine steps; here
    the bigram lookup is IN-GRAPH (one vectorized compare + gather over a
    per-lane history buffer), so several speculation rounds run per
    dispatch — on the axon tunnel each host round-trip costs ~25 ms, which
    a host-side proposer would pay per round. Greedy only; output is
    token-exact vs the non-speculative engine (every proposal is verified
    by the target's own argmax, exactly ``speculative_horizon``'s
    acceptance rule — reference ``speculative_decoding.py:85-245`` with the
    drafter replaced by suffix matching).

    Per round and lane (batched):

    - propose: find the latest PRIOR occurrence of the current bigram
      ``(prev, last)`` in ``history`` and propose the ``gamma`` tokens that
      followed it; if the bigram never occurred, propose ``last`` repeated
      (greedy loops are the common no-match case, and misproposals only
      cost verify FLOPs already being spent);
    - verify: the target scores all ``gamma + 1`` positions in one
      ``_multi_core`` pass (writing its KV as it goes) and accepts the
      longest proposed prefix matching its own argmax, then emits its
      correction token;
    - commit: accepted tokens are appended to the in-graph history so the
      NEXT round's lookup sees them.

    Rollback is free (``speculative_horizon``'s scheme): slots past the
    accepted point hold stale KV that the next round's verification — or
    the next plain decode tick — rewrites before any read.

    tokens2: [B, 2] last two committed tokens; positions: [B] the latest
    token's absolute position; history: [B, HL] committed tokens (prompt +
    generated, -1 padded); hist_len: [B] valid history length; budget: [B]
    granted new-token slots beyond ``positions``. Returns (emitted
    [B, rounds*(gamma+1)], counts [B], accepted [B], speculated [B], pool).
    """
    b = tokens2.shape[0]
    bs = pool["kv"].shape[3]
    hl = history.shape[1]
    gp1 = gamma + 1
    width = rounds * gp1
    eos = jnp.asarray(eos, jnp.int32)
    if budget is None:
        budget = jnp.full((b,), width, dtype=jnp.int32)
    out0 = jnp.zeros((b, width), dtype=jnp.int32)
    zeros = jnp.zeros((b,), dtype=jnp.int32)
    iota = jnp.arange(gp1)[None, :]
    rows = jnp.arange(b)[:, None]
    j_idx = jnp.arange(hl - 1)[None, :]
    g_iota = jnp.arange(gamma)[None, :]

    def cond(carry):
        r, alive = carry[0], carry[3]
        return (r < rounds) & jnp.any(alive)

    def body(carry):
        (r, t2, pos, alive, rem, counts, acc, spec, out, hist, hlen,
         pl) = carry
        # -- propose: latest PRIOR occurrence of the current bigram.
        # Bigram at (j, j+1); the continuation must start strictly inside
        # committed history (j + 2 <= hlen - 1), which also excludes the
        # current end bigram itself (j + 1 == hlen - 1).
        m = (hist[:, :-1] == t2[:, 0:1]) & (hist[:, 1:] == t2[:, 1:2])
        m = m & (j_idx <= hlen[:, None] - 3)
        jstar = jnp.max(jnp.where(m, j_idx, -1), axis=1)       # [B]
        gidx = jnp.clip(jstar[:, None] + 2 + g_iota, 0, hl - 1)
        prop = jnp.take_along_axis(hist, gidx, axis=1)         # [B, gamma]
        drafted = jnp.where(jstar[:, None] >= 0, prop,
                            jnp.broadcast_to(t2[:, 1:2], prop.shape))
        drafted = jnp.maximum(drafted, 0)   # -1 history padding -> legal id

        # -- verify + greedy-accept (shared helper)
        _, emitted, n, c, hit, pl = _verify_accept(
            model, plus_one, params, pl, t2, drafted, pos, block_tables,
            bs, alive, gamma, eos, allow_pallas, mesh)

        # -- append committed tokens to the history for the next round's
        # lookup (pre-commit alive/c), then the shared commit
        live_tok = alive[:, None] & (iota < c[:, None])
        hw = jnp.where(live_tok, hlen[:, None] + iota, hl)
        hist = hist.at[rows, hw].set(emitted, mode="drop")
        hlen = jnp.where(alive, jnp.minimum(hlen + c, hl), hlen)
        out, counts, acc, spec, t2, pos, rem, alive = _commit_round(
            emitted, n, c, hit, alive, rem, counts, acc, spec, out, t2,
            pos, gamma, width)
        return (r + 1, t2, pos, alive, rem, counts, acc, spec, out, hist,
                hlen, pl)

    carry = (jnp.int32(0), tokens2.astype(jnp.int32), positions, live,
             budget, zeros, zeros, zeros, out0, history.astype(jnp.int32),
             hist_len.astype(jnp.int32), pool)
    (_, _, _, _, _, counts, acc, spec, out, _, _, pool) = \
        jax.lax.while_loop(cond, body, carry)
    return out, counts, acc, spec, pool


@partial(jax.jit, static_argnums=(0, 1, 9, 10), donate_argnums=(4,),
         static_argnames=("allow_pallas", "mesh"))
def medusa_horizon(model, plus_one: bool, params, medusa, pool, tokens2,
                   positions, block_tables, live, gamma: int, rounds: int,
                   eos=-1, budget=None, allow_pallas: bool = True,
                   mesh=None):
    """SELF-speculative decode via Medusa heads (``layers.medusa``,
    arXiv:2401.10774): up to ``rounds`` rounds of (propose ``gamma`` tokens
    from the previous round's verified hidden state -> one multi-token
    target verification) fully on device.

    The proposer is FREE relative to the other two speculative flavors:
    the draft-model tick pays ``gamma`` sequential drafter forward passes
    per round, the ngram tick needs a per-lane history buffer shipped each
    tick — here the gamma proposals are one batched ``[B, K, H]`` einsum +
    one lm_head matmul over the hidden state the PREVIOUS verification
    already produced (head ``k`` predicts offset ``k + 2``; the base
    lm_head's own prediction at offset 1 was committed as that round's
    correction token). No draft pool, no history, no extra decode steps.

    Greedy only and token-exact vs the plain engine for ANY head weights:
    every proposal is verified against the target's own argmax (the same
    acceptance rule as ``speculative_horizon`` — reference
    ``speculative_decoding.py:85-245``); head training moves only the
    acceptance rate. Round 0 of each tick has no prior hidden state and
    proposes ``last`` repeated (the ngram tick's no-match fallback) —
    self-bootstrap costs one low-acceptance round per dispatch, which
    ``rounds >> 1`` amortizes, and keeps the engine stateless across ticks.

    tokens2/positions/live/budget: as ``ngram_horizon``. medusa:
    ``{"w1": [K, H, H], "b1": [K, H]}`` with ``K >= gamma``. Returns
    (emitted [B, rounds*(gamma+1)], counts [B], accepted [B],
    speculated [B], pool).
    """
    from ..layers.medusa import medusa_hidden

    b = tokens2.shape[0]
    bs = pool["kv"].shape[3]
    gp1 = gamma + 1
    width = rounds * gp1
    eos = jnp.asarray(eos, jnp.int32)
    if budget is None:
        budget = jnp.full((b,), width, dtype=jnp.int32)
    out0 = jnp.zeros((b, width), dtype=jnp.int32)
    zeros = jnp.zeros((b,), dtype=jnp.int32)
    hdtype = cnn.embedding_dtype(params["embed_tokens"])
    h0 = jnp.zeros((b, model.config.hidden_size), dtype=hdtype)

    def cond(carry):
        r, alive = carry[0], carry[3]
        return (r < rounds) & jnp.any(alive)

    def body(carry):
        (r, t2, pos, alive, rem, counts, acc, spec, out, h_prop, have_h,
         pl) = carry
        # -- propose: heads over the previous round's accepted hidden.
        # One einsum + one vocab projection for ALL gamma proposals
        # (cheap: gamma extra lm_head rows vs the verification pass's
        # full weight stream). Lanes without a hidden yet (round 0)
        # propose `last` repeated.
        hk = medusa_hidden(medusa, h_prop)                    # [B, K, H]
        prop = jnp.argmax(_head(params, hk[:, :gamma]),
                          axis=-1).astype(jnp.int32)          # [B, gamma]
        drafted = jnp.where(have_h[:, None], prop,
                            jnp.broadcast_to(t2[:, 1:2], prop.shape))

        # -- verify + greedy-accept (shared helper)
        t_hidden, emitted, n, c, hit, pl = _verify_accept(
            model, plus_one, params, pl, t2, drafted, pos, block_tables,
            bs, alive, gamma, eos, allow_pallas, mesh)

        # -- next round's proposal source: the hidden at the accepted
        # index n — the state whose lm_head argmax produced this round's
        # correction token (= the new last committed token)
        h_prop = jnp.take_along_axis(
            t_hidden, n[:, None, None], axis=1)[:, 0].astype(hdtype)
        have_h = have_h | alive

        out, counts, acc, spec, t2, pos, rem, alive = _commit_round(
            emitted, n, c, hit, alive, rem, counts, acc, spec, out, t2,
            pos, gamma, width)
        return (r + 1, t2, pos, alive, rem, counts, acc, spec, out, h_prop,
                have_h, pl)

    carry = (jnp.int32(0), tokens2.astype(jnp.int32), positions, live,
             budget, zeros, zeros, zeros, out0, h0,
             jnp.zeros((b,), dtype=bool), pool)
    (_, _, _, _, _, counts, acc, spec, out, _, _, pool) = \
        jax.lax.while_loop(cond, body, carry)
    return out, counts, acc, spec, pool
