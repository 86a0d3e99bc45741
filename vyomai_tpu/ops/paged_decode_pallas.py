"""Pallas paged-decode attention: block-table gather inside the kernel
(SURVEY.md §2.3 item 3 — the TPU equivalent of
``flash_attn_with_kvcache(block_table=...)``).

Unlike the XLA-gather fallback in ``ops.paged_attention`` (which first
materializes the gathered KV in HBM, doubling bandwidth), this kernel
scalar-prefetches the block table and DMAs each live KV block HBM->VMEM
directly, double-buffered, with an online-softmax accumulator. Dead blocks
past ``seq_len`` are never fetched.

Layout trick for Mosaic DMA alignment: the kernel reads the pool flattened
as ``[NB, BS, H_kv * D]`` so block DMAs slice only the leading dim and the
minor dims stay 128-lane aligned even at head_dim 64. All query heads are
processed in one MXU dot per block by expanding q into a block-diagonal
``[H, H_kv * D]`` matrix (zeros outside each head's own kv-head columns) —
scores come out as ``q_exp @ K_block^T`` for every head at once. The extra
MXU work (factor H_kv) is negligible: decode is HBM-bandwidth-bound.

Grid: ``(B,)`` — one program per sequence.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.masks import NEG_INF  # canonical masking sentinel
from .quant_matmul import _unpack_int4  # shared nibble sign-extend idiom

_INTERPRET = False  # set True to run the kernel on CPU (tests/debugging)


def set_interpret(flag: bool) -> None:
    global _INTERPRET
    _INTERPRET = flag


def _kernel(bt_ref, len_ref, qexp_ref, scale_ref, sel_ref, pool_ref, o_ref,
            kv_sc, sem, *, bs, h, width, nslots, window=None,
            sinks: int = 0, int4: bool = False):
    """pool_ref: [NB, 2, BS, width] (k row 0, v row 1, width = H_kv * D).

    Int8 pools (``scale_ref`` not None, [NB, 2, BS] f32 resident in VMEM —
    a few hundred KB even for large pools) dequantize via the score matrix:
    a key row's scalar scale multiplies its scores COLUMN (s *= ks[None,:])
    and a value row's scale folds into the probabilities (p *= vs[None,:])
    before the p@v dot — no [BS, width] rescaling, the DMA'd block feeds
    the MXU straight from int8, and HBM traffic halves vs bf16.

    Int4 pools (``int4=True``: pool holds ``width/2`` packed bytes per
    row, ``scale_ref`` [NB, 2, H_kv, BS] per-(row, head) f32, ``sel_ref``
    [H, H_kv] the q-head -> kv-head one-hot) quarter the DMA bytes. The
    nibble unpack is two shifts + a CONCAT along the feature axis — the
    per-head-local split-halves packing (``ops.paged_attention.
    pack_int4_rows``) is chosen so unpacked features land in a fixed "pi
    order" (low halves head-major, then high halves) rather than needing a
    lane interleave; the caller permutes q into the same order and
    un-permutes the output, so the kernel never relayouts. Per-head scales
    still fold through the score matrix: score row h only contracts
    features of h's own kv head g(h), so ``sel @ scale^T`` expands the
    [H_kv, BS] scales to the [H, BS] score scale exactly (the v-scale fold
    into p is sound for the same reason — acc columns outside g(h)'s
    feature block are discarded by the caller's head extraction).

    ``nslots``-deep multi-buffering: per-block compute is ~trivial (one
    [H,width]x[width,BS] dot), so the loop cost is DMA-bound. Measured
    (chained calls, B=16 ctx=1536): the dominant term is the ~0.9 us
    PER-DMA ISSUE cost, so fewer/bigger blocks win — 394 us at BS=32/
    double-buffer -> 334 us at nslots=4 -> 184 us at BS=128 -> 152 us at
    BS=256 (166 GB/s); nslots=4 is ~5-10% over 2 at every block size and
    8+ gains nothing (issue cost, not latency, binds). Block size is the
    serving engine's call; the kernel just rides ``pool.shape[2]``."""
    b = pl.program_id(0)
    seq_len = len_ref[b]
    # clamp to the block-table width: an oversized seq_len must not index
    # past the table (the XLA fallback masks the same way) — without this
    # the DMA would fetch from a garbage block index
    nblocks = jnp.minimum(pl.cdiv(seq_len, bs), bt_ref.shape[1])
    # sliding window: the sweep covers [0, n_sink) sink blocks
    # (StreamingLLM) then the band's blocks [start, nblocks) — blocks
    # between sinks and band are neither fetched nor computed. The loop
    # index j stays DENSE (pipeline slots = j % nslots); ``phys`` maps it
    # to the physical block.
    if window is not None:
        j0 = jnp.maximum(seq_len - window, 0) // bs
        n_sink = jnp.minimum(jnp.int32((sinks + bs - 1) // bs), nblocks) \
            if sinks else jnp.int32(0)
        start = jnp.clip(jnp.maximum(j0, n_sink), n_sink, nblocks)
        total = n_sink + (nblocks - start)

        def phys(j):
            return jnp.where(j < n_sink, j, start + (j - n_sink))
    else:
        total = nblocks

        def phys(j):
            return j

    def dma(slot, j):
        blk = bt_ref[b, phys(j)]
        return pltpu.make_async_copy(pool_ref.at[blk], kv_sc.at[slot],
                                     sem.at[slot])

    # prologue: fill all but one slot
    for jj in range(nslots - 1):
        @pl.when(jj < total)
        def _(jj=jj):
            dma(jj % nslots, jj).start()

    q = qexp_ref[0].astype(jnp.float32)                # [H, width], prescaled

    def body(j, carry):
        m, l, acc = carry
        slot = j % nslots

        # top up the pipeline: block j+nslots-1 goes into the slot freed
        # at iteration j-1
        @pl.when(j + nslots - 1 < total)
        def _():
            dma((j + nslots - 1) % nslots, j + nslots - 1).start()

        dma(slot, j).wait()
        jp = phys(j)
        if int4:
            def unpack(p8):
                lo, hi = _unpack_int4(p8)
                return jnp.concatenate([lo, hi],
                                       axis=-1).astype(jnp.float32)
            k = unpack(kv_sc[slot, 0])                 # [BS, width] pi order
            v = unpack(kv_sc[slot, 1])
        else:
            k = kv_sc[slot, 0].astype(jnp.float32)     # [BS, width]
            v = kv_sc[slot, 1].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [H, BS]
        if int4:
            sc = scale_ref[bt_ref[b, jp]]              # [2, H_kv, BS]
            sel = sel_ref[...]                         # [H, H_kv]
            ks = jax.lax.dot_general(                  # [H, BS]
                sel, sc[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            vs = jax.lax.dot_general(
                sel, sc[1], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = s * ks
        elif scale_ref is not None:
            sc = scale_ref[bt_ref[b, jp]]              # [2, BS]
            s = s * sc[0:1, :]
        pos = jp * bs + jax.lax.broadcasted_iota(jnp.int32, (1, bs), 1)
        ok = pos < seq_len
        if window is not None:
            band = pos >= seq_len - window
            if sinks:
                band = band | (pos < sinks)
            ok = ok & band
        s = jnp.where(ok, s, NEG_INF)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(jnp.maximum(m, m_cur), -1e30)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        if int4:
            p = p * vs
        elif scale_ref is not None:
            p = p * sc[1:2, :]
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [H, width]
        return m_new, l_new, acc_new

    m0 = jnp.full((h, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((h, 1), jnp.float32)
    a0 = jnp.zeros((h, width), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, total, body, (m0, l0, a0))
    l_safe = jnp.where(l == 0.0, 1.0, l)
    o_ref[0] = (acc / l_safe).astype(o_ref.dtype)


_NSLOTS = 4  # DMA pipeline depth (see _kernel docstring — 4 swept best)


def paged_attention_decode_pallas(q, pool, block_tables, seq_lens,
                                  h_kv: int, scales=None, window=None,
                                  sinks: int = 0):
    """q: [B, H, D]; pool: [NB, 2, BS, H_kv*D] (canonical serving layout;
    H_kv*D/2 packed bytes for int4 pools); block_tables: [B, MAXB] int32;
    seq_lens: [B] int32; scales: per-row dequant scales, required for
    quantized pools — [NB, 2, BS] f32 (int8) or [NB, 2, H_kv, BS] f32
    (int4; see ``ops.paged_attention.write_kv``). Returns [B, H, D]."""
    b, h, d = q.shape
    nb, _, bs, pwidth = pool.shape
    int4 = scales is not None and scales.ndim == 4
    width = 2 * pwidth if int4 else pwidth              # H_kv * D
    nslots = _NSLOTS
    group = h // h_kv
    scale = 1.0 / (d ** 0.5)

    # block-diagonal q expansion: head h occupies its kv-head's columns
    q_scaled = (q * scale).astype(jnp.float32)          # [B, H, D]
    sel = jnp.repeat(jnp.eye(h_kv, dtype=jnp.float32), group,
                     axis=0)                            # [H, H_kv]
    if int4:
        # pi order (kernel docstring): low half-features head-major, then
        # high half-features — match the unpacked K/V layout
        q1, q2 = q_scaled[..., :d // 2], q_scaled[..., d // 2:]
        exp = [(qq[:, :, None, :] * sel[None, :, :, None]
                ).reshape(b, h, width // 2) for qq in (q1, q2)]
        q_exp = jnp.concatenate(exp, axis=-1)           # [B, H, width]
    else:
        q_exp = (q_scaled[:, :, None, :] * sel[None, :, :, None]
                 ).reshape(b, h, width)

    quant = pool.dtype == jnp.int8
    if int4:
        # NOTE width kwarg = UNPACKED width (acc/output size); the scratch
        # holds the packed pwidth bytes
        kern = functools.partial(_kernel, bs=bs, h=h, width=width,
                                 nslots=nslots, window=window, sinks=sinks,
                                 int4=True)
    elif quant:
        kern = functools.partial(
            lambda bt, ln, qe, sc, pr, o, sc_, sm, **kw:
            _kernel(bt, ln, qe, sc, None, pr, o, sc_, sm, **kw),
            bs=bs, h=h, width=width, nslots=nslots, window=window,
            sinks=sinks)
    else:
        kern = functools.partial(
            lambda bt, ln, qe, pr, o, sc_, sm, **kw:
            _kernel(bt, ln, qe, None, None, pr, o, sc_, sm, **kw),
            bs=bs, h=h, width=width, nslots=nslots, window=window,
            sinks=sinks)

    in_specs = [
        pl.BlockSpec((1, h, width), lambda b_, *_: (b_, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if quant:
        # whole scales array resident in VMEM: NB*2*BS f32 is a few
        # hundred KB even for thousands-of-blocks pools (int4's per-head
        # sidecar is H_kv x bigger — still ~MBs at serving sizes)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    if int4:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # sel
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # pool in HBM
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, h, width), lambda b_, *_: (b_, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nslots, 2, bs, pwidth), pool.dtype),
            pltpu.SemaphoreType.DMA((nslots,)),
        ],
    )
    args = [jnp.where(block_tables < 0, 0, block_tables).astype(jnp.int32),
            seq_lens.astype(jnp.int32), q_exp.astype(q.dtype)]
    if quant:
        assert scales is not None, "quantized pool needs its scales sidecar"
        args.append(scales.astype(jnp.float32))
    if int4:
        args.append(sel)
    args.append(pool)
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, width), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_INTERPRET,
    )(*args)

    if int4:
        # undo pi order: [.., :w2] = low half-features, [.., w2:] = high
        o1 = out[..., :width // 2].reshape(b, h, h_kv, d // 2)
        o2 = out[..., width // 2:].reshape(b, h, h_kv, d // 2)
        out = jnp.concatenate([o1, o2], axis=-1)        # [B, H, H_kv, D]
    else:
        # each head's output lives in its kv-head's column slice
        out = out.reshape(b, h, h_kv, d)
    kv_idx = jnp.arange(h) // group
    return jnp.take_along_axis(
        out, kv_idx[None, :, None, None].repeat(b, 0), axis=2)[:, :, 0, :]


_PAGED_IMPL = "auto"  # "auto" | "xla" | "pallas"


def set_paged_impl(impl: str) -> None:
    """Force the paged-decode attention implementation: ``"pallas"`` (the
    kernel above), ``"xla"`` (the gather fallback in
    ``ops.paged_attention``), or ``"auto"`` (kernel when supported).
    Benchmarks use this to measure the fused/naive decode ratio.

    The choice is baked in at trace time: call
    ``serving.paged_model.decode.clear_cache()`` (and the prefill's) after
    switching, or already-compiled programs keep the old path."""
    global _PAGED_IMPL
    assert impl in ("auto", "xla", "pallas")
    _PAGED_IMPL = impl


def supported(q, pool, h_kv: int) -> bool:
    if _PAGED_IMPL == "xla":
        return False
    if _PAGED_IMPL == "pallas":
        return True
    if not _INTERPRET and jax.default_backend() != "tpu":
        return False
    b, h, d = q.shape
    nb, two, bs, width = pool.shape
    return width % 128 == 0 and bs % 8 == 0 and h % h_kv == 0
