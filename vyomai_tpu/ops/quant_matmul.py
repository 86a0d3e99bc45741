"""Int8 weight-only quantized matmul (XLA fused dequant + Pallas kernel).

Single-token decode is weight-HBM-bandwidth-bound: every step streams the
full parameter set through the MXU at trivial arithmetic intensity. Storing
linear kernels int8 with one f32 scale per output channel halves the bytes
per step.

**Default impl is the XLA in-graph dequant** — measured on the v5e, XLA
fuses the int8→bf16 widening into the matmul operand read (the bf16 weight
never materializes in HBM: a 24-deep 32×4096×4096 decode chain streams int8
at ~210 GB/s vs the hypothetical 3-pass materialize cost of ~6 ms), and it
beats both the bf16 baseline (2.37 ms → 1.9 ms, ~1.25×) and every
hand-written Mosaic variant swept (best 2.25 ms across (bk,bn) tilings,
kn/nk layouts, full-K strips). The Pallas kernel stays available via
``set_impl("pallas")`` for future-backend experiments and is still
correctness-tested; do not default to it without re-measuring.

Math: with per-output-channel symmetric scales the dequant commutes with
the contraction, ``y[m,n] = (sum_k x[m,k] * w_q[k,n]) * scale[n]`` — both
layouts use scale-on-output: same measured speed as scale-on-weight
(within noise) and numerically better on TPU, where int8 weight values
are exactly representable in the MXU's bf16 multiplies.

Replaces (beats) the role of the reference's fp16 ``flash_attn`` /
torch.compile weight streaming: the reference has no quantized inference
path at all (SURVEY.md §2.3 — its performance layer is fp16 CUDA wheels).

Layout notes (TPU, pallas impl): weight blocks are (bk, bn) int8 tiles —
minor dim a multiple of 128, second-minor a multiple of 32 (int8 packing).
Scales ride as a [1, N] f32 row. Accumulation lives in a VMEM scratch
across the ``k`` grid dim (innermost, "arbitrary"); ``n`` is parallel.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False
_IMPL = "xla"  # measured fastest on v5e — see module docstring


def set_interpret(flag: bool):
    """Force interpreter mode (CPU tests of the kernel path)."""
    global _INTERPRET
    _INTERPRET = bool(flag)


def set_impl(impl: str):
    """Select the matmul implementation: ``"xla"`` (default, fused dequant)
    or ``"pallas"`` (hand-written kernel — slower on v5e as measured,
    kept for correctness tests and future-backend experiments)."""
    global _IMPL
    assert impl in ("xla", "pallas"), impl
    _IMPL = impl


_IMPL4 = "pallas"  # int4 default: XLA materializes the nibble unpack
# int4 kernel body: "fold" (scales folded into the unpacked weight, one
# full-depth dot per nibble half — fastest at decode M, see
# _kernel_int4_fold) or "split" (per-group exact-scale dots)
_INT4_KERNEL = "fold"


def set_int4_kernel(kind: str):
    global _INT4_KERNEL
    assert kind in ("fold", "split"), kind
    _INT4_KERNEL = kind


def set_impl4(impl: str):
    """Select the int4 implementation: ``"pallas"`` (default on TPU — the
    nibble unpack runs in VMEM) or ``"xla"`` (in-graph reconstruction).
    Use ``"xla"`` under tensor-parallel meshes: the Pallas kernel is
    opaque to GSPMD, which would all-gather the sharded weight around it,
    while the XLA path partitions cleanly."""
    global _IMPL4
    assert impl in ("xla", "pallas"), impl
    _IMPL4 = impl


def quantize_weight(w, *, contract_axis: int = 0):
    """Symmetric per-output-channel int8 quantization.

    ``w``: a 2-D kernel; ``contract_axis`` is the axis summed over in the
    matmul (0 for ``[in, out]`` kernels, 1 for ``[out, in]`` / embedding
    ``[V, D]`` rows). Returns ``(w_q int8, scale f32 [n_out])`` with
    ``w ≈ w_q * scale`` broadcast over the contraction axis.
    """
    w32 = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=contract_axis)            # [n_out]
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    expand = scale[None, :] if contract_axis == 0 else scale[:, None]
    q = jnp.clip(jnp.round(w32 / expand), -127, 127).astype(jnp.int8)
    return q, scale


def _pick_block(n: int, candidates) -> int:
    for c in candidates:
        if c <= n and n % c == 0:
            return c
    return 0


def _kernel_kn(x_ref, w_ref, s_ref, o_ref, acc_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(x_ref[:], w_ref[:].astype(x_ref.dtype),
                          preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(1) - 1)
    def _scale_out():
        o_ref[:] = (acc_ref[:] * s_ref[:].astype(jnp.float32)).astype(
            o_ref.dtype)


def _kernel_nk(x_ref, w_ref, s_ref, o_ref, acc_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w_ref[:].astype(x_ref.dtype),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(1) - 1)
    def _scale_out():
        o_ref[:] = (acc_ref[:] * s_ref[:].astype(jnp.float32)).astype(
            o_ref.dtype)


def _blocks(k_dim: int, n_dim: int):
    """(bk, bn) or (0, 0) when the dims don't tile (fallback path)."""
    bk = _pick_block(k_dim, (512, 384, 256, 128, 64, 32))
    bn = _pick_block(n_dim, (512, 384, 256, 128))
    return bk, bn


def _on_tpu() -> bool:
    """True when computation would actually land on a TPU — honors a
    ``jax.default_device(cpu)`` override (``default_backend()`` alone still
    reports the priority backend there)."""
    dd = jax.config.jax_default_device
    if dd is not None and hasattr(dd, "platform"):
        return dd.platform == "tpu"
    return jax.default_backend() == "tpu"


def supported(k_dim: int, n_dim: int) -> bool:
    """True when the Pallas kernel can run this shape on this backend."""
    if not _INTERPRET and not _on_tpu():
        return False
    bk, bn = _blocks(k_dim, n_dim)
    return bk > 0 and bn > 0


@partial(jax.jit, static_argnames=("w_layout", "interpret"))
def _int8_matmul_2d(x, w_q, scale, w_layout: str, interpret: bool):
    m, k_dim = x.shape
    if w_layout == "kn":
        n_dim = w_q.shape[1]
        kernel, w_index = _kernel_kn, (lambda n, k: (k, n))
        w_block = lambda bk, bn: (bk, bn)
    else:                                                       # "nk"
        n_dim = w_q.shape[0]
        kernel, w_index = _kernel_nk, (lambda n, k: (n, k))
        w_block = lambda bk, bn: (bn, bk)
    bk, bn = _blocks(k_dim, n_dim)
    m_pad = max(8, -(-m // 8) * 8)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    out = pl.pallas_call(
        kernel,
        grid=(n_dim // bn, k_dim // bk),
        in_specs=[
            pl.BlockSpec((m_pad, bk), lambda n, k: (0, k)),
            pl.BlockSpec(w_block(bk, bn), w_index),
            pl.BlockSpec((1, bn), lambda n, k: (0, n)),
        ],
        out_specs=pl.BlockSpec((m_pad, bn), lambda n, k: (0, n)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_dim), x.dtype),
        scratch_shapes=[pltpu.VMEM((m_pad, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(x, w_q, scale.reshape(1, -1))
    return out[:m] if m_pad != m else out


# ---------------------------------------------------------------------------
# Int4 (packed) weight-only path
# ---------------------------------------------------------------------------
#
# Two 4-bit values per int8 byte — guaranteed half the HBM bytes of int8
# regardless of backend packing support (jnp.int4 arrays are not reliably
# bit-packed in memory). Packing pairs ADJACENT original rows (2i -> low
# nibble, 2i+1 -> high nibble), so the kernel unpacks a packed tile into two
# contiguous row-halves (even rows, odd rows) with no interleave, and the
# activation side splits once into x[..., 0::2] / x[..., 1::2]. Symmetric
# per-(group, output-channel) scales (group = ``group_size`` consecutive
# original K rows, default 128) recover accuracy 4 bits can't carry
# per-channel alone. Unlike int8, the in-graph XLA dequant CANNOT fuse the
# nibble unpack into the dot's operand read (it materializes the widened
# weight), so the Pallas kernel — unpack in VMEM between the DMA and the
# MXU — is the default on TPU.

def quantize_weight_int4(w, *, group_size: int = 128):
    """Symmetric 4-bit group-wise quantization of a ``[K, N]`` kernel.

    Returns ``(packed int8 [K/2, N], scale f32 [K/group_size, N])`` with
    ``w[2i] ~ lownibble(packed[i]) * scale[2i // gs]`` and ``w[2i+1] ~
    highnibble(packed[i]) * scale[...]``. K must be even and divisible by
    ``group_size``.
    """
    k_dim, n_dim = w.shape
    assert k_dim % 2 == 0 and k_dim % group_size == 0, (k_dim, group_size)
    w32 = jnp.asarray(w, jnp.float32)
    grouped = w32.reshape(k_dim // group_size, group_size, n_dim)
    amax = jnp.max(jnp.abs(grouped), axis=1)                 # [G, N]
    scale = jnp.where(amax > 0, amax / 7.0, 1.0)
    q = jnp.clip(jnp.round(grouped / scale[:, None, :]), -7, 7)
    q = q.reshape(k_dim, n_dim).astype(jnp.int32)
    packed = (q[0::2] & 0xF) | ((q[1::2] & 0xF) << 4)        # [K/2, N]
    return jax.lax.bitcast_convert_type(
        packed.astype(jnp.uint8), jnp.int8), scale


def _unpack_int4(p8):
    """(low, high) nibbles of an int8 array, sign-extended (int32)."""
    p32 = p8.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(p32, 28), 28)
    hi = jnp.right_shift(jnp.left_shift(p32, 24), 28)
    return lo, hi


def _kernel_int4(xe_ref, xo_ref, wp_ref, s_ref, o_ref, acc_ref):
    """One K-block of packed rows per grid step. The block may span
    SEVERAL scale groups (Mosaic requires the block's minor dim — packed
    rows on the x side — to be 128-divisible, while a default gs=128 group
    is only 64 packed rows), so the dot is split per group over in-VMEM
    slices and each partial product gets its own scale row: slicing VMEM
    values is free of the HBM block-mapping tiling constraint."""
    g = pl.program_id(1)

    @pl.when(g == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    lo, hi = _unpack_int4(wp_ref[:])          # [R, bn] packed-row halves
    xe, xo = xe_ref[:], xo_ref[:]
    groups = s_ref.shape[1]                   # s block: [1, gpb, bn]
    per = lo.shape[0] // groups               # packed rows per group
    acc = jnp.zeros_like(acc_ref)
    for i in range(groups):                   # static unroll (<= 8)
        sl = slice(i * per, (i + 1) * per)
        part = jnp.dot(xe[:, sl], lo[sl].astype(xe.dtype),
                       preferred_element_type=jnp.float32)
        part += jnp.dot(xo[:, sl], hi[sl].astype(xo.dtype),
                        preferred_element_type=jnp.float32)
        acc += part * s_ref[0, i:i + 1, :].astype(jnp.float32)
    acc_ref[:] += acc

    @pl.when(g == pl.num_programs(1) - 1)
    def _out():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _kernel_int4_fold(xe_ref, xo_ref, wp_ref, s_ref, o_ref, acc_ref):
    """Scale-FOLDED int4 block: unpack nibbles, multiply the per-group
    scales into the unpacked weight IN VMEM (rows repeat their group's
    scale row), then run ONE full-depth dot per nibble half.

    vs ``_kernel_int4`` (per-group split dots): at decode M=8 the split
    form issues ``2 * groups`` tiny K=(gs/2) dots per block whose MXU
    latency dominates (measured r4: the 2048<->8192 ffn pair ran int4
    SLOWER than bf16); two [M, R] x [R, bn] dots amortize that latency
    over the whole block. Precision: the scaled weight rounds to the
    ACTIVATION dtype — the same rounding the XLA fallback applies, and
    int4 is documented lossy (per-group scales bound the error)."""
    g = pl.program_id(1)

    @pl.when(g == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    lo, hi = _unpack_int4(wp_ref[:])          # [R, bn] packed-row halves
    groups = s_ref.shape[1]
    per = lo.shape[0] // groups               # packed rows per group
    dt = xe_ref.dtype
    s = s_ref[0]                              # [gpb, bn] f32
    s_rows = jnp.broadcast_to(s[:, None, :], (groups, per, s.shape[-1])
                              ).reshape(lo.shape)          # [R, bn]
    acc = jnp.dot(xe_ref[:], (lo * s_rows).astype(dt),
                  preferred_element_type=jnp.float32)
    acc += jnp.dot(xo_ref[:], (hi * s_rows).astype(dt),
                   preferred_element_type=jnp.float32)
    acc_ref[:] += acc

    @pl.when(g == pl.num_programs(1) - 1)
    def _out():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _int4_block_rows(group_size: int, k_half: int) -> int:
    """Packed K rows per kernel block: a multiple of both the per-group
    packed-row count and Mosaic's 128-row minor-dim rule that divides the
    packed K extent (0 = unsupported). Prefers the WIDEST block up to 512:
    swept on the v5e at decode shapes (M=8, K=N=2048), 512-row blocks ran
    1.4x faster than 128 — fewer grid steps amortize the per-block nibble
    unpack + per-group scale epilogue against the same streamed bytes."""
    half = group_size // 2
    if half % 128 == 0:
        base = half
    elif 128 % half == 0:
        base = 128
    else:
        return 0
    best = 0
    rows = base
    while rows <= 512:
        if k_half % rows == 0:
            best = rows
        rows += base
    return best


def supported_int4(k_dim: int, n_dim: int, group_size: int) -> bool:
    """True when the Pallas int4 kernel can run this shape."""
    if not _INTERPRET and not _on_tpu():
        return False
    rows = _int4_block_rows(group_size, k_dim // 2)
    return (k_dim % group_size == 0 and rows > 0 and
            _pick_block(n_dim, (512, 256, 128)) > 0)


@partial(jax.jit, static_argnames=("interpret", "kernel"))
def _int4_matmul_2d(x, w_p, scale, interpret: bool, kernel: str = "fold"):
    m, k_dim = x.shape
    n_dim = w_p.shape[1]
    g_dim = scale.shape[0]
    gs = k_dim // g_dim
    m_pad = max(8, -(-m // 8) * 8)
    # DECODE (small M) takes 1024-wide N blocks — fewer programs amortize
    # the per-block unpack; prefill M would blow scoped VMEM there (the
    # fp32 accumulator is [m_pad, bn])
    cands = (1024, 512, 256, 128) if m_pad <= 64 else (512, 256, 128)
    bn = _pick_block(n_dim, cands)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    xe = x[:, 0::2]                                           # [M, K/2]
    xo = x[:, 1::2]
    rows = _int4_block_rows(gs, k_dim // 2)    # packed rows per K block
    gpb = rows // (gs // 2)                    # scale groups per K block
    kb = (k_dim // 2) // rows
    # [kb, gpb, N]: a (1, gpb, bn) block's second-minor EQUALS its array
    # dim, satisfying Mosaic's tiling rule where a 2-D (gpb, bn) block
    # with gpb=2 cannot (second-minor must be 8-divisible or full)
    s3 = scale.reshape(kb, gpb, n_dim)
    out = pl.pallas_call(
        _kernel_int4_fold if kernel == "fold" else _kernel_int4,
        grid=(n_dim // bn, kb),
        in_specs=[
            pl.BlockSpec((m_pad, rows), lambda n, g: (0, g)),
            pl.BlockSpec((m_pad, rows), lambda n, g: (0, g)),
            pl.BlockSpec((rows, bn), lambda n, g: (g, n)),
            pl.BlockSpec((1, gpb, bn), lambda n, g: (g, 0, n)),
        ],
        out_specs=pl.BlockSpec((m_pad, bn), lambda n, g: (0, n)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_dim), x.dtype),
        scratch_shapes=[pltpu.VMEM((m_pad, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(xe, xo, w_p, s3)
    return out[:m] if m_pad != m else out


def int4_matmul(x, w_p, scale):
    """``x [..., K] @ dequant4(w_p)`` — packed int4 weight, group scales.

    ``w_p``: int8 ``[K/2, N]`` from ``quantize_weight_int4``; ``scale``:
    f32 ``[K/group_size, N]``. Pallas kernel on TPU (the nibble unpack
    happens in VMEM between the block DMA and the MXU — XLA would
    materialize the widened weight); XLA reconstruction elsewhere.
    """
    lead = x.shape[:-1]
    k_dim = x.shape[-1]
    n_dim = w_p.shape[1]
    g_dim = scale.shape[0]
    gs = k_dim // g_dim
    x2 = x.reshape(-1, k_dim)
    if _IMPL4 == "pallas" and supported_int4(k_dim, n_dim, gs):
        out = _int4_matmul_2d(x2, w_p, scale, _INTERPRET, _INT4_KERNEL)
    else:
        lo, hi = _unpack_int4(w_p)
        w = jnp.stack([lo, hi], axis=1).reshape(k_dim, n_dim)
        wd = (w.reshape(g_dim, gs, n_dim).astype(x.dtype) *
              scale[:, None, :].astype(x.dtype)).reshape(k_dim, n_dim)
        out = x2 @ wd
    return out.reshape(*lead, n_dim)


def quantize_activation(x):
    """Dynamic symmetric per-row (per-token) int8 activation quantization.

    Returns ``(x_q int8 [..., K], scale f32 [..., 1])`` with ``x ≈ x_q *
    scale``. Row-wise scales are computed in fp32 from the live activation
    (no calibration pass): each token's scale depends only on that token's
    features, so cached single-token decode and full-prompt prefill
    quantize identically — the cached-vs-uncached token-exactness
    invariant survives.
    """
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                 -127, 127).astype(jnp.int8)
    return q, scale


def w8a8_matmul(x, w_q, w_scale, *, w_layout: str = "kn"):
    """``x @ dequant(w_q)`` with the contraction in int8×int8→int32.

    Dynamically quantizes ``x`` per token (``quantize_activation``) and
    feeds both operands to the MXU as int8: on the v5e the int8 systolic
    path peaks at ~2× the bf16 FLOP rate, so compute-bound shapes
    (prefill, training-sized matmuls) gain throughput on top of int8's
    halved weight stream. The int32 accumulator is exact; the only
    approximation is the 8-bit rounding of each operand, corrected by the
    outer product of the per-token and per-output-channel scales.

    Replaces (beats) the reference's fp16 compute path (SURVEY.md §2.3 —
    it has no quantized compute at all). Weight layouts as in
    :func:`int8_matmul`.
    """
    lead = x.shape[:-1]
    k_dim = x.shape[-1]
    n_dim = w_q.shape[1] if w_layout == "kn" else w_q.shape[0]
    x2 = x.reshape(-1, k_dim)
    xq, xs = quantize_activation(x2)
    dims = (((1,), (0,)), ((), ())) if w_layout == "kn" else \
        (((1,), (1,)), ((), ()))
    acc = jax.lax.dot_general(xq, w_q, dims,
                              preferred_element_type=jnp.int32)
    out = (acc.astype(jnp.float32) * xs *
           w_scale.astype(jnp.float32)).astype(x.dtype)
    return out.reshape(*lead, n_dim)


def int8_matmul(x, w_q, scale, *, w_layout: str = "kn"):
    """``x [..., K] @ dequant(w_q)`` with the dequant fused into the sweep.

    ``w_layout="kn"``: ``w_q [K, N]``, ``scale [N]`` (linear kernels).
    ``w_layout="nk"``: ``w_q [N, K]``, ``scale [N]`` (tied-embedding
    lm_head: ``hidden @ W_emb.T`` without transposing the stored weight).
    Default impl is XLA's fused dequant (measured fastest — module
    docstring); ``set_impl("pallas")`` selects the hand-written kernel,
    which still falls back to XLA off-TPU or on non-tiling shapes.
    """
    lead = x.shape[:-1]
    k_dim = x.shape[-1]
    n_dim = w_q.shape[1] if w_layout == "kn" else w_q.shape[0]
    x2 = x.reshape(-1, k_dim)
    if _IMPL == "pallas" and supported(k_dim, n_dim):
        out = _int8_matmul_2d(x2, w_q, scale, w_layout, _INTERPRET)
    elif w_layout == "kn":
        # scale-on-output: widening fuses into the dot's operand read, and
        # int8 values are exact in the MXU's bf16 multiplies (<= 127 needs
        # 7 mantissa bits) — scale-on-weight would round every dequantized
        # weight to bf16 first (~1e-3 rel err on fp32 activations)
        out = (x2 @ w_q.astype(x.dtype)) * scale.astype(x.dtype)
    else:
        out = jax.lax.dot_general(
            x2, w_q.astype(x.dtype),
            (((1,), (1,)), ((), ()))) * scale.astype(x.dtype)
    return out.reshape(*lead, n_dim)
