"""Pallas TPU attention for SHORT bidirectional sequences (ViT-class).

Why this exists (r4 ViT roofline work, `benchmarks/vit_profile.py`): at
L=197 the XLA attention path materializes the fp32 scores tensor
[B, H, L, L] in HBM per layer (238 MB at B=128) and runs at ~6% of peak,
costing ~30% of the ViT-base forward; the flash kernel loses here too —
its (B, H, nq, nk) grid pays per-program overhead on 1536 tiny programs
plus online-softmax bookkeeping that a VMEM-resident problem doesn't need
(measured r3: 1.5k img/s padded-flash vs 2.3k XLA vs this kernel's target).

Design: ONE grid dimension (batch). Each program holds an image's full
q/k/v [H, L, D] in VMEM (ViT-base: 3 x 605 KB bf16), loops the heads
unrolled, computes the [L, L] scores block on the MXU, does a plain
(non-online) fp32 softmax in VMEM, and writes only the [H, L, D] output
back to HBM. HBM traffic per layer drops from ~700 MB to ~80 MB at B=128.

Scope gate (`supported`): bidirectional, no mask/window/segments, MHA
(h == h_kv), lq == lk, 8 <= L <= SHORT_MAX_L, d in {32, 64, 128}, and
H * L * D small enough to fit the VMEM budget. Everything else goes to
flash (long) or XLA (odd shapes).

Backward: custom VJP that recomputes probabilities via XLA einsums
(``dS = P * (dP - rowsum(dP * P))`` — the reference notebook's math,
``vyomai-fused-kernals-2t4.ipynb`` cell 0). Training at these lengths is
projection-dominated, so the backward rides XLA; the kernel's win is the
forward-serving path (BASELINE.md ViT images/sec).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import flash_attention as _fa

SHORT_MAX_L = 512
# per-TENSOR VMEM budget (bytes). The kernel's resident set is ~8 blocks
# (q/k/v/o double-buffered by pallas) PLUS fp32 temporaries (head casts,
# [2L,2D] block-diagonal concats, [L,2L] scores) — so 1 MB/tensor keeps the
# worst case ~10 MB, under the ~16 MB VMEM; the old 4 MB gate admitted
# shapes (e.g. H=32,L=512,D=64) whose true footprint Mosaic can't compile
_VMEM_BLOCK_BUDGET = 1 * 1024 * 1024


def _is_keypad_bias(mask, b, lk) -> bool:
    """Additive key-padding bias [B|1, 1, 1, Lk] — the encoder model's
    ``(1-m)*finfo.min`` mask recipe (reference ``models/encoder.py:161-164``,
    the single most-used masked path: right-padded MLM/classification
    batches)."""
    return (mask is not None and mask.ndim == 4 and mask.shape[1] == 1
            and mask.shape[2] == 1 and mask.shape[3] == lk
            and mask.shape[0] in (1, b))


def supported(q, k, mask, *, causal=False, window=None, segments=None
              ) -> bool:
    if causal or window is not None or segments is not None:
        return False
    if mask is not None and not _is_keypad_bias(mask, q.shape[0], k.shape[2]):
        return False
    if q.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    b, h, lq, d = q.shape
    hk, lk = k.shape[1], k.shape[2]
    if h != hk or lq != lk:
        return False
    if d not in (32, 64, 128):
        return False
    if not (8 <= lq <= SHORT_MAX_L):
        return False
    if h * lq * d * q.dtype.itemsize > _VMEM_BLOCK_BUDGET:
        return False
    return True


def supported_packed(qkv, nh: int) -> bool:
    """Gate for ``short_attention_qkv``: qkv [B, L, 3*H*D] from a fused
    projection; even head count; ViT-class length; VMEM-sized block."""
    if qkv.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    if qkv.ndim != 3 or nh % 2 or qkv.shape[2] % (3 * nh):
        return False
    l = qkv.shape[1]
    d = qkv.shape[2] // (3 * nh)
    if d not in (32, 64, 128):
        return False
    if not (8 <= l <= SHORT_MAX_L):
        return False
    if nh * l * d * qkv.dtype.itemsize > _VMEM_BLOCK_BUDGET:
        return False
    return True


def _kernel(q_ref, k_ref, v_ref, *rest, nh, scale):
    b_ref = rest[0] if len(rest) == 2 else None   # optional [1, L] bias
    o_ref = rest[-1]
    for h in range(nh):                       # unrolled head loop
        qh, kh, vh = q_ref[0, h], k_ref[0, h], v_ref[0, h]   # [L, D]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale       # [L, L]
        if b_ref is not None:
            s = s + b_ref[0].astype(jnp.float32)      # [1, L] broadcast
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o_ref[0, h] = jax.lax.dot_general(
            p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _kernel_paired(q_ref, k_ref, v_ref, *rest, nh, scale):
    """Two heads per MXU pass via block-diagonal packing.

    Per-head dots at ViT shapes ([197,64]x[64,197]) run the MXU at ~8% —
    K=64 half-fills the systolic array and N=197 pads to 256. Packing a
    head PAIR as

        qp = [q0 | q1]  [L, 2D]      kb = [[k0, 0], [0, k1]]  [2L, 2D]
        s  = qp @ kb^T  [L, 2L]      (s[:, :L] = head0, s[:, L:] = head1)

    doubles the issued FLOPs (the zero blocks) but fills K=128 lanes —
    measured net win. The softmax uses a SHARED row max (any constant
    shift is valid) so `p = exp(s - rowmax)` needs no lane-dim split; the
    per-head denominators come from iota-masked row sums, and the division
    happens AFTER the PV dot on the [L, 2D] output (PV is linear in p):

        ob = p @ [[v0, 0], [0, v1]]  [L, 2D],  ob[:, :D] /= sum0, ...
    """
    b_ref = rest[0] if len(rest) == 2 else None   # optional [1, L] bias
    o_ref = rest[-1]
    l = q_ref.shape[2]
    d = q_ref.shape[3]
    lanes2 = jax.lax.broadcasted_iota(jnp.int32, (l, 2 * l), 1)
    lanesd = jax.lax.broadcasted_iota(jnp.int32, (l, 2 * d), 1)
    if b_ref is not None:
        bias1 = b_ref[0].astype(jnp.float32)                 # [1, L]
        bias2 = jnp.concatenate([bias1, bias1], axis=1)      # [1, 2L]
    for hp in range(nh // 2):
        h0, h1 = 2 * hp, 2 * hp + 1
        # fp32 operands measured FASTER here than bf16 (721 vs 857 us/layer
        # at B=128 — the bf16 concats at the 197 boundary cost more than
        # the MXU saves); the dots accumulate fp32 either way
        q0 = q_ref[0, h0].astype(jnp.float32)
        q1 = q_ref[0, h1].astype(jnp.float32)
        k0 = k_ref[0, h0].astype(jnp.float32)
        k1 = k_ref[0, h1].astype(jnp.float32)
        v0 = v_ref[0, h0].astype(jnp.float32)
        v1 = v_ref[0, h1].astype(jnp.float32)
        z = jnp.zeros_like(k0)
        qp = jnp.concatenate([q0, q1], axis=1)               # [L, 2D]
        kb = jnp.concatenate(
            [jnp.concatenate([k0, z], axis=1),
             jnp.concatenate([z, k1], axis=1)], axis=0)      # [2L, 2D]
        vb = jnp.concatenate(
            [jnp.concatenate([v0, z], axis=1),
             jnp.concatenate([z, v1], axis=1)], axis=0)      # [2L, 2D]
        s = jax.lax.dot_general(
            qp, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale      # [L, 2L]
        if b_ref is not None:
            s = s + bias2
        head0 = lanes2 < l
        # PER-HEAD row maxima (a shared max underflows the weaker head's
        # probability sum to 0 when the heads' row maxima differ by ~88+,
        # making the post-PV division NaN/Inf — advisor r4)
        m0 = jnp.max(jnp.where(head0, s, -jnp.inf), axis=-1, keepdims=True)
        m1 = jnp.max(jnp.where(head0, -jnp.inf, s), axis=-1, keepdims=True)
        p = jnp.exp(s - jnp.where(head0, m0, m1))
        sum0 = jnp.sum(jnp.where(head0, p, 0.0), axis=-1, keepdims=True)
        sum1 = jnp.sum(jnp.where(head0, 0.0, p), axis=-1, keepdims=True)
        ob = jax.lax.dot_general(
            p, vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # [L, 2D]
        ob = ob / jnp.where(lanesd < d, sum0, sum1)
        o_ref[0, h0] = ob[:, :d].astype(o_ref.dtype)
        o_ref[0, h1] = ob[:, d:].astype(o_ref.dtype)


def _fwd(q, k, v, bias=None):
    b, h, l, d = q.shape
    spec = pl.BlockSpec((1, h, l, d), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    kern = _kernel_paired if h % 2 == 0 else _kernel
    in_specs = [spec, spec, spec]
    args = (q, k, v)
    if bias is not None:
        # [B|1,1,1,L] additive key-pad bias -> [B, 1, L]: the per-program
        # block must slice only LEADING dims (Mosaic wants the last two
        # block dims equal to the array dims or 8/128-aligned)
        b2 = jnp.broadcast_to(bias.reshape(bias.shape[0], 1, l), (b, 1, l))
        in_specs.append(pl.BlockSpec((1, 1, l), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        args += (b2,)
    return pl.pallas_call(
        functools.partial(kern, nh=h, scale=1.0 / (d ** 0.5)),
        grid=(b,),
        in_specs=in_specs,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=_fa._INTERPRET,
    )(*args)


def _kernel_qkv(x_ref, o_ref, *, nh, hd, scale):
    """Packed-layout variant: input [1, L, 3*H*D] — the fused qkv
    projection's output with NO transpose materialized; heads are LANE
    ranges (q_h = lanes [h*D, (h+1)*D)). Output [1, L, H*D] feeds the out
    projection directly. Same paired block-diagonal math as
    _kernel_paired."""
    l = x_ref.shape[1]
    d = hd
    lanes2 = jax.lax.broadcasted_iota(jnp.int32, (l, 2 * l), 1)
    lanesd = jax.lax.broadcasted_iota(jnp.int32, (l, 2 * d), 1)

    def head(kind, h):
        off = kind * nh * d + h * d
        return x_ref[0, :, off:off + d].astype(jnp.float32)

    for hp in range(nh // 2):
        h0, h1 = 2 * hp, 2 * hp + 1
        # a PAIR of adjacent heads is one contiguous 2D-lane slice
        qp = x_ref[0, :, h0 * d:(h1 + 1) * d].astype(jnp.float32)
        k0, k1 = head(1, h0), head(1, h1)
        v0, v1 = head(2, h0), head(2, h1)
        z = jnp.zeros_like(k0)
        kb = jnp.concatenate(
            [jnp.concatenate([k0, z], axis=1),
             jnp.concatenate([z, k1], axis=1)], axis=0)      # [2L, 2D]
        vb = jnp.concatenate(
            [jnp.concatenate([v0, z], axis=1),
             jnp.concatenate([z, v1], axis=1)], axis=0)
        s = jax.lax.dot_general(
            qp, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale      # [L, 2L]
        head0 = lanes2 < l
        # per-head row maxima — see _kernel_paired
        m0 = jnp.max(jnp.where(head0, s, -jnp.inf), axis=-1, keepdims=True)
        m1 = jnp.max(jnp.where(head0, -jnp.inf, s), axis=-1, keepdims=True)
        p = jnp.exp(s - jnp.where(head0, m0, m1))
        sum0 = jnp.sum(jnp.where(head0, p, 0.0), axis=-1, keepdims=True)
        sum1 = jnp.sum(jnp.where(head0, 0.0, p), axis=-1, keepdims=True)
        ob = jax.lax.dot_general(
            p, vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # [L, 2D]
        ob = ob / jnp.where(lanesd < d, sum0, sum1)
        o_ref[0, :, h0 * d:(h1 + 1) * d] = ob.astype(o_ref.dtype)


def _fwd_qkv(x3, nh):
    b, l, w = x3.shape
    hd = w // (3 * nh)
    in_spec = pl.BlockSpec((1, l, w), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, l, w // 3), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel_qkv, nh=nh, hd=hd,
                          scale=1.0 / (hd ** 0.5)),
        grid=(b,),
        in_specs=[in_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, l, w // 3), x3.dtype),
        interpret=_fa._INTERPRET,
    )(x3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def short_attention_qkv(x3, nh):
    """Attention over the PACKED fused-qkv projection output
    [B, L, 3*H*D] (q | k | v lane-concatenated, heads as D-lane ranges)
    -> [B, L, H*D]. No [B,H,L,D] transpose ever materializes in HBM —
    the round trip the generic path pays twice per layer. ``nh`` must be
    even (use ``short_attention`` otherwise)."""
    return _fwd_qkv(x3, nh)


def _fwd_qkv_rule(x3, nh):
    return _fwd_qkv(x3, nh), (x3,)


def _bwd_qkv_rule(nh, res, do):
    (x3,) = res
    b, l, w = x3.shape
    hd = w // (3 * nh)
    x5 = x3.reshape(b, l, 3, nh, hd).transpose(0, 2, 3, 1, 4)
    q, k, v = x5[:, 0], x5[:, 1], x5[:, 2]      # [B, H, L, D]
    do4 = do.reshape(b, l, nh, hd).transpose(0, 2, 1, 3)
    dq, dk, dv = _bwd_rule((q, k, v), do4)
    dx = jnp.stack([dq, dk, dv], axis=1)        # [B, 3, H, L, D]
    return (dx.transpose(0, 3, 1, 2, 4).reshape(b, l, w),)


short_attention_qkv.defvjp(_fwd_qkv_rule, _bwd_qkv_rule)


@jax.custom_vjp
def short_attention(q, k, v):
    """softmax(q k^T / sqrt(d)) v for [B, H, L, D] short sequences."""
    return _fwd(q, k, v)


def _fwd_rule(q, k, v):
    return _fwd(q, k, v), (q, k, v)


def _kernel_bwd(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                nh, scale):
    """In-kernel backward (r5): recomputes the per-head [L, L]
    probabilities in VMEM and runs the five backward contractions on the
    MXU — the XLA-recompute VJP materialized s/p/dp/ds in HBM and was 30%
    of a ViT-base training step (benchmarks/encoder_train_bench.py).
    Unpaired heads: the backward's five distinct contractions don't share
    the forward's block-diagonal packing cleanly; the MXU win here is
    keeping the [L, L] intermediates out of HBM."""
    for h in range(nh):
        qh = q_ref[0, h].astype(jnp.float32)      # [L, D]
        kh = k_ref[0, h].astype(jnp.float32)
        vh = v_ref[0, h].astype(jnp.float32)
        doh = do_ref[0, h].astype(jnp.float32)
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale       # [L, L]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        dv = jax.lax.dot_general(                             # p^T do
            p, doh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)               # [L, D]
        dp = jax.lax.dot_general(                             # do v^T
            doh, vh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)               # [L, L]
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq = jax.lax.dot_general(
            ds, kh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale       # [L, D]
        dk = jax.lax.dot_general(                             # ds^T q
            ds, qh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale       # [L, D]
        dq_ref[0, h] = dq.astype(dq_ref.dtype)
        dk_ref[0, h] = dk.astype(dk_ref.dtype)
        dv_ref[0, h] = dv.astype(dv_ref.dtype)


def _bwd_pallas(q, k, v, do):
    b, h, l, d = q.shape
    spec = pl.BlockSpec((1, h, l, d), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    sd = jax.ShapeDtypeStruct(q.shape, q.dtype)
    return pl.pallas_call(
        functools.partial(_kernel_bwd, nh=h, scale=1.0 / (d ** 0.5)),
        grid=(b,),
        in_specs=[spec] * 4,
        out_specs=(spec, spec, spec),
        out_shape=(sd, sd, sd),
        interpret=_fa._INTERPRET,
    )(q, k, v, do)


def _bwd_math(q, k, v, do, bias=None):
    scale = 1.0 / (q.shape[-1] ** 0.5)
    qf, kf, vf, dof = (x.astype(jnp.float32) for x in (q, k, v, do))
    s = jnp.einsum("bhqd,bhkd->bhqk", qf, kf,
                   preferred_element_type=jnp.float32) * scale
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, dof)
    dp = jnp.einsum("bhqd,bhkd->bhqk", dof, vf)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, kf) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, qf) * scale
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), ds)


def _bwd_rule(res, do):
    q, k, v = res
    # the backward holds 7 q-shaped arrays double-buffered (vs the
    # forward's 4) plus [L,L] fp32 temporaries: gate tighter than the
    # forward or Mosaic OOMs near the forward's VMEM cap
    _, h, l, d = q.shape
    blk = h * l * d * q.dtype.itemsize
    fits = blk <= 640 * 1024 and 14 * blk + 6 * l * l * 4 <= 12 * 2**20
    if _fa._INTERPRET:
        return _bwd_pallas(q, k, v, do)

    def _xla(qq, kk, vv, dd):
        return _bwd_math(qq, kk, vv, dd)[:3]

    if not fits:
        return _bwd_math(q, k, v, do)[:3]
    return jax.lax.platform_dependent(q, k, v, do, tpu=_bwd_pallas,
                                      default=_xla)


short_attention.defvjp(_fwd_rule, _bwd_rule)


@jax.custom_vjp
def short_attention_bias(q, k, v, bias):
    """``softmax(q k^T/sqrt(d) + bias) v`` with an additive KEY-PADDING
    bias [B|1, 1, 1, L] — the reference encoder's ``(1-m)*finfo.min`` mask
    (``models/encoder.py:161-164``). The [L, 2L] scores already live in
    VMEM; the bias add is one broadcast VPU op per head pair."""
    return _fwd(q, k, v, bias)


def _fwd_rule_bias(q, k, v, bias):
    return _fwd(q, k, v, bias), (q, k, v, bias)


def _bwd_rule_bias(res, do):
    q, k, v, bias = res
    dq, dk, dv, ds = _bwd_math(q, k, v, do, bias)
    dbias = jnp.sum(ds, axis=(1, 2), keepdims=True)        # [B,1,1,L]
    if bias.shape[0] == 1:
        dbias = jnp.sum(dbias, axis=0, keepdims=True)
    return dq, dk, dv, dbias.astype(bias.dtype)


short_attention_bias.defvjp(_fwd_rule_bias, _bwd_rule_bias)
