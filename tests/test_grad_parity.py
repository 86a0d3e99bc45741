"""Cross-framework GRADIENT parity vs torch autograd (VERDICT r3 #6).

The reference's headline artifact is hand-derived backward math
(``/root/reference/Examples/vyomai-fused-kernals-2t4.ipynb`` cell 0:
``LinearFunction``, ``RMSNormFn``, ``ScaledDotProductAttention`` with
``dS = P * (dP - rowsum(dO * O))``, ``MyLinearCrossEntropy``'s
softmax-minus-onehot grad). Forward parity alone leaves "the fused training
path computes the same gradients" resting on XLA autodiff; these tests
compare LOSS GRADIENTS leaf-by-leaf against torch autograd on the imported
reference models, at fp64 where both engines agree to ~1e-7:

- encoder MLM loss (ignore_index CE) — XLA logits path AND the fused
  chunked lm-head-CE (``ops/fused.lm_head_ce_loss``),
- decoder CLM loss (shifted CE) — both paths again,
- attention input grads (dq/dk/dv) — XLA path at fp64 strict, and the
  Pallas flash kernel (interpret mode off-TPU) at its fp32 accumulation
  tolerance.

Torch grads are mapped into the JAX param layout by running the SAME
``interop.torch_import`` key-mapping over a gradient state-dict — the
mapping is purely transposes/stacks, so it is gradient-transparent.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import vyomai_tpu as vt
from vyomai_tpu.core import nn as cnn
from vyomai_tpu.interop import torch_import as ti
from vyomai_tpu.ops import flash_attention as fa
from vyomai_tpu.ops.fused import lm_head_ce_loss

from test_parity_torch import CFG, IDS, MASK, RefConfig, _to_f64

ON_TPU = jax.default_backend() == "tpu"

# ~30% of positions labeled, rest ignore_index (the MLM regime); CLM uses
# the full ids. Fixed pattern so both frameworks see identical targets.
LABELS = np.where(np.arange(IDS.size).reshape(IDS.shape) % 3 == 0,
                  IDS, -100).astype(np.int64)


def _grads_sd(ref):
    """Gradient state-dict keyed like ``state_dict()`` (tied params appear
    under every name; missing grads — unused params — become zeros)."""
    out = {}
    for name, p in ref.named_parameters(remove_duplicate=False):
        g = p.grad if p.grad is not None else torch.zeros_like(p)
        out[name] = g.detach().double().numpy()
    return out


def _assert_tree_close(got, want, atol):
    flat_g = jax.tree_util.tree_flatten_with_path(got)[0]
    flat_w = jax.tree_util.tree_flatten_with_path(want)[0]
    assert len(flat_g) == len(flat_w)
    for (pg, g), (pw, w) in zip(flat_g, flat_w):
        assert pg == pw
        scale = max(float(np.abs(w).max()), 1.0)
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=atol * scale,
            err_msg=jax.tree_util.keystr(pg))


def _mean_ce(logits, labels):
    """Mean CE over labels != -100 — F.cross_entropy(ignore_index=-100)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    safe = jnp.maximum(labels, 0)
    tok = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    valid = (labels != -100).astype(logp.dtype)
    return -(tok * valid).sum() / valid.sum()


def _head_hidden(head, hidden, eps):
    x = cnn.gelu(cnn.linear(head["dense"], hidden))
    return cnn.layer_norm(head["layer_norm"], x, eps=eps)


def _patch_rope_fp64(model):
    """Give the JAX model the reference's EXACT rope table at fp64.

    The reference computes ``inv_freq`` in fp32 at module build
    (``positional_embeddings.py:130``) and ``.double()`` merely casts that
    rounding into fp64; our table is computed in fp32 end-to-end. For
    1e-6-grade gradient parity the tables must carry identical rounding,
    so reconstruct the torch one (fp32 inv_freq -> fp64 outer product).
    Must run inside ``jax.enable_x64``."""
    head_dim = CFG.hidden_size // CFG.num_attention_heads
    inv = 1.0 / (10000 ** (torch.arange(0, head_dim, 2).float() / head_dim))
    t = torch.arange(CFG.max_position_embeddings).double()
    freqs = torch.einsum("i,j->ij", t, inv.double()).numpy()
    model.emb_freq = jnp.asarray(freqs[None])


@pytest.mark.parametrize("pe,at", [("absolute", None), ("rope", "gqa")])
def test_mlm_loss_grad_parity(pe, at):
    from VyomAI import EncoderForMaskedLM as RefMLM
    torch.manual_seed(0)
    ref = RefMLM(RefConfig(), pos_embedding_type=pe,
                 attention_type=at).double().eval()
    logits = ref(torch.tensor(IDS), torch.tensor(MASK)).logits
    loss = F.cross_entropy(logits.reshape(-1, CFG.vocab_size),
                           torch.tensor(LABELS).reshape(-1),
                           ignore_index=-100)
    loss.backward()
    g_ref = ti.import_encoder_for_mlm(_grads_sd(ref), CFG, pe)

    model = vt.EncoderForMaskedLM(CFG, pe, at)
    params = ti.import_encoder_for_mlm(ti.state_dict_to_numpy(ref), CFG, pe)
    with jax.enable_x64(True):
        if pe == "rope":
            _patch_rope_fp64(model.encoder)
        p64 = _to_f64(params)
        ids, mask, lab = (jnp.asarray(IDS), jnp.asarray(MASK),
                          jnp.asarray(LABELS))

        def loss_xla(p):
            return _mean_ce(model.apply(p, ids, mask).logits, lab)

        l1, g1 = jax.value_and_grad(loss_xla)(p64)
        assert abs(float(l1) - float(loss.detach())) < 1e-9
        _assert_tree_close(g1, g_ref, atol=1e-6)

        def loss_fused(p):
            h = model.encoder.apply(p["encoder"], ids, mask).logits
            hd = _head_hidden(p["lm_head"], h, CFG.layer_norm_eps)
            return lm_head_ce_loss(hd, p["lm_head"]["decoder"]["kernel"],
                                   p["lm_head"]["decoder"]["bias"], lab,
                                   chunk_size=8)

        l2, g2 = jax.value_and_grad(loss_fused)(p64)
        assert abs(float(l2) - float(loss.detach())) < 1e-9
        _assert_tree_close(g2, g_ref, atol=1e-6)


@pytest.mark.parametrize("pe,at", [("rope", "gqa"), ("absolute", None)])
def test_clm_loss_grad_parity(pe, at):
    from VyomAI import DecoderModel as RefDecoder
    torch.manual_seed(0)
    ref = RefDecoder(RefConfig(), pos_embedding_type=pe,
                     attention_type=at).double().eval()
    ids_t = torch.tensor(IDS)
    logits = ref(ids_t, torch.ones_like(ids_t, dtype=torch.float64)).logits
    loss = F.cross_entropy(
        logits[:, :-1].reshape(-1, CFG.vocab_size),
        ids_t[:, 1:].reshape(-1))
    loss.backward()
    g_ref = ti.import_decoder(_grads_sd(ref), CFG, pe)

    model = vt.DecoderModel(CFG, pe, attention_type=at)
    params = ti.import_decoder(ti.state_dict_to_numpy(ref), CFG, pe)
    with jax.enable_x64(True):
        if pe == "rope":
            _patch_rope_fp64(model)
        p64 = _to_f64(params)
        ids = jnp.asarray(IDS)
        ones = jnp.ones_like(ids)

        def loss_xla(p):
            lg = model.apply(p, ids, ones).logits
            return _mean_ce(lg[:, :-1], ids[:, 1:])

        l1, g1 = jax.value_and_grad(loss_xla)(p64)
        assert abs(float(l1) - float(loss.detach())) < 1e-9
        _assert_tree_close(g1, g_ref, atol=1e-6)

        def loss_fused(p):
            out = model.apply(p, ids, ones)
            hd = _head_hidden(p["lm_head"], out.hidden_state,
                              CFG.layer_norm_eps)
            return lm_head_ce_loss(hd, p["lm_head"]["decoder"]["kernel"],
                                   p["lm_head"]["decoder"]["bias"], ids,
                                   shift=True, chunk_size=8)

        l2, g2 = jax.value_and_grad(loss_fused)(p64)
        assert abs(float(l2) - float(loss.detach())) < 1e-9
        _assert_tree_close(g2, g_ref, atol=1e-6)


def _torch_sdpa_grads(q, k, v, causal, dtype=torch.float64):
    tq, tk, tv = (torch.tensor(np.asarray(x), dtype=dtype,
                               requires_grad=True) for x in (q, k, v))
    scale = tq.shape[-1] ** -0.5
    scores = (tq @ tk.transpose(-1, -2)) * scale
    if causal:
        L = scores.shape[-1]
        fut = torch.triu(torch.ones(L, L, dtype=torch.bool), diagonal=1)
        scores = scores.masked_fill(fut, float("-inf"))
    out = scores.softmax(-1) @ tv
    (out.double() ** 2).sum().backward()
    return (out.detach().numpy(), tq.grad.numpy(), tk.grad.numpy(),
            tv.grad.numpy())


def test_attention_grads_vs_torch():
    """dq/dk/dv of sum(attn^2) vs torch autograd: the XLA path strict at
    fp64, the Pallas flash kernel (fp32 accumulation, interpret mode
    off-TPU) at its documented 5e-4-relative tolerance."""
    B, H, L, D = 2, 4, 256, 64
    rng = np.random.default_rng(0)
    q, k, v = (rng.standard_normal((B, H, L, D)) for _ in range(3))
    ref_out, *ref_g = _torch_sdpa_grads(q, k, v, causal=True)

    from vyomai_tpu.layers.attention import _sdpa_xla
    with jax.enable_x64(True):
        def loss64(q, k, v):
            return jnp.sum(_sdpa_xla(q, k, v, causal=True) ** 2)
        g64 = jax.grad(loss64, argnums=(0, 1, 2))(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
        for g, w in zip(g64, ref_g):
            scale = max(float(np.abs(w).max()), 1.0)
            np.testing.assert_allclose(np.asarray(g), w,
                                       atol=1e-8 * scale)

    if not ON_TPU:
        fa.set_interpret(True)
    try:
        qf, kf, vf = (jnp.asarray(x, dtype=jnp.float32) for x in (q, k, v))

        def loss_flash(q, k, v):
            return jnp.sum(fa.flash_attention(q, k, v, causal=True) ** 2)

        # "highest" matters on CPU: default-precision fp32 dots may run
        # through oneDNN bf16 fastmath, which swamps the 5e-4 tolerance
        with jax.default_matmul_precision("highest"):
            gf = jax.grad(loss_flash, argnums=(0, 1, 2))(qf, kf, vf)
    finally:
        fa.set_interpret(False)
    for g, w in zip(gf, ref_g):
        scale = max(float(np.abs(w).max()), 1.0)
        np.testing.assert_allclose(np.asarray(g, dtype=np.float64), w,
                                   atol=5e-4 * scale)
