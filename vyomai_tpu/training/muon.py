"""Muon optimizer — momentum orthogonalized by Newton-Schulz (beyond
reference).

The reference's training recipes are all AdamW + cosine + clip
(`/root/reference/Examples/*.ipynb` main() cells); this adds the Muon
optimizer (Jordan et al. 2024, https://kellerjordan.github.io/posts/muon/)
as an optax-compatible transform. Muon replaces Adam's per-coordinate
second-moment scaling on the *matrix* parameters with an orthogonalized
momentum step: the update for a 2-D kernel is (approximately) the nearest
semi-orthogonal matrix UVᵀ of the momentum buffer's SVD — every singular
direction moves at the same rate, which empirically trains transformers
faster per step AND per FLOP at small-to-mid scale.

Why this is a natural TPU optimizer: the orthogonalization is computed by
five Newton-Schulz iterations — three matmuls each, run in bf16 — so the
optimizer step itself rides the MXU (Adam's elementwise ops are
VPU/bandwidth-bound). For a [H, 4H] FFN kernel the NS cost is
~15 · H³ FLOPs per step, a rounding error next to the forward pass over a
batch (NS has no batch dimension).

Partitioning follows the Muon paper's recipe, expressed over this
package's param-tree conventions (`core/nn.py`):

- ``"kernel"`` leaves of ndim 2 (``[in, out]`` linears) and ndim 3
  (``[L, in, out]`` scan-stacked layers, vmapped) → Muon;
- everything else — embeddings (``"weight"``), biases, norm gains, LoRA
  factors — → AdamW, as do kernels under any name in ``exclude``
  (``lm_head`` by default: the paper keeps input/output embeddings on
  Adam, and tied embeddings are already ``"weight"`` leaves).

Scale convention: updates are multiplied by ``sqrt(max(1, out/in))``
(kernels here are ``[in, out]``, the transpose of torch's ``[out, in]``)
so wide-fan-out layers keep per-output-RMS comparable to Adam's, letting
one learning rate serve every matrix shape.
"""

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

__all__ = ["muon", "scale_by_muon", "newton_schulz_orthogonalize"]

# Quintic iteration coefficients from the Muon reference implementation:
# tuned so the map x -> a·x + b·x³ + c·x⁵ (acting on singular values)
# maximizes convergence slope at 0 while staying bounded on [0, sqrt(3)];
# singular values land in ~[0.7, 1.2] rather than exactly 1 — "orthogonal
# enough", and faster than the cubic by ~2 iterations.
_NS_COEFFS = (3.4445, -4.7750, 2.0315)


def newton_schulz_orthogonalize(g, steps: int = 5, eps: float = 1e-7):
    """Approximate UVᵀ (U, Vᵀ the SVD factors) of a 2-D matrix via the
    quintic Newton-Schulz iteration, in bfloat16 on the MXU.

    The iteration needs spectral norm ≤ 1 to converge, so ``g`` is
    pre-scaled by its Frobenius norm (computed in fp32 — bf16 squares
    underflow for small gradients). Tall matrices are transposed so the
    ``x @ x.T`` Gram matrix is the smaller square. Output dtype bf16
    (callers cast); output shape == input shape.
    """
    assert g.ndim == 2, g.shape
    a, b, c = _NS_COEFFS
    norm = jnp.sqrt(jnp.sum(jnp.square(g.astype(jnp.float32)))) + eps
    x = (g.astype(jnp.float32) / norm).astype(jnp.bfloat16)
    tall = g.shape[0] > g.shape[1]
    if tall:
        x = x.T

    def body(x, _):
        A = x @ x.T
        B = b * A + c * (A @ A)
        return a * x + B @ x, None

    x, _ = jax.lax.scan(body, x, None, length=steps)
    return x.T if tall else x


def _orthogonalize(u, steps: int):
    """Orthogonalize the trailing two dims; leading dims (scan-stacked
    layers) vmapped. Returns ``u``'s dtype, scaled by sqrt(max(1, out/in))
    (see module docstring)."""
    fn = lambda m: newton_schulz_orthogonalize(m, steps=steps)
    for _ in range(u.ndim - 2):
        fn = jax.vmap(fn)
    scale = jnp.sqrt(jnp.maximum(1.0, u.shape[-1] / u.shape[-2]))
    return (fn(u).astype(jnp.float32) * scale).astype(u.dtype)


class MuonState(NamedTuple):
    momentum: Any


def scale_by_muon(momentum: float = 0.95, *, nesterov: bool = True,
                  ns_steps: int = 5) -> optax.GradientTransformation:
    """The bare Muon direction: heavy-ball momentum, then Newton-Schulz
    orthogonalization of each matrix. Compose with
    ``optax.scale_by_learning_rate`` (as :func:`muon` does); apply only to
    2-D/3-D kernel leaves — other shapes assert."""

    def init(params):
        return MuonState(jax.tree.map(jnp.zeros_like, params))

    def update(updates, state, params=None):
        del params
        buf = jax.tree.map(lambda m, g: momentum * m + g,
                           state.momentum, updates)
        eff = (jax.tree.map(lambda g, m: g + momentum * m, updates, buf)
               if nesterov else buf)
        out = jax.tree.map(lambda u: _orthogonalize(u, ns_steps), eff)
        return out, MuonState(buf)

    return optax.GradientTransformation(init, update)


def _label_fn(exclude):
    def labels(params):
        def lab(path, leaf):
            names = [p.key for p in path
                     if isinstance(p, jax.tree_util.DictKey)]
            if any(e in names for e in exclude):
                return "adam"
            if names and names[-1] == "kernel" and leaf.ndim in (2, 3):
                return "muon"
            return "adam"
        return jax.tree_util.tree_map_with_path(lab, params)
    return labels


def muon(learning_rate=0.02, *, momentum: float = 0.95,
         nesterov: bool = True, ns_steps: int = 5,
         adam_learning_rate: Optional[Any] = 3e-4,
         adam_b1: float = 0.9, adam_b2: float = 0.95,
         weight_decay: float = 0.0,
         exclude=("lm_head",)) -> optax.GradientTransformation:
    """Muon for the matrix parameters, AdamW for everything else.

    ``learning_rate`` (float or optax schedule) drives the Muon branch —
    orthogonalized updates have RMS ≈ sqrt(1/max(in,out)) regardless of
    gradient scale, so Muon LRs are ~100× Adam's (0.02 is the paper's
    transformer default). ``adam_learning_rate`` drives the AdamW branch
    (embeddings/biases/norms/excluded kernels). ``weight_decay`` is
    decoupled and applied on both branches. ``exclude``: dict-key names
    whose kernels train under AdamW (``lm_head`` by default — see module
    docstring).
    """
    muon_chain = [scale_by_muon(momentum, nesterov=nesterov,
                                ns_steps=ns_steps)]
    if weight_decay:
        muon_chain.append(optax.add_decayed_weights(weight_decay))
    muon_chain.append(optax.scale_by_learning_rate(learning_rate))
    return optax.multi_transform(
        {"muon": optax.chain(*muon_chain),
         "adam": optax.adamw(adam_learning_rate, b1=adam_b1, b2=adam_b2,
                             weight_decay=weight_decay)},
        _label_fn(tuple(exclude)))
