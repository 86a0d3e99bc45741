"""Batched embedding serving (the vLLM ``LLM.embed`` / ``--task embed``
role): pooled hidden-state vectors for retrieval/reranking workloads.

No KV cache is involved — this is bucketed batch inference with static
shapes: prompts are padded to a length bucket and packed into fixed-width
batches (bounded compile count, same discipline as the generation
engine's prefill). Works with any model whose ``apply(params, ids, mask)``
returns hidden states (``EncoderModel``, ``EncoderForMaskedLM``,
``DecoderModel``, ``ModelForCausalLM``).

Pooling (per the common sentence-embedding conventions):
- ``"mean"``: mask-weighted mean over real tokens (sentence-transformers
  default; the natural choice for encoders)
- ``"cls"``: first-token vector (BERT [CLS] — the reference's
  classification head pools this way, ``vyom-ai-classification.ipynb``)
- ``"last"``: last real token (decoder-only embedding models)
"""

from functools import partial
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["embed_batch"]


def _hidden(out):
    h = getattr(out, "hidden_state", None)
    if h is None:
        h = out.logits   # EncoderModel: the `logits` field IS the hidden
    return h


@partial(jax.jit, static_argnums=(0, 3))
def _embed_jit(model, params, ids, pooling, mask):
    out = model.apply(params, ids, mask)
    h = _hidden(out).astype(jnp.float32)                     # [B, L, D]
    m = mask.astype(jnp.float32)
    if pooling == "mean":
        pooled = (h * m[..., None]).sum(1) / jnp.maximum(
            m.sum(1, keepdims=True), 1.0)
    elif pooling == "cls":
        pooled = h[:, 0]
    elif pooling == "last":
        last = jnp.maximum(m.sum(1).astype(jnp.int32) - 1, 0)
        pooled = jnp.take_along_axis(h, last[:, None, None], axis=1)[:, 0]
    else:
        raise ValueError(f"unknown pooling {pooling!r}")
    return pooled


def embed_batch(model, params, prompts: Sequence[Sequence[int]], *,
                pooling: str = "mean", normalize: bool = True,
                buckets: Sequence[int] = (32, 64, 128, 256, 512),
                batch_size: int = 8, pad_id: int = 0) -> List[np.ndarray]:
    """Embed token-id prompts; returns one fp32 vector per prompt, in
    order. Prompts are grouped by length bucket and run in fixed
    [batch_size, bucket] device batches (at most ``len(buckets)`` compiled
    shapes; short final groups are lane-padded, not recompiled)."""
    if pooling not in ("mean", "cls", "last"):
        raise ValueError(f"unknown pooling {pooling!r}")
    prompts = [list(map(int, p)) for p in prompts]
    if any(not p for p in prompts):
        raise ValueError("empty prompt")
    cap = buckets[-1]
    if any(len(p) > cap for p in prompts):
        raise ValueError(f"prompt exceeds the largest bucket {cap}")

    def bucket_of(n):
        return next(b for b in buckets if n <= b)

    order = sorted(range(len(prompts)), key=lambda i: len(prompts[i]))
    results: List[np.ndarray] = [None] * len(prompts)        # type: ignore
    group: List[int] = []

    def flush():
        if not group:
            return
        b = bucket_of(max(len(prompts[i]) for i in group))
        ids = np.full((batch_size, b), pad_id, np.int32)
        mask = np.zeros((batch_size, b), np.int32)
        for lane, i in enumerate(group):
            ids[lane, :len(prompts[i])] = prompts[i]
            mask[lane, :len(prompts[i])] = 1
        pooled = np.asarray(_embed_jit(model, params, jnp.asarray(ids),
                                       pooling, jnp.asarray(mask)))
        for lane, i in enumerate(group):
            v = pooled[lane]
            if normalize:
                v = v / max(float(np.linalg.norm(v)), 1e-12)
            results[i] = v
        group.clear()

    cur_bucket = None
    for i in order:
        b = bucket_of(len(prompts[i]))
        if group and (b != cur_bucket or len(group) == batch_size):
            flush()
        cur_bucket = b
        group.append(i)
    flush()
    return results
