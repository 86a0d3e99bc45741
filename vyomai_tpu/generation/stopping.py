"""Stopping criteria for host-driven generation (reference
``Examples/ciphar-gocr2-0.ipynb``: ``KeywordsStoppingCriteria`` — stop when
the last token is a single-token keyword or when any keyword substring
appears in the decoded continuation).

The library's fully-jitted ``generate`` loops stop on a single EOS id on
device; keyword/substring stopping needs detokenization, which is a host
concern by construction. :func:`generate_until` runs the same cached
single-token decode as ``generate`` but surfaces each step to the criteria
— one compiled program per (model, buffer length), reused across calls.
"""

from functools import partial
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class KeywordsStoppingCriteria:
    """Reference-compatible keyword stopper.

    ``tokenizer`` needs ``__call__(text) -> ids`` (a list, or an object with
    ``.input_ids``) and, for substring matching, ``decode(ids) -> str``.
    Keywords that tokenize to one id are matched on the last token
    directly; otherwise the decoded continuation is searched.
    """

    def __init__(self, keywords: Sequence[str], tokenizer, input_ids):
        self.keywords = list(keywords)
        self.tokenizer = tokenizer
        self.keyword_ids: List[int] = []
        for kw in self.keywords:
            ids = tokenizer(kw)
            ids = getattr(ids, "input_ids", ids)
            if isinstance(ids, (list, tuple)) and len(ids) == 1:
                self.keyword_ids.append(int(ids[0]))
        self.start_len = int(np.asarray(input_ids).shape[1])

    def __call__(self, output_ids, scores=None, **kw) -> bool:
        out = np.asarray(output_ids)
        if out.shape[1] <= self.start_len:
            return False
        if int(out[0, -1]) in self.keyword_ids:
            return True
        if hasattr(self.tokenizer, "decode"):
            text = self.tokenizer.decode(out[0, self.start_len:].tolist())
            return any(kw_ in text for kw_ in self.keywords)
        return False


@partial(jax.jit, static_argnums=(0,))
def _prefill_step(model, params, ids, cache):
    out = model.apply(params, ids, cache=cache, start_pos=0)
    return out.logits[:, -1], out.kv_cache


@partial(jax.jit, static_argnums=(0,))
def _decode_step(model, params, tok, cache, pos):
    out = model.apply(params, tok, cache=cache, start_pos=pos)
    return out.logits[:, -1], out.kv_cache


def generate_until(model, params, input_ids, *,
                   stopping_criteria: Optional[Callable] = None,
                   max_new_tokens: int = 128,
                   eos_token_id: Optional[int] = None,
                   sample_fn: Optional[Callable] = None,
                   cache=None, prefill_fn=None):
    """Greedy (or ``sample_fn``-driven) cached decode with host-side
    stopping criteria — the GOT-OCR2 ``generate(stopping_criteria=[...])``
    flow. Batch size 1. Returns the full token row (prompt + generated).

    ``prefill_fn(params, input_ids, cache) -> (last_logits, cache)`` lets
    multimodal wrappers (GOT-OCR2: image embeds spliced into the prompt)
    supply their own prefill; text-only models use the model protocol.
    """
    from .sampling import normalize_eos
    if eos_token_id is None:
        # same config fallback as beam_search_generate: a model that
        # declares eos_token_id should stop on it by default
        eos_token_id = getattr(model.config, "eos_token_id", None)
    _, eos_ids = normalize_eos(eos_token_id)
    input_ids = jnp.asarray(input_ids, dtype=jnp.int32)
    assert input_ids.shape[0] == 1, "generate_until is a batch-1 driver"
    prompt_len = input_ids.shape[1]
    total_len = prompt_len + max_new_tokens
    if cache is None:
        param_dtype = jax.tree_util.tree_leaves(params)[0].dtype
        cache = model.init_cache(batch_size=1, max_len=total_len,
                                 dtype=param_dtype)
    if prefill_fn is None:
        logits, cache = _prefill_step(model, params, input_ids, cache)
    else:
        logits, cache = prefill_fn(params, input_ids, cache)

    tokens = input_ids
    for i in range(max_new_tokens):
        if sample_fn is None:
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        else:
            nxt = sample_fn(logits).astype(jnp.int32)
        tokens = jnp.concatenate([tokens, nxt[:, None]], axis=1)
        t = int(nxt[0])
        if t in eos_ids:
            break
        if stopping_criteria is not None and stopping_criteria(tokens):
            break
        if i + 1 < max_new_tokens:
            logits, cache = _decode_step(model, params, nxt[:, None], cache,
                                         prompt_len + i)
    return tokens
