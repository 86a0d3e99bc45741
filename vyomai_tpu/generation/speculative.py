"""Speculative decoding (reference ``VyomAI/speculative_decoding.py``).

Leviathan-style rejection sampling: the drafter proposes ``gamma`` tokens
one at a time (cached), the target scores them in one batched call, drafts
are accepted while ``r_i <= p_i / q_i``, and on rejection an adjusted
residual distribution ``norm(max(0, p - q))`` is sampled.

TPU-first: drafter/target steps run as jitted static-shape programs over
the static KV cache. Cache rollback — the reference's ``trim_cache`` tail
slicing/zeroing (``speculative_decoding.py:31-71``) — is a free ``length``
rewind here (stale tail entries are masked by position validity, see
``layers/kv_cache.py``). The accept/reject loop itself is host-side (its
trip count is data-dependent by construction); per-iteration device work is
a handful of jitted calls. Chunked drafter catch-up re-uses at most
``gamma + 2`` distinct compiled shapes.
"""

from functools import partial
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..layers.kv_cache import with_length
from .sampling import LogitsProcessor, NucleusProcessor


def _rate(accepted: float, speculated: float) -> float:
    """Acceptance rate; 0.0 when no round ever speculated (e.g.
    ``max_gen_len <= 2`` with ``first_target`` — ADVICE r1)."""
    return accepted / speculated if speculated else 0.0


def norm_fn(x, eps: float = 0.0):
    """norm(max(0, x)) — adjusted residual distribution
    (reference ``speculative_decoding.py:73-82``)."""
    x_max = jnp.where(x > 0, x, jnp.zeros_like(x))
    return x_max / jnp.sum(x_max, axis=-1, keepdims=True)


@partial(jax.jit, static_argnums=(0, 4))
def _forward_chunk(model, params, chunk, start_pos, chunk_len: int, cache):
    """Run ``chunk_len`` tokens through the cached model at ``start_pos``.
    One compiled program per distinct ``chunk_len``."""
    out = model.apply(params, chunk, cache=cache, start_pos=start_pos)
    return out.logits, out.kv_cache


def speculative_generate(
    inputs,
    drafter_model, drafter_params,
    target_model, target_params,
    gamma: int = 5,
    logits_processor: Optional[LogitsProcessor] = None,
    max_gen_len: int = 128,
    eos_tokens_id: Union[int, List[int]] = 2,
    pad_token_id: int = 2,
    use_cache: bool = True,
    skip_sample_adjustment: bool = False,
    first_target: bool = True,
    rng=None,
) -> Tuple[List[int], float]:
    """Generate with speculative decoding; batch size 1.

    Returns ``(generated_token_list, acceptance_rate)`` — same contract as
    the reference (``speculative_decoding.py:85-245``).
    """
    if logits_processor is None:
        logits_processor = NucleusProcessor(temperature=0.2, top_p=0.9)
    if rng is None:
        rng = jax.random.PRNGKey(0)

    stop_tokens = np.atleast_1d(np.asarray(eos_tokens_id))
    inputs = np.asarray(inputs)
    assert inputs.shape[0] == 1, "Speculative decoding only supports batch size 1."
    assert drafter_model.config.vocab_size == target_model.config.vocab_size

    prompt_len = inputs.shape[1]
    max_seq = getattr(target_model.config, "max_position_embeddings", 512)
    total_len = min(max_seq, prompt_len + max_gen_len)
    input_ids = np.full((1, total_len), pad_token_id, dtype=np.int64)
    input_ids[0, :prompt_len] = inputs[0]

    vocab = target_model.config.vocab_size
    drafter_cache = drafter_model.init_cache(batch_size=1, max_len=total_len)
    target_cache = target_model.init_cache(batch_size=1, max_len=total_len)
    drafter_pos = 0  # tokens already in the drafter cache
    target_pos = 0

    drafts_accepted, drafts_speculated = 0.0, 0.0
    current = prompt_len

    def run(model, params, cache, cache_pos, upto):
        """Feed tokens [cache_pos, upto) through the cached model."""
        chunk_len = upto - cache_pos
        chunk = jnp.asarray(input_ids[:, cache_pos:upto])
        logits, cache = _forward_chunk(model, params, chunk,
                                       cache_pos, chunk_len, cache)
        return logits, cache, upto

    if first_target:
        logits, target_cache, target_pos = run(
            target_model, target_params, target_cache, 0, current)
        rng, r = jax.random.split(rng)
        p = logits_processor(logits[0, -1])
        t = int(logits_processor.sample(p, r)[0])
        input_ids[0, current] = t
        current += 1
        if np.isin(t, stop_tokens):
            return input_ids[0, prompt_len:current].tolist(), 0.0

    while current < total_len:
        corrected_gamma = min(gamma, total_len - current - 1)
        if corrected_gamma <= 0:
            # No room to speculate: plain target step for the final slot.
            logits, target_cache, target_pos = run(
                target_model, target_params, target_cache, target_pos, current)
            rng, r = jax.random.split(rng)
            p_last = logits_processor(logits[0, -1])
            x = int(logits_processor.sample(p_last, r)[0])
            input_ids[0, current] = x
            current += 1
            if np.isin(x, stop_tokens):
                break
            continue
        q = np.zeros((corrected_gamma, vocab), dtype=np.float32)

        # drafter proposes corrected_gamma tokens (catch up, then 1/step)
        for k in range(corrected_gamma):
            logits, drafter_cache, drafter_pos = run(
                drafter_model, drafter_params, drafter_cache, drafter_pos,
                current + k)
            rng, r = jax.random.split(rng)
            draft_probs = logits_processor(logits[0, -1])
            q[k] = np.asarray(draft_probs)
            xi = int(logits_processor.sample(draft_probs, r)[0])
            input_ids[0, current + k] = xi
        drafts_speculated += corrected_gamma

        # target scores all drafts in one call
        logits, target_cache, target_pos = run(
            target_model, target_params, target_cache, target_pos,
            current + corrected_gamma)
        # logits rows for positions current-1 .. current+gamma-2
        tail = np.asarray(logits[0])
        offset = target_pos - tail.shape[0]
        rows = [current - 1 - offset + i for i in range(corrected_gamma)]
        p = np.stack([np.asarray(logits_processor(jnp.asarray(tail[rr])))
                      for rr in rows])

        # rejection sampling
        rng, r = jax.random.split(rng)
        rand = np.asarray(jax.random.uniform(r, (corrected_gamma,)))
        n = corrected_gamma
        for i in range(corrected_gamma):
            tok = input_ids[0, current + i]
            if rand[i] > p[i, tok] / max(q[i, tok], 1e-20):
                n = i
                break
        drafts_accepted += n

        # EOS inside accepted drafts?
        accepted = input_ids[0, current:current + n]
        hits = np.nonzero(np.isin(accepted, stop_tokens))[0]
        if hits.size > 0:
            stop = int(hits[0])
            return (input_ids[0, prompt_len:current + stop + 1].tolist(),
                    _rate(drafts_accepted, drafts_speculated))

        if n == corrected_gamma:
            # all accepted: sample one more from the target's last row
            p_p = np.asarray(logits_processor(
                jnp.asarray(tail[current + corrected_gamma - 1 - offset])))
        else:
            # roll back both caches to the accepted prefix (free rewind)
            if use_cache:
                drafter_cache = with_length(drafter_cache, current + n)
                drafter_pos = current + n
                target_cache = with_length(target_cache, current + n)
                target_pos = current + n
            if not skip_sample_adjustment:
                p_p = np.asarray(norm_fn(jnp.asarray(p[n] - q[n])))
            else:
                p_p = p[n]
        rng, r = jax.random.split(rng)
        x = int(logits_processor.sample(jnp.asarray(p_p), r)[0])

        input_ids[0, current + n:current + corrected_gamma] = pad_token_id
        input_ids[0, current + n] = x
        current += n + 1

        if np.isin(x, stop_tokens):
            return (input_ids[0, prompt_len:current].tolist(),
                    _rate(drafts_accepted, drafts_speculated))

    return (input_ids[0, prompt_len:].tolist(),
            _rate(drafts_accepted, drafts_speculated))
