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
    (reference ``speculative_decoding.py:73-82``). ``eps`` stabilizes the
    denominator against an all-non-positive residual (0/0); the default 0.0
    keeps exact reference numerics."""
    x_max = jnp.where(x > 0, x, jnp.zeros_like(x))
    return x_max / (jnp.sum(x_max, axis=-1, keepdims=True) + eps)


@partial(jax.jit, static_argnums=(0,))
def _forward_chunk(model, params, chunk, start_pos, cache):
    """Run a token chunk through the cached model at ``start_pos``.
    One compiled program per distinct chunk length (jit specializes on
    ``chunk.shape`` — no explicit static length needed)."""
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
    the reference (``speculative_decoding.py:85-245``). ``use_cache`` is
    accepted for API parity; the static cache always threads through (the
    uncached math is identical, see ``layers/kv_cache.py``).
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
    # cap by BOTH models' positional ranges (the on-chip variant already
    # does): driving the drafter past its table silently degrades drafts
    max_seq = min(
        getattr(target_model.config, "max_position_embeddings", 512),
        getattr(drafter_model.config, "max_position_embeddings", 512))
    total_len = min(max_seq, prompt_len + max_gen_len)
    if total_len <= prompt_len:  # prompt at/over the context limit
        return [], 0.0
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
        chunk = jnp.asarray(input_ids[:, cache_pos:upto])
        logits, cache = _forward_chunk(model, params, chunk,
                                       cache_pos, cache)
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
        # logits rows for positions current-1 .. current+gamma-2, processed
        # in ONE batched call (the processors are last-axis-vectorized; a
        # per-row loop would pay gamma dispatch round-trips per round)
        tail = np.asarray(logits[0])
        offset = target_pos - tail.shape[0]
        rows = [current - 1 - offset + i for i in range(corrected_gamma)]
        p = np.asarray(logits_processor(jnp.asarray(tail[rows])))

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
            # Roll back both caches to the accepted prefix (free rewind).
            # This happens regardless of ``use_cache``: the chunked runners
            # always thread the static cache (the flag is API parity only —
            # skipping the rewind would leave rejected-draft K/V valid and
            # desynchronize cache positions from ``current``).
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


# ---------------------------------------------------------------------------
# On-chip speculative decoding: ONE jitted program, zero per-round host syncs
# ---------------------------------------------------------------------------
#
# The host-loop version above transfers the full [gamma, vocab] draft and
# target distributions to the host every round (reference
# ``speculative_decoding.py:172-206`` does the same via ``.item()``/indexing)
# — fine at test vocabs, a bandwidth-and-latency wall at Qwen-scale (151k)
# vocabs on a remote-attached TPU. The variant below runs the ENTIRE decode
# (both prefills, first sample, every speculation round with its rejection
# sampling, residual resample, EOS scan and cache rollback) as a single
# jitted ``lax.while_loop`` program; the host dispatches once and reads back
# the finished token buffer plus two stats scalars.
#
# Static-shape trick that makes one compiled round serve every
# accept/reject history: after the prompt prefill + first target sample,
#   * the drafter is behind by exactly 1 or 2 tokens, so its catch-up is
#     always expressible as a fixed 2-token chunk ending at ``current``
#     (re-encoding one already-cached token is idempotent: same token, same
#     position, same K/V), followed by gamma-1 single-token scan steps;
#   * the target always scores a fixed (gamma+1)-token chunk
#     [current-1, current+gamma) on a cache rewound to current-1.
# Cache rollback is the free ``length`` rewind (``layers/kv_cache.py``).


def _round_body(drafter_model, target_model, gamma: int, processor,
                skip_adjustment: bool, drafter_params, target_params,
                buf, current, d_cache, t_cache, stop_tokens, pad_id, rng):
    """One speculation round (traced). ``current`` = committed tokens in
    ``buf``. Returns updated state + (accepted_count, done)."""
    rng, r_draft, r_accept, r_final = jax.random.split(rng, 4)

    # -- drafter: 2-token catch-up chunk, then gamma-1 single-token steps
    chunk2 = jax.lax.dynamic_slice(buf, (0, current - 2), (1, 2))
    d_out = drafter_model.apply(drafter_params, chunk2,
                                cache=with_length(d_cache, current - 2),
                                start_pos=current - 2)
    d_cache = d_out.kv_cache
    q0 = processor(d_out.logits[0, -1])
    x0 = processor.sample(q0, jax.random.fold_in(r_draft, 0))[0]

    def draft_step(carry, k):
        cache, prev, pos = carry
        out = drafter_model.apply(
            drafter_params, prev[None, None].astype(buf.dtype),
            cache=cache, start_pos=pos)
        qk = processor(out.logits[0, -1])
        xk = processor.sample(qk, jax.random.fold_in(r_draft, k))[0]
        return (out.kv_cache, xk, pos + 1), (qk, xk)

    if gamma > 1:
        (d_cache, _, _), (q_rest, x_rest) = jax.lax.scan(
            draft_step, (d_cache, x0, current), jnp.arange(1, gamma))
        q = jnp.concatenate([q0[None], q_rest], axis=0)        # [gamma, V]
        x = jnp.concatenate([x0[None], x_rest], axis=0)        # [gamma]
    else:
        q, x = q0[None], x0[None]
    buf = jax.lax.dynamic_update_slice(buf, x[None].astype(buf.dtype),
                                       (0, current))

    # -- target scores all drafts in one (gamma+1)-token call
    chunk = jax.lax.dynamic_slice(buf, (0, current - 1), (1, gamma + 1))
    t_out = target_model.apply(target_params, chunk,
                               cache=with_length(t_cache, current - 1),
                               start_pos=current - 1)
    t_cache = t_out.kv_cache
    p = processor(t_out.logits[0, :gamma])                     # [gamma, V]

    # -- rejection sampling (reference :199-206), vectorized on device
    rand = jax.random.uniform(r_accept, (gamma,))
    p_tok = jnp.take_along_axis(p, x[:, None], axis=1)[:, 0]
    q_tok = jnp.take_along_axis(q, x[:, None], axis=1)[:, 0]
    reject = rand > p_tok / jnp.maximum(q_tok, 1e-20)
    n = jnp.where(reject.any(), jnp.argmax(reject),
                  jnp.asarray(gamma, jnp.int32)).astype(jnp.int32)

    # -- final token: target extra row on full accept, residual otherwise
    row = jnp.minimum(n, gamma - 1)
    resid = p[row] if skip_adjustment else norm_fn(p[row] - q[row])
    p_extra = processor(t_out.logits[0, gamma])
    p_final = jnp.where(n == gamma, p_extra, resid)
    x_final = processor.sample(p_final, r_final)[0]

    # -- commit: pad the rejected tail, write the resampled token
    idx = jnp.arange(buf.shape[1])[None, :]
    tail = (idx >= current + n) & (idx < current + gamma)
    buf = jnp.where(tail, jnp.asarray(pad_id, buf.dtype), buf)
    buf = jax.lax.dynamic_update_slice(
        buf, x_final[None, None].astype(buf.dtype), (0, current + n))

    # -- EOS scan over the n accepted drafts + the final token
    win = jax.lax.dynamic_slice(buf, (0, current), (1, gamma + 1))[0]
    valid = jnp.arange(gamma + 1) <= n
    is_stop = valid & (win[:, None] == stop_tokens[None, :]).any(-1)
    done = is_stop.any()
    new_current = jnp.where(done,
                            current + jnp.argmax(is_stop).astype(jnp.int32) + 1,
                            current + n + 1)

    # rollback = free length rewind (next round re-pins lengths anyway)
    d_cache = with_length(d_cache, jnp.minimum(d_cache["length"], new_current))
    t_cache = with_length(t_cache, jnp.minimum(t_cache["length"], new_current))
    return buf, new_current, d_cache, t_cache, n, done, rng


def _prefill(model, params, prompt, pixels, cache):
    """Prompt prefill: text-model protocol, or PaliGemma-style fused
    image+prompt prefix (the whole prompt bidirectional, as in captioning)."""
    if pixels is None:
        return model.apply(params, prompt, cache=cache, start_pos=0)
    return model.apply(params, prompt, pixel_values=pixels,
                       token_type_ids=jnp.zeros_like(prompt), cache=cache,
                       start_pos=0)


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5, 6, 7))
def _spec_decode_jit(drafter_model, target_model, gamma: int, processor,
                     skip_adjustment: bool, prompt_len: int, total_len: int,
                     clip_len: int,
                     drafter_params, target_params, buf, d_cache, t_cache,
                     stop_tokens, pad_id, rng, target_pixels, drafter_pixels):
    prompt = buf[:, :prompt_len]
    t_out = _prefill(target_model, target_params, prompt, target_pixels,
                     t_cache)
    d_cache = _prefill(drafter_model, drafter_params, prompt, drafter_pixels,
                       d_cache).kv_cache

    rng, r0 = jax.random.split(rng)
    probs = processor(t_out.logits[0, -1])
    t0 = processor.sample(probs, r0)[0].astype(buf.dtype)
    buf = buf.at[0, prompt_len].set(t0)
    done0 = (t0 == stop_tokens).any()
    zero = jnp.zeros((), jnp.int32)

    def cond(carry):
        _, current, _, _, _, _, _, done = carry
        return (current < total_len) & ~done

    def body(carry):
        buf, current, d_cache, t_cache, rng, acc, spec, done = carry
        # Acceptance-rate accounting matches the host-loop variant's
        # corrected_gamma: a round speculating past ``clip_len`` (whose
        # tokens are clipped from the output) only credits the in-bounds
        # part to both numerator and denominator (ADVICE r2).
        creditable = jnp.clip(clip_len - current, 0, gamma)
        buf, current, d_cache, t_cache, n, done, rng = _round_body(
            drafter_model, target_model, gamma, processor, skip_adjustment,
            drafter_params, target_params, buf, current, d_cache, t_cache,
            stop_tokens, pad_id, rng)
        return (buf, current, d_cache, t_cache, rng,
                acc + jnp.minimum(n, creditable), spec + creditable, done)

    carry = (buf, jnp.asarray(prompt_len + 1, jnp.int32), d_cache,
             t_out.kv_cache, rng, zero, zero, done0)
    buf, current, _, t_cache, _, acc, spec, done = jax.lax.while_loop(
        cond, body, carry)
    return buf, current, acc, spec, done, t_cache


def speculative_generate_onchip(
    inputs,
    drafter_model, drafter_params,
    target_model, target_params,
    gamma: int = 5,
    logits_processor: Optional[LogitsProcessor] = None,
    max_gen_len: int = 128,
    eos_tokens_id: Union[int, List[int]] = 2,
    pad_token_id: int = 2,
    skip_sample_adjustment: bool = False,
    rng=None,
    cache_dtype=jnp.float32,
    target_pixels=None,
    drafter_pixels=None,
) -> Tuple[List[int], float]:
    """``speculative_generate`` as ONE jitted device program (see section
    notes above): zero per-round host syncs. Always samples the first token
    from the target (the reference's ``first_target=True`` default).

    Compiles once per (models, gamma, processor instance, prompt_len,
    total_len) — reuse the same ``logits_processor`` object across calls.
    Returns ``(generated_token_list, acceptance_rate)``.
    """
    if logits_processor is None:
        logits_processor = NucleusProcessor(temperature=0.2, top_p=0.9)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    stop_tokens = jnp.atleast_1d(jnp.asarray(eos_tokens_id, dtype=jnp.int32))

    inputs = np.asarray(inputs)
    assert inputs.shape[0] == 1, "Speculative decoding only supports batch size 1."
    prompt_len = int(inputs.shape[1])
    assert prompt_len >= 1
    assert gamma >= 1

    def _vocab(model):
        cfg = model.config
        return getattr(cfg, "vocab_size", None) or cfg.text_config.vocab_size

    assert _vocab(drafter_model) == _vocab(target_model), \
        "drafter/target vocab sizes must match for rejection sampling"

    def _max_seq(model):
        cfg = model.config
        return getattr(cfg, "max_position_embeddings", None) or \
            cfg.text_config.max_position_embeddings

    max_seq = min(_max_seq(target_model), _max_seq(drafter_model))
    total_len = min(max_seq, prompt_len + max_gen_len)
    if total_len <= prompt_len:  # prompt at/over the context limit
        return [], 0.0
    # Slack so every round keeps the same static shapes near the end; the
    # output is clipped back to total_len. When the context limit caps the
    # slack, rounds stop early (at ``round_limit``) and the remaining
    # ``<= gamma+1`` tokens are decoded by plain single-token target steps —
    # no generatable token is forfeited (the host-loop variant's
    # ``corrected_gamma`` tail, expressed statically).
    buf_len = min(max_seq, total_len + gamma + 1)
    round_limit = min(total_len, buf_len - gamma)

    buf = jnp.full((1, buf_len), pad_token_id, dtype=jnp.int32)
    buf = buf.at[0, :prompt_len].set(jnp.asarray(inputs[0], jnp.int32))
    d_cache = drafter_model.init_cache(batch_size=1, max_len=buf_len,
                                       dtype=cache_dtype)
    t_cache = target_model.init_cache(batch_size=1, max_len=buf_len,
                                      dtype=cache_dtype)

    buf, current, acc, spec, done, t_cache = _spec_decode_jit(
        drafter_model, target_model, gamma, logits_processor,
        skip_sample_adjustment, prompt_len, round_limit, total_len,
        drafter_params, target_params, buf, d_cache, t_cache, stop_tokens,
        jnp.asarray(pad_token_id, jnp.int32), rng,
        None if target_pixels is None else jnp.asarray(target_pixels),
        None if drafter_pixels is None else jnp.asarray(drafter_pixels))

    current, done = int(current), bool(done)
    stop_np = np.asarray(stop_tokens)
    while not done and current < total_len:
        # context-limit tail: plain cached single-token target steps
        logits, t_cache = _forward_chunk(
            target_model, target_params, buf[:, current - 1:current],
            current - 1, with_length(t_cache, current - 1))
        r = jax.random.fold_in(rng, current)
        tok = int(logits_processor.sample(
            logits_processor(logits[0, -1]), r)[0])
        buf = buf.at[0, current].set(tok)
        current += 1
        done = bool(np.isin(tok, stop_np))

    current = min(current, total_len)
    tokens = np.asarray(buf[0, prompt_len:current]).tolist()
    return tokens, _rate(float(acc), float(spec))


def speculative_generate_multimodel(
    inputs,
    pixel_values,
    drafter_model, drafter_params,
    target_model, target_params,
    drafter_pixel_values=None,
    **kw,
) -> Tuple[List[int], float]:
    """Speculative captioning (SURVEY §7 stage 7): the image threads through
    both prefills; every speculation round is text-only cached continuation,
    so the shared on-chip round program is reused unchanged.

    The target is a VLM (e.g. ``PaliGemmaForConditionalGeneration``); the
    drafter is either a smaller VLM (pass ``drafter_pixel_values``, which
    may alias ``pixel_values``) or a text-only model that drafts from the
    token prompt alone.

    With a VLM drafter the prompt must END with a TEXT token (PaliGemma
    prompts do: the task text + separator follow the image run): the first
    round's fixed 2-token catch-up re-encodes the last prompt position
    through the text-embedding path, which is only idempotent for text
    tokens — an ``<image>`` placeholder there would silently overwrite its
    fused K/V. Later rounds only touch generated (text) positions.
    """
    if drafter_pixel_values is not None:
        # the corruption this guards happens in the DRAFTER's catch-up
        # re-encode — check the drafter's image token id (falling back to
        # the target's for drafters that share its tokenizer)
        img_idx = getattr(
            drafter_model.config, "image_token_index",
            getattr(target_model.config, "image_token_index", None))
        if img_idx is not None and int(np.asarray(inputs)[0, -1]) == img_idx:
            raise ValueError(
                "VLM drafter requires the prompt to end with a text token "
                "(the catch-up chunk re-encodes the last prompt position "
                "through the text path; an <image> token there would "
                "corrupt its drafter K/V)")
    return speculative_generate_onchip(
        inputs, drafter_model, drafter_params, target_model, target_params,
        target_pixels=pixel_values, drafter_pixels=drafter_pixel_values,
        **kw)
