"""Free-function decode loops (reference ``VyomAI/generation_utils.py``).

All three loops are single jitted programs: prefill once, then a
``lax.while_loop`` of single-token cached steps over a fixed-size token
buffer. The no-cache variants recompute over the full buffer with a step
mask (static shapes) — numerically the reference's growing-prefix forward.

- ``generate``            — decoder-only (ref ``generation_utils.py:6-51``)
- ``generate_seq2seq``    — fixed encoder output, growing decoder
  (ref ``generation_utils.py:54-125``)
- ``generate_multimodel`` — CLS-fused VLM; the prepended image token shifts
  cache positions by one, which the reference compensates with its
  ``index = idx.size()[1]`` (not ``-1``) bookkeeping
  (ref ``generation_utils.py:128-197``)
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


def _sample(logits, temperature, do_sample, rng):
    if not do_sample:
        # argmax is temperature-invariant; dividing first (as the reference
        # does) breaks at temperature=0.0 — documented deviation
        return jnp.argmax(logits, axis=-1)
    return jax.random.categorical(rng, logits / temperature, axis=-1)


@partial(jax.jit, static_argnums=(0, 3, 4, 6, 7))
def _generate_decoder(model, params, idx, max_new_tokens: int,
                      temperature: float, rng, do_sample: bool,
                      use_cache: bool):
    bsz, prompt_len = idx.shape
    total_len = prompt_len + max_new_tokens
    tokens = jnp.zeros((bsz, total_len), dtype=idx.dtype)
    tokens = tokens.at[:, :prompt_len].set(idx)

    if use_cache:
        param_dtype = jax.tree_util.tree_leaves(params)[0].dtype
        cache = model.init_cache(batch_size=bsz, max_len=total_len,
                                 dtype=param_dtype)
        out = model.apply(params, idx, cache=cache, start_pos=0)
        rng, r = jax.random.split(rng)
        nxt = _sample(out.logits[:, -1], temperature, do_sample, r)
        tokens = tokens.at[:, prompt_len].set(nxt.astype(tokens.dtype))

        def body(i, state):
            toks, cch, rr = state
            pos = prompt_len + i
            cur = jax.lax.dynamic_slice(toks, (0, pos), (bsz, 1))
            out = model.apply(params, cur, cache=cch, start_pos=pos)
            rr, r2 = jax.random.split(rr)
            nxt = _sample(out.logits[:, -1], temperature, do_sample, r2)
            toks = jax.lax.dynamic_update_slice(
                toks, nxt[:, None].astype(toks.dtype), (0, pos + 1))
            return (toks, out.kv_cache, rr)

        tokens, _, _ = jax.lax.fori_loop(
            0, max_new_tokens - 1, body,
            (tokens, out.kv_cache, rng))
        return tokens

    def body(i, state):
        toks, rr = state
        pos = prompt_len + i  # number of valid tokens so far
        step_mask = (jnp.arange(total_len)[None, :] < pos).astype(jnp.int32)
        step_mask = jnp.broadcast_to(step_mask, (bsz, total_len))
        out = model.apply(params, toks, attention_mask=step_mask)
        logits = jax.lax.dynamic_slice(
            out.logits, (0, pos - 1, 0), (bsz, 1, out.logits.shape[-1]))[:, 0]
        rr, r2 = jax.random.split(rr)
        nxt = _sample(logits, temperature, do_sample, r2)
        toks = jax.lax.dynamic_update_slice(
            toks, nxt[:, None].astype(toks.dtype), (0, pos))
        return (toks, rr)

    tokens, _ = jax.lax.fori_loop(0, max_new_tokens, body, (tokens, rng))
    return tokens


def generate(model, params, tokenize_text, max_new_tokens: int = 3,
             temperature: float = 1.0, do_sample: bool = False,
             use_cache: bool = False, rng=None):
    """Decoder-only free-function generation. Returns [B, prompt+new]."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    return _generate_decoder(model, params, jnp.asarray(tokenize_text),
                             int(max_new_tokens), float(temperature), rng,
                             bool(do_sample), bool(use_cache))


@partial(jax.jit, static_argnums=(0, 5, 6, 8, 9))
def _generate_seq2seq(model, params, encoder_output, encoder_attention_mask,
                      decoder_start, max_new_tokens: int, temperature: float,
                      rng, do_sample: bool, use_cache: bool):
    bsz, start_len = decoder_start.shape
    total_len = start_len + max_new_tokens
    tokens = jnp.zeros((bsz, total_len), dtype=decoder_start.dtype)
    tokens = tokens.at[:, :start_len].set(decoder_start)

    if use_cache:
        cache, cross_kv = model.setup_cache(
            params, encoder_output, batch_size=bsz, max_len=total_len,
            dtype=encoder_output.dtype)
        out, cache = model.apply(
            params, attention_mask=encoder_attention_mask,
            decoder_input_ids=decoder_start, encoder_output=encoder_output,
            cache=cache, cross_kv=cross_kv, start_pos=0)
        rng, r = jax.random.split(rng)
        nxt = _sample(out.logits[:, -1], temperature, do_sample, r)
        tokens = tokens.at[:, start_len].set(nxt.astype(tokens.dtype))

        def body(i, state):
            toks, cch, rr = state
            pos = start_len + i
            cur = jax.lax.dynamic_slice(toks, (0, pos), (bsz, 1))
            out, cch = model.apply(
                params, attention_mask=encoder_attention_mask,
                decoder_input_ids=cur, encoder_output=encoder_output,
                cache=cch, cross_kv=cross_kv, start_pos=pos)
            rr, r2 = jax.random.split(rr)
            nxt = _sample(out.logits[:, -1], temperature, do_sample, r2)
            toks = jax.lax.dynamic_update_slice(
                toks, nxt[:, None].astype(toks.dtype), (0, pos + 1))
            return (toks, cch, rr)

        tokens, _, _ = jax.lax.fori_loop(0, max_new_tokens - 1, body,
                                         (tokens, cache, rng))
        return tokens

    def body(i, state):
        toks, rr = state
        pos = start_len + i
        step_mask = jnp.broadcast_to(
            (jnp.arange(total_len)[None, :] < pos).astype(jnp.int32),
            (bsz, total_len))
        out = model.apply(params, attention_mask=encoder_attention_mask,
                          decoder_input_ids=toks,
                          decoder_attention_mask=step_mask,
                          encoder_output=encoder_output)
        logits = jax.lax.dynamic_slice(
            out.logits, (0, pos - 1, 0), (bsz, 1, out.logits.shape[-1]))[:, 0]
        rr, r2 = jax.random.split(rr)
        nxt = _sample(logits, temperature, do_sample, r2)
        toks = jax.lax.dynamic_update_slice(
            toks, nxt[:, None].astype(toks.dtype), (0, pos))
        return (toks, rr)

    tokens, _ = jax.lax.fori_loop(0, max_new_tokens, body, (tokens, rng))
    return tokens


def generate_seq2seq(model, params, encoder_output, encoder_attention_mask,
                     decoder_start, max_new_tokens: int = 5,
                     temperature: float = 1.0, do_sample: bool = False,
                     top_k: Optional[int] = 10, use_cache: bool = False,
                     rng=None):
    """Seq2seq generation with encode-once cross K/V.

    ``top_k`` is accepted for API parity and IGNORED — the reference
    declares it and never reads it (``generation_utils.py:62``); sampling
    is always full-vocabulary multinomial, as there. Use
    ``TopKProcessor`` + a custom loop for real top-k sampling."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    return _generate_seq2seq(model, params, encoder_output,
                             encoder_attention_mask,
                             jnp.asarray(decoder_start),
                             int(max_new_tokens), float(temperature), rng,
                             bool(do_sample), bool(use_cache))


@partial(jax.jit, static_argnums=(0, 4, 5, 7, 8))
def _generate_multimodel(model, params, encoder_output, decoder_start,
                         max_new_tokens: int, temperature: float, rng,
                         do_sample: bool, use_cache: bool):
    bsz, start_len = decoder_start.shape
    total_len = start_len + max_new_tokens
    tokens = jnp.zeros((bsz, total_len), dtype=decoder_start.dtype)
    tokens = tokens.at[:, :start_len].set(decoder_start)
    decoder = model.decoder

    if use_cache:
        # fused sequence is one longer than the text (prepended image CLS)
        cache = decoder.init_cache(batch_size=bsz, max_len=total_len + 1,
                                   dtype=encoder_output.dtype)
        out, cache = decoder.apply(
            params["decoder"], decoder_start,
            encoder_hidden_state=encoder_output, cache=cache, start_pos=0,
            fuse_image=True)
        rng, r = jax.random.split(rng)
        nxt = _sample(out.logits[:, -1], temperature, do_sample, r)
        tokens = tokens.at[:, start_len].set(nxt.astype(tokens.dtype))

        def body(i, state):
            toks, cch, rr = state
            pos = start_len + i
            cur = jax.lax.dynamic_slice(toks, (0, pos), (bsz, 1))
            # cache position is text position + 1 (image token at slot 0)
            out, cch = decoder.apply(
                params["decoder"], cur, cache=cch, start_pos=pos + 1,
                fuse_image=False)
            rr, r2 = jax.random.split(rr)
            nxt = _sample(out.logits[:, -1], temperature, do_sample, r2)
            toks = jax.lax.dynamic_update_slice(
                toks, nxt[:, None].astype(toks.dtype), (0, pos + 1))
            return (toks, cch, rr)

        tokens, _, _ = jax.lax.fori_loop(0, max_new_tokens - 1, body,
                                         (tokens, cache, rng))
        return tokens

    def body(i, state):
        toks, rr = state
        pos = start_len + i
        step_mask = jnp.broadcast_to(
            (jnp.arange(total_len)[None, :] < pos).astype(jnp.int32),
            (bsz, total_len))
        out = decoder.apply(params["decoder"], toks,
                            attention_mask=step_mask,
                            encoder_hidden_state=encoder_output,
                            fuse_image=True)
        # logits row pos-1 in text == row pos in fused (image offset +1)
        logits = jax.lax.dynamic_slice(
            out.logits, (0, pos, 0), (bsz, 1, out.logits.shape[-1]))[:, 0]
        rr, r2 = jax.random.split(rr)
        nxt = _sample(logits, temperature, do_sample, r2)
        toks = jax.lax.dynamic_update_slice(
            toks, nxt[:, None].astype(toks.dtype), (0, pos))
        return (toks, rr)

    tokens, _ = jax.lax.fori_loop(0, max_new_tokens, body, (tokens, rng))
    return tokens


def generate_multimodel(model, params, encoder_output,
                        encoder_attention_mask=None, decoder_start=None,
                        max_new_tokens: int = 24, temperature: float = 1.0,
                        do_sample: bool = False, top_k: Optional[int] = 10,
                        use_cache: bool = False, rng=None):
    """VLM caption generation. ``encoder_output``: image CLS embedding [B, D].

    ``encoder_attention_mask`` and ``top_k`` are accepted for API parity
    and IGNORED — the reference declares both and never reads either
    (``generation_utils.py:128-197``; the CLS-fusion design needs no
    encoder mask)."""
    if decoder_start is None:
        raise ValueError(
            "decoder_start is required (a [B, L] int token matrix — the "
            "reference passes the BOS/prompt tokens here)")
    if rng is None:
        rng = jax.random.PRNGKey(0)
    return _generate_multimodel(model, params, encoder_output,
                                jnp.asarray(decoder_start),
                                int(max_new_tokens), float(temperature), rng,
                                bool(do_sample), bool(use_cache))
