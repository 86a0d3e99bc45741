"""GPT-style causal decoder (reference ``VyomAI/models/decoder.py``).

TPU-first decisions:
- Static KV cache pytree ``[L, B, H_kv, S_max, D]`` updated with
  ``dynamic_update_slice``; validity masking replaces the reference's
  Python-side cache slicing (see ``layers/kv_cache.py``).
- ``generate`` runs as one jitted program: prefill + ``lax.while_loop``
  decode with a fixed-size token buffer, llama-style prompt replay via
  ``input_text_mask`` and masked EOS early-exit
  (reference ``models/decoder.py:430-514``).
- Layer stack under ``lax.scan`` with per-layer cache slices as scan xs/ys.

Parity quirks preserved: FFN residual uses the pre-attention block input
(``decoder.py:241-250``); when ``seqlen == 1`` decode steps attend to the
full cached prefix with no pad masking (``decoder.py:356-362``).

Deviation (documented): the reference's ``do_sample`` path feeds raw logits
to ``torch.multinomial`` (which requires non-negative weights — a latent
bug); we sample from ``softmax(logits / temperature)``.
"""

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..config import EncoderConfig, StructuralIdentity
from ..core import nn as cnn
from ..core.masks import bidirectional_mask, causal_mask_static_kv
from ..layers import attention as attn
from ..layers import ffn as ffn_mod
from ..layers import positional as pos
from ..layers.kv_cache import init_cache
from .encoder import lm_head_init, lm_head_apply, stacked_layers_init
from .outputs import CLMOutput


class DecoderModel(StructuralIdentity):
    """Functional causal LM. ``apply`` is pure/jittable; pass ``cache``
    (pytree from ``layers.kv_cache.init_cache``) + ``start_pos`` to use the
    static KV cache."""

    _identity_fields = ("pos_embedding_type", "kind", "remat")

    def __init__(self, config: EncoderConfig,
                 pos_embedding_type: Optional[str] = "absolute",
                 attention_type: Optional[str] = None,
                 remat: bool = False) -> None:
        self.config = config
        self.pos_embedding_type = pos_embedding_type
        self.kind = "gqa" if attention_type == "gqa" else "mha"
        self.is_gqa = attention_type == "gqa"
        self.remat = remat  # rematerialize layers in backward (see encoder)
        if pos_embedding_type == "rope":
            self.emb_freq = pos.rope_freqs(config.max_position_embeddings,
                                           config.head_dim)
        elif pos_embedding_type == "sinusoidal":
            self.sin_table = pos.sinusoidal_table(
                config.max_position_embeddings, config.hidden_size)

    # -- params ------------------------------------------------------------
    def init(self, key, dtype=jnp.float32):
        cfg = self.config
        k_emb, k_pos, k_layers, k_head = jax.random.split(key, 4)
        params = {
            "word_embeddings": cnn.embedding_init(
                k_emb, cfg.vocab_size, cfg.hidden_size,
                std=cfg.initializer_range,
                pad_idx=getattr(cfg, "pad_token_id", None), dtype=dtype),
            "layers": stacked_layers_init(k_layers, cfg, self.kind, dtype),
            "lm_head": lm_head_init(k_head, cfg, dtype=dtype),
        }
        if self.pos_embedding_type == "absolute":
            params["position_embeddings"] = pos.absolute_init(k_pos, cfg,
                                                              dtype=dtype)
        return params

    def init_cache(self, *, batch_size: int = 1, max_len: Optional[int] = None,
                   dtype=jnp.float32):
        cfg = self.config
        nkv = cfg.num_key_value_heads if self.is_gqa else cfg.num_attention_heads
        return init_cache(cfg, batch_size=batch_size, max_len=max_len,
                          dtype=dtype, num_kv_heads=nkv)

    # -- forward -----------------------------------------------------------
    def _embed(self, params, input_ids, start_pos, positions=None):
        """``positions``: optional [B, L] explicit per-token positions
        (packed sequences restart positions at each segment). When given,
        position tables / RoPE freqs are gathered per row instead of
        sliced at ``start_pos``."""
        seqlen = input_ids.shape[1]
        pad = getattr(self.config, "pad_token_id", None)
        hidden = cnn.embedding(params["word_embeddings"], input_ids,
                               pad_idx=pad)
        freqs = None
        if self.pos_embedding_type == "absolute":
            if positions is not None:
                tab = jnp.take(params["position_embeddings"]["weight"],
                               positions, axis=0)           # [B, L, D]
                if pad is not None:   # padding_idx on the position table
                    tab = jnp.where((positions == pad)[..., None],
                                    jax.lax.stop_gradient(tab), tab)
            else:
                tab = pos.absolute_slice(params["position_embeddings"],
                                         start_pos, seqlen, pad_idx=pad)
            hidden = hidden + tab.astype(hidden.dtype)
        elif self.pos_embedding_type == "sinusoidal":
            if positions is not None:
                tab = jnp.take(self.sin_table[0], positions, axis=0)
            else:
                tab = jax.lax.dynamic_slice_in_dim(self.sin_table, start_pos,
                                                   seqlen, axis=1)
            hidden = hidden + tab.astype(hidden.dtype)
        elif self.pos_embedding_type == "rope":
            if positions is not None:
                freqs = jnp.take(self.emb_freq[0], positions,
                                 axis=0)                     # [B, L, D/2]
            else:
                freqs = jax.lax.dynamic_slice_in_dim(self.emb_freq, start_pos,
                                                     seqlen, axis=1)
        return hidden, freqs

    def _mask(self, input_ids, attention_mask, cache, start_pos):
        """Returns (additive_mask_or_None, causal_flag). The no-cache path
        passes only the pad bias and lets the attention kernel apply the
        triangular mask (enables flash block skipping)."""
        bsz, seqlen = input_ids.shape
        if cache is not None:
            kv_cap = cache["k"].shape[3]
            return causal_mask_static_kv(seqlen, kv_cap, start_pos,
                                         attention_mask, batch_size=bsz), False
        if attention_mask is None:
            return None, True
        return bidirectional_mask(attention_mask), True

    def run_layers(self, params, hidden, mask, freqs, cache, start_pos, *,
                   causal=False, deterministic=True, rng=None,
                   segments=None):
        cfg, kind = self.config, self.kind
        n_layers = cfg.num_hidden_layers
        if not deterministic:
            if rng is None:
                raise ValueError(
                    "deterministic=False requires an rng key for dropout")
            layer_rngs = jax.random.split(rng, n_layers * 2).reshape(n_layers, 2, 2)
        else:
            layer_rngs = jnp.zeros((n_layers, 2, 2), dtype=jnp.uint32)

        if cache is None:
            def body(h, xs):
                lp, lrng = xs
                a_rng = lrng[0] if not deterministic else None
                f_rng = lrng[1] if not deterministic else None
                out, _ = attn.decoder_attention_apply(
                    lp["attention"], h, mask, cfg, kind=kind, freqs=freqs,
                    causal=causal, deterministic=deterministic, rng=a_rng,
                    segments=segments)
                out = ffn_mod.ffn_apply(lp["ffn"], out, h, cfg,
                                        deterministic=deterministic, rng=f_rng)
                return out, None
            body = cnn.remat_wrap(body, self.remat)
            hidden, _ = jax.lax.scan(body, hidden, (params["layers"], layer_rngs))
            return hidden, None

        def body(h, xs):
            lp, lrng, ck, cv = xs
            a_rng = lrng[0] if not deterministic else None
            f_rng = lrng[1] if not deterministic else None
            out, new_kv = attn.decoder_attention_apply(
                lp["attention"], h, mask, cfg, kind=kind, freqs=freqs,
                cache_kv=(ck, cv), start_pos=start_pos,
                deterministic=deterministic, rng=a_rng)
            out = ffn_mod.ffn_apply(lp["ffn"], out, h, cfg,
                                    deterministic=deterministic, rng=f_rng)
            return out, new_kv
        hidden, (new_k, new_v) = jax.lax.scan(
            body, hidden, (params["layers"], layer_rngs, cache["k"], cache["v"]))
        new_cache = {"k": new_k, "v": new_v,
                     "length": jnp.asarray(start_pos + hidden.shape[1],
                                           dtype=jnp.int32)}
        return hidden, new_cache

    def apply(self, params, input_ids, attention_mask=None,
              cache: Optional[Any] = None, start_pos=0, *,
              deterministic: bool = True, rng=None,
              segment_ids=None, positions=None) -> CLMOutput:
        """``segment_ids``/``positions``: optional [B, L] int32 for PACKED
        sequences (``training.packing``) — attention is blocked across
        segments (in-kernel on the flash path) and positions restart per
        segment. Training path only (``cache`` must be None)."""
        if segment_ids is not None and cache is not None:
            raise ValueError("packed segment_ids are a training feature; "
                             "cached decode does not support them")
        segments = (None if segment_ids is None
                    else (segment_ids, segment_ids))
        hidden, freqs = self._embed(params, input_ids, start_pos,
                                    positions=positions)
        mask, causal = self._mask(input_ids, attention_mask, cache, start_pos)
        hidden, new_cache = self.run_layers(
            params, hidden, mask, freqs, cache, start_pos, causal=causal,
            deterministic=deterministic, rng=rng, segments=segments)
        # cache length (start_pos + seqlen) is set in run_layers — one site
        logits = lm_head_apply(params["lm_head"], hidden, self.config)
        return CLMOutput(hidden_state=hidden, logits=logits, kv_cache=new_cache)

    __call__ = apply

    @classmethod
    def from_config(cls, config, pos_embedding_type: Optional[str] = "absolute",
                    attention_type: Optional[str] = None) -> "DecoderModel":
        return cls(config, pos_embedding_type, attention_type)

    # -- generation ----------------------------------------------------------
    def generate(self, params, input_ids, attention_mask=None, max_len: int = 5,
                 temperature: float = 1.0, use_cache: bool = True,
                 do_sample: bool = False, rng=None,
                 use_static_cache: bool = True):
        """Batched greedy/sampling generation (reference
        ``decoder.py:430-514``). Fully jitted: prefill + ``while_loop``
        decode over a fixed [B, prompt + max_len] token buffer. Returns the
        filled token matrix.

        ``use_static_cache`` is accepted for API parity; the static cache is
        the only device cache.

        Parity quirks replicated exactly: (a) the llama-style
        ``input_text_mask`` replay machinery is structurally inert for
        rectangular inputs — the reference's ``all_prompt_size`` over a 2-D
        tensor makes ``min_prompt_len == max_prompt_len`` always
        (``decoder.py:444-447``); (b) cached decode steps attend the full
        prefix with no pad masking (``decoder.py:355-362``: mask only when
        ``seqlen > 1``) while the no-cache path masks pads — so the two
        paths can diverge for batches whose ``attention_mask`` contains
        zeros, in the reference as here. The token-exact cache-parity
        invariant therefore holds for all-valid masks."""
        cfg = self.config
        input_ids = jnp.asarray(input_ids)
        bsz, prompt_len = input_ids.shape
        total_len = prompt_len + max_len
        if total_len > cfg.max_position_embeddings:
            raise ValueError(
                f"prompt ({prompt_len}) + max_len ({max_len}) exceeds "
                f"max_position_embeddings ({cfg.max_position_embeddings}) — "
                "positions past the table would silently clamp to its last "
                "row")
        if attention_mask is None:
            attention_mask = jnp.ones((bsz, prompt_len), dtype=jnp.int32)
        if rng is None:
            rng = jax.random.PRNGKey(0)
        return _generate_jit(self, params, input_ids, attention_mask,
                             total_len, prompt_len,
                             jnp.asarray(temperature, jnp.float32),
                             bool(use_cache), bool(do_sample), rng)


def _sample_token(logits, temperature, do_sample, rng):
    if do_sample:
        return jax.random.categorical(rng, logits / temperature, axis=-1)
    # argmax is temperature-invariant; dividing first (as the reference
    # does) breaks at temperature=0.0 — documented deviation
    return jnp.argmax(logits, axis=-1)


@partial(jax.jit, static_argnums=(0, 4, 5, 7, 8))
def _generate_jit(model: DecoderModel, params, input_ids, attention_mask,
                  total_len: int, prompt_len: int, temperature,
                  use_cache: bool, do_sample: bool, rng):
    # temperature is a TRACED operand (it's only used arithmetically) — a
    # temperature sweep reuses one compiled program instead of recompiling
    cfg = model.config
    bsz = input_ids.shape[0]
    pad_id = getattr(cfg, "pad_token_id", 1)
    eos_id = getattr(cfg, "eos_token_id", 2)

    tokens = jnp.full((bsz, total_len), pad_id, dtype=input_ids.dtype)
    tokens = tokens.at[:, :prompt_len].set(input_ids)
    mask_buf = jnp.zeros((bsz, total_len), dtype=jnp.int32)
    mask_buf = mask_buf.at[:, :prompt_len].set(attention_mask.astype(jnp.int32))
    mask_buf = mask_buf.at[:, prompt_len:].set(1)
    input_text_mask = tokens != pad_id
    eos = jnp.zeros((bsz,), dtype=bool)

    if use_cache:
        cache = model.init_cache(
            batch_size=bsz, max_len=total_len,
            dtype=cnn.embedding_dtype(params["word_embeddings"]))
        out = model.apply(params, tokens[:, :prompt_len],
                          attention_mask=mask_buf[:, :prompt_len],
                          cache=cache, start_pos=0)
        cache = out.kv_cache
        rng, step_rng = jax.random.split(rng)
        next_tok = _sample_token(out.logits[:, -1], temperature, do_sample,
                                 step_rng)
        next_tok = jnp.where(input_text_mask[:, prompt_len],
                             tokens[:, prompt_len], next_tok.astype(tokens.dtype))
        tokens = tokens.at[:, prompt_len].set(next_tok)
        eos = eos | ((~input_text_mask[:, prompt_len]) & (next_tok == eos_id))

        def cond(state):
            pos, _, _, eos_r, _ = state
            return (pos < total_len) & ~jnp.all(eos_r)

        def body(state):
            pos, toks, cch, eos_r, r = state
            cur = jax.lax.dynamic_slice(toks, (0, pos - 1), (bsz, 1))
            out = model.apply(params, cur, cache=cch, start_pos=pos - 1)
            r, step_r = jax.random.split(r)
            nxt = _sample_token(out.logits[:, -1], temperature, do_sample,
                                step_r)
            nxt = nxt.astype(toks.dtype)
            replay = jnp.take_along_axis(
                input_text_mask, pos[None, None].repeat(bsz, 0), axis=1)[:, 0]
            orig = jax.lax.dynamic_slice(toks, (0, pos), (bsz, 1))[:, 0]
            nxt = jnp.where(replay, orig, nxt)
            toks = jax.lax.dynamic_update_slice(toks, nxt[:, None], (0, pos))
            eos_r = eos_r | ((~replay) & (nxt == eos_id))
            return (pos + 1, toks, out.kv_cache, eos_r, r)

        state = (jnp.asarray(prompt_len + 1, jnp.int32), tokens, cache, eos, rng)
        _, tokens, _, _, _ = jax.lax.while_loop(cond, body, state)
        return tokens

    # No-cache path: recompute over the full (fixed-size) buffer each step,
    # masking future positions — static shapes, parity with the reference's
    # growing-prefix forward.
    def cond(state):
        pos, _, eos_r, _ = state
        return (pos < total_len) & ~jnp.all(eos_r)

    def body(state):
        pos, toks, eos_r, r = state
        step_mask = (jnp.arange(total_len)[None, :] < pos) & (mask_buf != 0)
        out = model.apply(params, toks, attention_mask=step_mask.astype(jnp.int32))
        logits = jax.lax.dynamic_slice(
            out.logits, (0, pos - 1, 0), (bsz, 1, out.logits.shape[-1]))[:, 0]
        r, step_r = jax.random.split(r)
        nxt = _sample_token(logits, temperature, do_sample, step_r).astype(toks.dtype)
        replay = jnp.take_along_axis(
            input_text_mask, pos[None, None].repeat(bsz, 0), axis=1)[:, 0]
        orig = jax.lax.dynamic_slice(toks, (0, pos), (bsz, 1))[:, 0]
        nxt = jnp.where(replay, orig, nxt)
        toks = jax.lax.dynamic_update_slice(toks, nxt[:, None], (0, pos))
        eos_r = eos_r | ((~replay) & (nxt == eos_id))
        return (pos + 1, toks, eos_r, r)

    state = (jnp.asarray(prompt_len, jnp.int32), tokens, eos, rng)
    _, tokens, _, _ = jax.lax.while_loop(cond, body, state)
    return tokens
