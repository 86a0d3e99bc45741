"""PaliGemma-style VLM (reference ``paligemma.ipynb`` cells 9-37).

SigLIP vision tower + linear multimodal projector + Gemma decoder with
``<image>``-token fusion and the prefix-LM mask:
- image features are scattered into the text embedding sequence at the
  positions holding ``image_token_index`` (the reference's
  ``masked_scatter``, rebuilt as a gather + ``jnp.where`` — the processor
  lays image tokens out contiguously so a cumulative index is exact)
- embeddings are scaled by ``sqrt(hidden)`` (text) and ``1/sqrt(hidden)``
  (projected image features), as in the reference projector
- ``token_type_ids`` drive the prefix-LM mask: bidirectional over
  image+prefix, causal over the suffix; cached decode attends everything

Greedy/top-p captioning runs as a jitted prefill + while_loop decode over
the Gemma static cache.
"""

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..config import PaliGemmaConfig, StructuralIdentity
from ..core import nn as cnn
from .gemma import GemmaModel
from .siglip import SiglipVisionModel
from .outputs import CLMOutput


class PaliGemmaForConditionalGeneration(StructuralIdentity):
    def __init__(self, config: PaliGemmaConfig) -> None:
        self.config = config
        self.vision_tower = SiglipVisionModel(config.vision_config)
        self.language_model = GemmaModel(config.text_config)

    def init(self, key, dtype=jnp.float32):
        cfg = self.config
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "vision_tower": self.vision_tower.init(k1, dtype=dtype),
            "multi_modal_projector": cnn.linear_init(
                k2, cfg.vision_config.hidden_size, cfg.projection_dim,
                bias=True, dtype=dtype),
            "language_model": self.language_model.init(k3, dtype=dtype),
        }

    def init_cache(self, **kw):
        return self.language_model.init_cache(**kw)

    def embed_fused(self, params, input_ids, pixel_values):
        """Token embeddings with image features scattered over
        ``<image>`` positions. Returns fused embeds [B, L, D]."""
        cfg = self.config
        tcfg = cfg.text_config
        # Reference semantics (paligemma.ipynb): image features are divided
        # by sqrt(hidden) at fusion, then GemmaModel multiplies the FUSED
        # embeddings by sqrt(hidden) — net: text x sqrt(h), image x 1.
        text = cnn.embedding(params["language_model"]["embed_tokens"],
                             input_ids)
        text = text * jnp.asarray(tcfg.hidden_size ** 0.5, text.dtype)

        img = self.vision_tower.apply(params["vision_tower"], pixel_values)
        img = cnn.linear(params["multi_modal_projector"], img)

        is_image = input_ids == cfg.image_token_index          # [B, L]
        # contiguous layout: the n-th image token takes image feature n
        img_idx = jnp.clip(jnp.cumsum(is_image, axis=1) - 1, 0,
                           img.shape[1] - 1)
        gathered = jnp.take_along_axis(img.astype(text.dtype),
                                       img_idx[..., None], axis=1)
        return jnp.where(is_image[..., None], gathered, text)

    def serving_prefix_embeds(self, params, pixel_values):
        """Projected image features [B, n_img, D_text] for the serving
        engine: exactly the values ``embed_fused`` scatters at
        ``<image>``-token positions (the engine substitutes them at
        positions < embed_len via ``submit(prefix_embeds=...)`` — net
        scaling matches the reference: text x sqrt(hidden), image x 1)."""
        img = self.vision_tower.apply(params["vision_tower"], pixel_values)
        return cnn.linear(params["multi_modal_projector"], img)

    def apply(self, params, input_ids=None, pixel_values=None,
              attention_mask=None, token_type_ids=None,
              cache: Optional[Any] = None, start_pos=0) -> CLMOutput:
        """``token_type_ids``: 0 for image+prefix, 1 for suffix (reference
        processor convention); drives the prefix-LM mask."""
        if pixel_values is not None:
            embeds = self.embed_fused(params, input_ids, pixel_values)
        else:
            tcfg = self.config.text_config
            embeds = cnn.embedding(params["language_model"]["embed_tokens"],
                                   input_ids)
            embeds = embeds * jnp.asarray(tcfg.hidden_size ** 0.5,
                                          embeds.dtype)
        prefix_len = None
        if token_type_ids is not None:
            prefix_len = jnp.sum(token_type_ids == 0, axis=1)
        # PaliGemma RoPE positions are 1-indexed (reference
        # ``position_ids = cache_position + 1``).
        return self.language_model.apply(
            params["language_model"], attention_mask=attention_mask,
            inputs_embeds=embeds, prefix_len=prefix_len, cache=cache,
            start_pos=start_pos, position_offset=1)

    __call__ = apply

    def generate(self, params, input_ids, pixel_values, max_new_tokens: int,
                 temperature: float = 1.0, do_sample: bool = False,
                 top_p: Optional[float] = None, rng=None):
        """Jitted caption generation: fused prefill (prefix-LM over
        image+prompt) then single-token cached decode."""
        if rng is None:
            rng = jax.random.PRNGKey(0)
        return _pg_generate(self, params, jnp.asarray(input_ids),
                            pixel_values, int(max_new_tokens),
                            float(temperature), bool(do_sample),
                            -1.0 if top_p is None else float(top_p), rng)


@partial(jax.jit, static_argnums=(0, 4, 5, 6, 7))
def _pg_generate(model, params, input_ids, pixel_values, max_new_tokens,
                 temperature, do_sample, top_p, rng):
    bsz, prompt_len = input_ids.shape
    total = prompt_len + max_new_tokens
    cache = model.init_cache(
        batch_size=bsz, max_len=total,
        dtype=cnn.embedding_dtype(params["language_model"]["embed_tokens"]))

    # prefill: whole image+prompt is the bidirectional prefix
    out = model.apply(params, input_ids, pixel_values,
                      token_type_ids=jnp.zeros_like(input_ids), cache=cache,
                      start_pos=0)

    def sample(logits, r):
        logits = logits / temperature
        if do_sample and top_p > 0:
            from ..generation.sampling import _top_p_mask
            logits = _top_p_mask(logits, top_p)
        if do_sample:
            return jax.random.categorical(r, logits, axis=-1)
        return jnp.argmax(logits, axis=-1)

    tokens = jnp.zeros((bsz, total), dtype=input_ids.dtype)
    tokens = tokens.at[:, :prompt_len].set(input_ids)
    rng, r = jax.random.split(rng)
    nxt = sample(out.logits[:, -1], r)
    tokens = tokens.at[:, prompt_len].set(nxt.astype(tokens.dtype))

    def body(i, state):
        toks, cch, rr = state
        p = prompt_len + i
        cur = jax.lax.dynamic_slice(toks, (0, p), (bsz, 1))
        out = model.apply(params, cur, None, cache=cch, start_pos=p)
        rr, r2 = jax.random.split(rr)
        nxt = sample(out.logits[:, -1], r2)
        toks = jax.lax.dynamic_update_slice(
            toks, nxt[:, None].astype(toks.dtype), (0, p + 1))
        return (toks, out.kv_cache, rr)

    tokens, _, _ = jax.lax.fori_loop(0, max_new_tokens - 1, body,
                                     (tokens, out.kv_cache, rng))
    return tokens


def parse_detection_boxes(text: str, *, image_size=None):
    """Parse PaliGemma detection output into boxes (+ labels).

    The detect task emits ``<locYYYY><locXXXX><locYYYY><locXXXX> label``
    runs with coordinates binned to 0..1023 (reference
    ``Examples/paligemma.ipynb`` cell 35 ``parse_segments``). Returns
    ``(boxes, labels)``: boxes ``float32 [N, 4]`` as (y0, x0, y1, x1) in
    bin units, or scaled to pixels when ``image_size=(height, width)``.
    """
    import re

    import numpy as np

    cleaned = text.replace(" ", "")
    boxes, labels = [], []
    pat = re.compile(r"<loc(?P<y0>\d{4})><loc(?P<x0>\d{4})>"
                     r"<loc(?P<y1>\d{4})><loc(?P<x1>\d{4})>"
                     r"(?P<label>[^<;]*)")
    for m in pat.finditer(cleaned):
        d = m.groupdict()
        boxes.append([float(d["y0"]), float(d["x0"]),
                      float(d["y1"]), float(d["x1"])])
        labels.append(d["label"])
    boxes = np.asarray(boxes, dtype=np.float32).reshape(-1, 4)
    if image_size is not None and boxes.size:
        h, w = image_size
        boxes = boxes / 1024.0 * np.asarray([h, w, h, w], dtype=np.float32)
    return boxes, labels
