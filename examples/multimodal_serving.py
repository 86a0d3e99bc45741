"""Multimodal serving: PaliGemma-style captioning through the
continuous-batching engine.

Combines the reference's two flagship notebooks — the PaliGemma VLM
(``paligemma.ipynb``, batch-1 captioning loop) and the mini-vLLM engine
(``simple_vllm.ipynb``, text-only) — into one TPU-native path: the image
runs the SigLIP tower + projector ONCE per request, the projected features
enter paged prefill as prefix embeddings (bidirectional prefix-LM
attention over image+prompt), and decode rides the same continuous batch
as any text request. Identical (image, prompt) pairs share radix-cached
prefix KV; different pairs never do (the bidirectional prefix makes
partial sharing unsound — the engine salts radix keys with both).

Run: ``python examples/multimodal_serving.py`` (synthetic weights/images).
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import time

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import jax.numpy as jnp
import numpy as np

import vyomai_tpu as vt
from vyomai_tpu.serving import ContinuousBatchEngine

VCFG = vt.SiglipVisionConfig(hidden_size=128, intermediate_size=256,
                             num_hidden_layers=4, num_attention_heads=4,
                             image_size=64, patch_size=16)
TCFG = vt.GemmaConfig(vocab_size=4096, hidden_size=256,
                      intermediate_size=1024, num_hidden_layers=4,
                      num_attention_heads=8, num_key_value_heads=2,
                      head_dim=32, max_position_embeddings=512,
                      eos_token_id=2)
PGCFG = vt.PaliGemmaConfig(vision_config=VCFG, text_config=TCFG,
                           projection_dim=256, image_token_index=4000)


def main():
    model = vt.PaliGemmaForConditionalGeneration(PGCFG)
    params = model.init(jax.random.PRNGKey(0))
    n_img = PGCFG.num_image_tokens

    eng = ContinuousBatchEngine(
        model.language_model, params["language_model"],
        plus_one=True, position_offset=1,   # Gemma norms, 1-indexed RoPE
        num_blocks=256, block_size=16, max_batch=8,
        max_blocks_per_seq=16, max_new_tokens=24,
        prefill_buckets=(32, 64, 128), eos_token_id=TCFG.eos_token_id)

    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    sids = {}
    for i in range(6):
        pixels = jax.random.normal(jax.random.PRNGKey(10 + i % 3),
                                   (1, 3, 64, 64))   # 3 distinct "images"
        embeds = np.asarray(
            model.serving_prefix_embeds(params, pixels))[0]
        prompt = [PGCFG.image_token_index] * n_img + \
            list(rng.integers(3, 4000, size=6))
        sids[i] = eng.submit(prompt, prefix_embeds=embeds, prefix_lm=True,
                             media_key=f"image-{i % 3}-p{i}")
    out = eng.run()
    dt = time.perf_counter() - t0

    for i, sid in sids.items():
        print(f"caption {i} (image {i % 3}): {out[sid]}")
    m = eng.metrics()
    print(f"{m['tokens_generated']} tokens in {dt:.2f}s "
          f"({m['tokens_generated'] / dt:.0f} tok/s), "
          f"prefills={m['prefill_calls']}, "
          f"cache_hit_rate={m['cache_hit_rate']:.2f}")


if __name__ == "__main__":
    main()
