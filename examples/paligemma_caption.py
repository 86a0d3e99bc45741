"""PaliGemma captioning (reference ``paligemma.ipynb`` — BASELINE config 5):
<image>-token fusion, prefix-LM prefill, jitted KV-cache decode, and
speculative decoding with the Gemma text tower as its own drafter.

With ``--weights <dir>`` loads real safetensors via ``interop.hf_import``
(full PaliGemma config); otherwise runs a tiny random-weight demo."""

import argparse

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))
import time

import jax
import jax.numpy as jnp
import numpy as np

import vyomai_tpu as vt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default=None)
    ap.add_argument("--max-new", type=int, default=16)
    args = ap.parse_args()

    if args.weights:
        from vyomai_tpu.interop.hf_import import (load_safetensors,
                                                  import_paligemma)
        cfg = vt.PaliGemmaConfig()
        model = vt.PaliGemmaForConditionalGeneration(cfg)
        params = import_paligemma(load_safetensors(args.weights), cfg)
    else:
        cfg = vt.PaliGemmaConfig(
            vision_config=vt.SiglipVisionConfig(
                hidden_size=128, intermediate_size=256, num_hidden_layers=4,
                num_attention_heads=4, image_size=64, patch_size=16),
            text_config=vt.GemmaConfig(
                vocab_size=2048, hidden_size=128, intermediate_size=512,
                num_hidden_layers=4, num_attention_heads=8,
                num_key_value_heads=1, head_dim=32,
                max_position_embeddings=256),
            projection_dim=128, image_token_index=2000)
        model = vt.PaliGemmaForConditionalGeneration(cfg)
        params = model.init(jax.random.PRNGKey(0), dtype=jnp.bfloat16)

    n_img = cfg.num_image_tokens
    rng = np.random.default_rng(0)
    prompt_text = rng.integers(3, min(cfg.text_config.vocab_size, 1999),
                               size=(2, 8))
    ids = np.concatenate(
        [np.full((2, n_img), cfg.image_token_index, np.int32),
         prompt_text.astype(np.int32)], axis=1)
    px = rng.normal(size=(2, 3, cfg.vision_config.image_size,
                          cfg.vision_config.image_size)).astype(np.float32)

    toks = model.generate(params, jnp.asarray(ids), jnp.asarray(px),
                          max_new_tokens=args.max_new)
    vt.utils.device_sync(toks)
    t0 = time.perf_counter()
    toks = model.generate(params, jnp.asarray(ids), jnp.asarray(px),
                          max_new_tokens=args.max_new)
    vt.utils.device_sync(toks)
    dt = time.perf_counter() - t0
    print(f"caption tokens: {toks[0, ids.shape[1]:].tolist()}")
    print(f"caption throughput: {2 * args.max_new / dt:.1f} tokens/s")

    # speculative decoding on the text tower (drafter == target here;
    # swap in a smaller Gemma for real speedups)
    from vyomai_tpu.generation import speculative_generate, GreedyProcessor
    lm = model.language_model
    lm_params = params["language_model"]
    prompt = jnp.asarray(prompt_text[:1].astype(np.int32))
    out, acc = speculative_generate(
        prompt, lm, lm_params, lm, lm_params, gamma=4,
        logits_processor=GreedyProcessor(), max_gen_len=args.max_new,
        eos_tokens_id=cfg.text_config.eos_token_id,
        pad_token_id=cfg.text_config.pad_token_id)
    print(f"speculative text decode: {len(out)} tokens, "
          f"acceptance={acc:.2f}")


if __name__ == "__main__":
    main()
