"""BASELINE.md tracked metrics (VERDICT r1 #3).

Measures the two metrics BASELINE.md names — PaliGemma caption
tokens/sec/chip and ViT images/sec — plus MFU for the headline `bench.py`
training config. Prints one JSON line per metric.

Run on the TPU chip: `python benchmarks/baseline_metrics.py [--mode ...]`.
"""

import argparse
import json
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import jax.numpy as jnp
import numpy as np

import vyomai_tpu as vt

V5E_PEAK_BF16 = 197e12  # TPU v5e peak bf16 FLOP/s per chip


def bench_caption(new_tokens: int = 64, repeats: int = 3):
    """PaliGemma caption tokens/sec/chip at the reference model size
    (SigLIP-base tower + Gemma-2B decoder, the `paligemma.ipynb` config),
    batch-1 captioning: fused image+prompt prefill then cached decode."""
    cfg = vt.PaliGemmaConfig()  # reference defaults: Gemma-2B, 257k vocab
    model = vt.PaliGemmaForConditionalGeneration(cfg)
    params = model.init(jax.random.PRNGKey(0), dtype=jnp.bfloat16)

    n_img = cfg.num_image_tokens
    prompt = jnp.concatenate([
        jnp.full((1, n_img), cfg.image_token_index, dtype=jnp.int32),
        jnp.asarray([[2, 7, 11, 13, 17, 19, 23, 29]], dtype=jnp.int32),
    ], axis=1)
    pix = jax.random.normal(jax.random.PRNGKey(1),
                            (1, 3, cfg.vision_config.image_size,
                             cfg.vision_config.image_size),
                            dtype=jnp.bfloat16)

    out = model.generate(params, prompt, pix, max_new_tokens=new_tokens)
    np.asarray(out)  # compile + true sync (see bench_vit note)
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = model.generate(params, prompt, pix, max_new_tokens=new_tokens)
    np.asarray(out)
    tps = new_tokens * repeats / (time.perf_counter() - t0)
    rec = {"metric": "paligemma_caption_tokens_per_sec_per_chip",
           "value": round(tps, 1), "unit": "tokens/s",
           "prompt_tokens": int(prompt.shape[1]),
           "new_tokens": new_tokens}
    print(json.dumps(rec))
    return rec


def bench_caption_serving(requests: int = 8, new_tokens: int = 64):
    """Multimodal SERVING throughput at the same reference model size:
    ``requests`` concurrent caption requests (distinct images) through the
    continuous-batching engine — the batch-1 notebook loop
    (``bench_caption``) vs production serving. End-to-end incl. the SigLIP
    towers.

    r5 (VERDICT r4 #3 — the old 1.30x-of-batch-1 scaling): the towers now
    run as ONE batched SigLIP forward whose output STAYS ON DEVICE
    (``submit(prefix_embeds=<jax.Array>)`` — the old path fetched each
    tower to host fp32 then re-uploaded ~16 MB per prefill call over the
    tunnel), the 264-token prompts prefill in a 320 bucket instead of 512
    (1.6x less prefill compute), and all 8 prefills ride one [8, 320]
    grouped call. Phase attribution prints alongside the headline."""
    from vyomai_tpu.serving import ContinuousBatchEngine
    cfg = vt.PaliGemmaConfig()  # reference defaults: Gemma-2B, 257k vocab
    model = vt.PaliGemmaForConditionalGeneration(cfg)
    params = model.init(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    n_img = cfg.num_image_tokens
    text = [2, 7, 11, 13, 17, 19, 23, 29]
    prompt_len = n_img + len(text)
    bucket = -(-prompt_len // 64) * 64       # 264 -> 320

    pix = jax.random.normal(
        jax.random.PRNGKey(10),
        (requests, 3, cfg.vision_config.image_size,
         cfg.vision_config.image_size), dtype=jnp.bfloat16)

    def run(instrument: bool = False):
        eng = ContinuousBatchEngine(
            model.language_model, params["language_model"],
            plus_one=True, position_offset=1,
            num_blocks=512, block_size=16, max_batch=requests,
            max_blocks_per_seq=32, max_new_tokens=new_tokens,
            prefill_buckets=(bucket,), prefill_group=requests,
            decode_horizon=32,
            eos_token_id=cfg.text_config.eos_token_id)
        t0 = time.perf_counter()
        # ONE batched tower forward; output stays device-resident
        embs = model.serving_prefix_embeds(params, pix)  # [R, n_img, D]
        phases = {}
        if instrument:
            np.asarray(embs[0, 0, 0])        # true sync: bound tower time
            phases["tower_s"] = time.perf_counter() - t0
        for i in range(requests):
            eng.submit([cfg.image_token_index] * n_img + text,
                       prefix_embeds=embs[i], prefix_lm=True,
                       media_key=f"img{i}", ignore_eos=True)
        if instrument:
            t1 = time.perf_counter()
            while eng.waiting or eng.needs_prefill:
                eng.step()
            phases["prefill_s"] = time.perf_counter() - t1
        out = eng.run()
        dt = time.perf_counter() - t0
        if instrument:
            phases["decode_s"] = dt - phases["tower_s"] - phases["prefill_s"]
        toks = sum(len(v) for v in out.values())
        return toks / dt, toks, phases

    run()                                  # compile
    tps, toks, _ = run()
    _, _, phases = run(instrument=True)
    rec = {"metric": "paligemma_caption_serving_tokens_per_sec",
           "value": round(tps, 1), "unit": "tokens/s",
           "requests": requests, "new_tokens": new_tokens,
           "tokens": toks,
           "phases": {k: round(v, 3) for k, v in phases.items()}}
    print(json.dumps(rec))
    return rec


def bench_vit(batch: int = 128, repeats: int = 10):
    """ViT-base images/sec (224x224/16 -> 197 tokens), bf16 forward.

    Perf story (r4, benchmarks/vit_profile.py + docs/kernels.md): the
    packed short-attention kernel (ops/short_attention.py, scores stay in
    VMEM, head-paired MXU packing, no qkv transposes) plus the bf16
    tanh-polynomial GELU took this from 2,321 to ~3,960 img/s = 70.6% MFU
    at 2-FLOPs/MAC accounting (35.1 GF/image) — within ~8% of the chip's
    own pure-matmul ceiling at these shapes (ffn chains 76.7%). r3
    history: the XLA attention path beat padded FLASH at L=197 (1.5k vs
    2.2-2.3k — pad-to-256 + per-(b,h) grid overhead), and batch 128 is
    the throughput knee (2314 img/s vs
    2200 at 32, 2167 at 256). 2314 img/s = ~81 TFLOP/s = 41% of nominal
    peak; r2's "20% of roofline" divided MACs by the FLOP peak. The
    practical bound for this model on this chip is ~60%: pure bf16
    768<->3072 FFN chains sustain 80% and 768x768 projection chains ~40%,
    and attention at the unaligned 197 length pads its score matmuls.
    The measurement rides the forward at its best batch."""
    cfg = vt.VisionConfig(num_hidden_layers=12, hidden_dropout_prob=0.0)
    model = vt.Vit(cfg)
    params = model.init(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    images = jax.random.normal(jax.random.PRNGKey(1), (batch, 3, 224, 224),
                               dtype=jnp.bfloat16)

    # Timing on the remote-attached chip: block_until_ready does NOT
    # synchronize execution (it returns on handle creation), so reduce to a
    # scalar inside jit, pipeline the dispatches, and force one host fetch
    # at the end — programs execute in dispatch order, so the final fetch
    # bounds them all without paying a ~25ms RTT per iteration.
    fwd = jax.jit(lambda p, x: jnp.sum(model.apply(p, x).logits))
    float(fwd(params, images))  # compile + sync
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fwd(params, images)
    float(out)
    ips = batch * repeats / (time.perf_counter() - t0)
    rec = {"metric": "vit_images_per_sec", "value": round(ips, 1),
           "unit": "images/s", "batch": batch}
    print(json.dumps(rec))
    return rec


def bench_mfu():
    """MFU of the headline `bench.py` fused training step: model FLOPs
    (6N per token + attention 12*L*S*H) over v5e peak bf16."""
    import bench

    tps = bench.measure(fused=True)
    cfg, seq = bench.CFG, bench.SEQ
    model = vt.DecoderModel(cfg, pos_embedding_type="rope",
                            attention_type="gqa")
    params = model.init(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(params))
    flops_per_token = 6 * n_params + \
        12 * cfg.num_hidden_layers * seq * cfg.hidden_size
    mfu = flops_per_token * tps / V5E_PEAK_BF16
    rec = {"metric": "train_mfu_vs_v5e_peak_bf16",
           "value": round(mfu, 4), "unit": "fraction",
           "tokens_per_sec": round(tps, 1),
           "params": n_params}
    print(json.dumps(rec))
    return rec


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["caption", "caption_serving",
                                       "vit", "mfu", "all"],
                    default="all")
    args = ap.parse_args()
    if args.mode in ("vit", "all"):
        bench_vit()
    if args.mode in ("caption", "all"):
        bench_caption()
    if args.mode in ("caption_serving", "all"):
        bench_caption_serving()
    if args.mode in ("mfu", "all"):
        bench_mfu()
