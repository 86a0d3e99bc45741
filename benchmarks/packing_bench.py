"""Packed vs padded SFT training throughput (single chip).

Same model, same [B, S] device step shape, same instruction data: the
padded collate spends one row per example (the reference's
``sft_collate`` regime), packing (``training.pack_sft``) fills each row
with several examples under in-kernel segment masks. Step times are
nearly equal — the win is REAL (loss-contributing) tokens per second,
which scales with row occupancy.

Run on the TPU chip: ``python benchmarks/packing_bench.py``
"""

import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(__file__), "..")))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import vyomai_tpu as vt  # noqa: E402
from vyomai_tpu.ops.fused import cross_entropy  # noqa: E402
from vyomai_tpu.training import (create_train_state, make_optimizer,  # noqa: E402
                                 make_train_step, pack_sft,
                                 packing_efficiency)
from vyomai_tpu.utils import device_sync  # noqa: E402

CFG = vt.EncoderConfig(
    hidden_size=768, num_attention_heads=12, num_key_value_heads=4,
    num_hidden_layers=8, vocab_size=16384, max_position_embeddings=1024,
    intermediate_size=3072, hidden_dropout_prob=0.0, pad_token_id=1)
B, S = 8, 1024
STEPS = 10


def synthetic_pairs(rng, n):
    """Instruction-length long tail: mean total ~180 tokens << S."""
    pairs = []
    for _ in range(n):
        plen = int(rng.integers(8, 64))
        alen = int(np.clip(rng.exponential(140) + 8, 8, S - 72))
        pairs.append((list(rng.integers(5, CFG.vocab_size, size=plen)),
                      list(rng.integers(5, CFG.vocab_size, size=alen))))
    return pairs


def _measure(step, state, batch):
    state, m = step(state, batch, jax.random.PRNGKey(0))
    device_sync(m["loss"])            # compile + warmup, true barrier
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, m = step(state, batch, jax.random.PRNGKey(0))
    device_sync(m["loss"])
    return (time.perf_counter() - t0) / STEPS


def bench_packing():
    model = vt.DecoderModel(CFG, pos_embedding_type="rope",
                            attention_type="gqa")
    params = model.init(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    pairs = synthetic_pairs(rng, 4096)
    mean_len = float(np.mean([len(p) + len(a) + 1 for p, a in pairs]))

    # ---- padded collate: one example per row, truncated/padded to S
    ids = np.full((B, S), CFG.pad_token_id, np.int32)
    labels = np.full((B, S), -100, np.int32)
    for r, (p, a) in enumerate(pairs[:B]):
        toks = (p + a + [2])[:S]
        ids[r, :len(toks)] = toks
        for i in range(len(p) - 1, len(toks) - 1):   # loss on answer + eos
            labels[r, i] = toks[i + 1]
    mask = (ids != CFG.pad_token_id).astype(np.int32)
    padded_batch = {"ids": jnp.asarray(ids), "mask": jnp.asarray(mask),
                    "labels": jnp.asarray(labels)}
    padded_real = int((labels != -100).sum())

    def padded_loss(p, batch, rng_):
        out = model.apply(p, batch["ids"], batch["mask"])
        return cross_entropy(out.logits, batch["labels"]), {}

    # ---- packed rows: same data distribution, B rows of S
    packed = pack_sft(pairs, S, pad_id=CFG.pad_token_id, eos_id=2)
    eff = packing_efficiency(packed)
    packed_batch = {
        "ids": jnp.asarray(packed["ids"][:B]),
        "seg": jnp.asarray(packed["segment_ids"][:B]),
        "pos": jnp.asarray(packed["positions"][:B]),
        "labels": jnp.asarray(packed["labels"][:B])}
    packed_real = int((packed["labels"][:B] != -100).sum())

    def packed_loss(p, batch, rng_):
        out = model.apply(p, batch["ids"], segment_ids=batch["seg"],
                          positions=batch["pos"])
        return cross_entropy(out.logits, batch["labels"]), {}

    opt = make_optimizer(1e-4)

    def fresh_state():   # the jitted step donates state buffers
        return create_train_state(
            jax.tree_util.tree_map(jnp.copy, params), opt)

    dt_padded = _measure(make_train_step(padded_loss, opt),
                         fresh_state(), padded_batch)
    dt_packed = _measure(make_train_step(packed_loss, opt),
                         fresh_state(), packed_batch)

    padded_tps = padded_real / dt_padded
    packed_tps = packed_real / dt_packed
    rec = {
        "padded_step_s": round(dt_padded, 4),
        "packed_step_s": round(dt_packed, 4),
        "padded_real_tokens_per_sec": round(padded_tps, 1),
        "packed_real_tokens_per_sec": round(packed_tps, 1),
        "ratio": round(packed_tps / padded_tps, 3),
        "occupancy_padded": round(padded_real / (B * S), 4),
        "occupancy_packed": round(eff, 4),
        "mean_example_len": round(mean_len, 1),
        "step_overhead": round(dt_packed / dt_padded, 3),
    }
    return rec


if __name__ == "__main__":
    import json
    print(json.dumps(bench_packing(), indent=1))
