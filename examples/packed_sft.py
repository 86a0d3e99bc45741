"""Packed-sequence SFT: multiple instruction examples per fixed-length row.

The reference's SFT recipe right-pads each batch row to its longest example
(``vyom-ai-llm-sft-dpo-training.ipynb`` cell 14, ``sft_collate``) — with
typical instruction data most row slots are pad. Packing
(``training.pack_sft``) fills rows with several examples instead, with
per-token segment ids blocking cross-example attention (in-kernel on the
Pallas flash path) and positions restarting per example; labels are
next-token-aligned and loss-masked to answer tokens only.

Run: ``python examples/packed_sft.py [--steps N] [--seq-len L]``
Prints the packing efficiency (real-token fraction) and the effective
examples/step gain over the padded collate at the same batch shape.
"""

import argparse

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir",
                  _os.environ.get("VYOMAI_JAX_CACHE", "/tmp/jax_cache"))

import jax.numpy as jnp
import numpy as np

import vyomai_tpu as vt
from vyomai_tpu.ops.fused import cross_entropy
from vyomai_tpu.training import (Trainer, make_optimizer, pack_sft,
                                 packing_efficiency)

CFG = vt.EncoderConfig(hidden_size=256, num_attention_heads=8,
                       num_hidden_layers=4, vocab_size=2048,
                       max_position_embeddings=256, intermediate_size=1024,
                       hidden_dropout_prob=0.0, pad_token_id=1)
EOS = 2


def synthetic_pairs(rng, n=256):
    """(prompt, answer) pairs with a realistic long-tail length mix."""
    pairs = []
    for _ in range(n):
        plen = int(rng.integers(4, 24))
        alen = int(np.clip(rng.exponential(12) + 2, 2, 96))
        pairs.append((list(rng.integers(5, 2048, size=plen)),
                      list(rng.integers(5, 2048, size=alen))))
    return pairs


def main(steps: int, seq_len: int, batch_rows: int):
    model = vt.DecoderModel(CFG, pos_embedding_type="rope",
                            attention_type="gqa")
    params = model.init(jax.random.PRNGKey(0))
    rng_np = np.random.default_rng(0)
    pairs = synthetic_pairs(rng_np)

    packed = pack_sft(pairs, seq_len, pad_id=CFG.pad_token_id, eos_id=EOS)
    eff = packing_efficiency(packed)
    n_rows = packed["ids"].shape[0]
    # the padded collate would spend one row of seq_len per example
    mean_len = np.mean([len(p) + len(a) + 1 for p, a in pairs])
    print(f"packed {len(pairs)} examples into {n_rows} rows of {seq_len} "
          f"(efficiency {eff:.1%}; {eff * seq_len / mean_len:.1f} examples "
          f"per row vs 1 for the padded collate)")

    def loss_fn(p, batch, rng):
        out = model.apply(p, batch["ids"], segment_ids=batch["seg"],
                          positions=batch["pos"])
        return cross_entropy(out.logits, batch["labels"]), {}

    tr = Trainer(model, loss_fn, optimizer=make_optimizer(3e-4))
    state = tr.init_state(params)
    rng = jax.random.PRNGKey(1)
    for step in range(steps):
        i = (step * batch_rows) % max(1, n_rows - batch_rows)
        sl = slice(i, i + batch_rows)
        batch = {"ids": jnp.asarray(packed["ids"][sl]),
                 "seg": jnp.asarray(packed["segment_ids"][sl]),
                 "pos": jnp.asarray(packed["positions"][sl]),
                 "labels": jnp.asarray(packed["labels"][sl])}
        rng, r = jax.random.split(rng)
        state, m = tr.step(state, batch, r)
        if step % 5 == 0:
            print(f"[packed-sft] step {step}: loss={float(m['loss']):.4f}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--seq-len", type=int, default=256)
    ap.add_argument("--batch-rows", type=int, default=4)
    args = ap.parse_args()
    main(args.steps, args.seq_len, args.batch_rows)
