"""Causal LM pretraining + 3-way generation parity demo (reference
``vyom-ai-decoder_clm.ipynb`` — N9): RoPE decoder, bf16, grad accumulation,
then greedy generation compared no-cache vs static-cache."""

import argparse

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import vyomai_tpu as vt
from vyomai_tpu.generation import generate
from vyomai_tpu.ops.fused import lm_head_ce_loss
from vyomai_tpu.training import Trainer, make_optimizer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--grad-accum", type=int, default=2)
    ap.add_argument("--optimizer", choices=("adamw", "muon", "adamw8bit"),
                    default="adamw",
                    help="muon = Newton-Schulz orthogonalized momentum on "
                         "matrix kernels (training/muon.py); its LR runs "
                         "~100x AdamW's. adamw8bit = blockwise int8 "
                         "moments (training/quant_opt.py), ~4x less "
                         "optimizer-state HBM")
    args = ap.parse_args()

    cfg = vt.EncoderConfig(hidden_size=256, num_attention_heads=8,
                           num_key_value_heads=4, num_hidden_layers=4,
                           vocab_size=2048, max_position_embeddings=128,
                           intermediate_size=1024, hidden_dropout_prob=0.0)
    model = vt.DecoderModel(cfg, pos_embedding_type="rope",
                            attention_type="gqa")
    params = model.init(jax.random.PRNGKey(0))

    rng_np = np.random.default_rng(0)
    # synthetic token stream fed through the NATIVE background batch
    # loader (csrc/data_loader.cc; bit-identical Python fallback) — the
    # producer thread packs shuffled blocks while the device steps
    corpus = rng_np.integers(3, cfg.vocab_size,
                             size=256 * 64).astype(np.int32)
    from vyomai_tpu.training import BlockBatchLoader
    loader = BlockBatchLoader(corpus, batch=16, seq=64, seed=0)
    print(f"batch loader backend: {loader.backend}")
    data_iter = iter(loader)

    def loss_fn(p, batch, rng):
        out = model.apply(p, batch["ids"], batch["mask"])
        loss = lm_head_ce_loss(out.hidden_state,
                               p["lm_head"]["decoder"]["kernel"],
                               p["lm_head"]["decoder"]["bias"],
                               batch["ids"], shift=True, chunk_size=512)
        return loss, {}

    lr = 0.02 if args.optimizer == "muon" else 3e-4
    tr = Trainer(model, loss_fn,
                 optimizer=make_optimizer(lr, kind=args.optimizer),
                 grad_accum_steps=args.grad_accum)
    state = tr.init_state(params)
    rng = jax.random.PRNGKey(1)
    for step in range(args.steps):
        ids = jnp.asarray(next(data_iter)["ids"])
        batch = {"ids": ids, "mask": jnp.ones_like(ids)}
        rng, r = jax.random.split(rng)
        state, m = tr.step(state, batch, r)
        if step % 5 == 0:
            print(f"step {step}: loss={float(m['loss']):.4f}")
    loader.close()
    data = corpus.reshape(256, 64)

    # 3-way generate parity (no-cache vs static cache)
    prompt = jnp.asarray(data[:2, :8])
    t_nc = generate(model, state.params, prompt, max_new_tokens=8,
                    use_cache=False)
    t_c = generate(model, state.params, prompt, max_new_tokens=8,
                   use_cache=True)
    print("cache parity:", bool((t_nc == t_c).all()))


if __name__ == "__main__":
    main()
