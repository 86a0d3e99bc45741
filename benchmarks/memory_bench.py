"""Training-step memory comparison: fused (flash + chunked CE + remat) vs
naive path — the reference's 1.3x peak-memory claim, on-chip.

Uses XLA's compiled memory analysis (temp/activation bytes of the train
step executable): deterministic, and available even where runtime
``memory_stats`` isn't (the axon tunnel returns None)."""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import jax.numpy as jnp

import vyomai_tpu as vt
from vyomai_tpu.layers.attention import set_sdpa_impl
from vyomai_tpu.ops.fused import cross_entropy, lm_head_ce_loss
from vyomai_tpu.training import create_train_state, make_optimizer, make_train_step
CFG = vt.EncoderConfig(hidden_size=768, num_attention_heads=12,
                       num_key_value_heads=4, num_hidden_layers=6,
                       vocab_size=16384, max_position_embeddings=1024,
                       intermediate_size=3072, hidden_dropout_prob=0.0)
BATCH, SEQ = 8, 1024


def measure(fused: bool) -> float:
    set_sdpa_impl("flash" if fused else "xla")
    model = vt.DecoderModel(CFG, pos_embedding_type="rope",
                            attention_type="gqa", remat=fused)
    params = model.init(jax.random.PRNGKey(0), dtype=jnp.bfloat16)

    if fused:
        def loss_fn(p, batch, rng):
            out = model.apply(p, batch["ids"], batch["mask"])
            return lm_head_ce_loss(
                out.hidden_state, p["lm_head"]["decoder"]["kernel"],
                p["lm_head"]["decoder"]["bias"], batch["ids"], shift=True,
                chunk_size=2048), {}
    else:
        def loss_fn(p, batch, rng):
            out = model.apply(p, batch["ids"], batch["mask"])
            return cross_entropy(out.logits[:, :-1], batch["ids"][:, 1:]), {}

    opt = make_optimizer(1e-4)
    state = create_train_state(params, opt)
    step = make_train_step(loss_fn, opt, donate=False)
    ids = jax.random.randint(jax.random.PRNGKey(1), (BATCH, SEQ), 0,
                             CFG.vocab_size, dtype=jnp.int32)
    batch = {"ids": ids, "mask": jnp.ones_like(ids)}
    compiled = step.lower(state, batch, jax.random.PRNGKey(2)).compile()
    ma = compiled.memory_analysis()
    if ma is None:
        return None
    return ma.temp_size_in_bytes / 1e6


if __name__ == "__main__":
    naive = measure(fused=False)
    fused = measure(fused=True)
    set_sdpa_impl("auto")
    if naive and fused:
        print(f"train-step temp memory naive: {naive:.0f} MB, "
              f"fused+remat: {fused:.0f} MB "
              f"({naive / fused:.2f}x reduction; reference claims 1.3x)")
    else:
        print("memory analysis unavailable:", naive, fused)
