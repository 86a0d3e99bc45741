"""Medusa self-speculative serving, end to end (arXiv:2401.10774):

1. train a small causal LM on a synthetic next-token task,
2. train K Medusa heads on the FROZEN model's hidden states
   (``training.medusa_loss`` — gradient reaches only the heads),
3. serve the same prompts with and without ``medusa_params=`` and show
   the speedup; greedy output is asserted token-exact between the two.

The heads replace a draft model: gamma proposals per round are one
batched einsum over the hidden state the previous verification already
produced, riding the verify dispatch — no second model, no second KV
pool (extends reference ``speculative_decoding.py``'s draft-model scheme
with a drafter-free flavor the reference does not have).

Runs standalone on CPU or TPU: ``python examples/medusa_serving.py``.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

import vyomai_tpu as vt
from vyomai_tpu.layers.medusa import medusa_init
from vyomai_tpu.ops.fused import cross_entropy
from vyomai_tpu.serving import ContinuousBatchEngine
from vyomai_tpu.training import medusa_loss

VOCAB, ACTIVE = 1024, 97


def batches(rng, n, batch=16, seq=64):
    """x_{t+1} = (7 x_t + 3) mod ACTIVE — deterministic and learnable, so
    trained heads reach high acceptance and the demo shows real speedup."""
    for _ in range(n):
        x = np.empty((batch, seq), dtype=np.int32)
        x[:, 0] = rng.integers(0, ACTIVE, size=batch)
        for t in range(1, seq):
            x[:, t] = (7 * x[:, t - 1] + 3) % ACTIVE
        yield jnp.asarray(x)


def main():
    cfg = vt.QwenConfig(vocab_size=VOCAB, hidden_size=256,
                        intermediate_size=512, num_hidden_layers=4,
                        num_attention_heads=8, num_key_value_heads=4,
                        head_dim=32, max_position_embeddings=512,
                        qk_norm=True, eos_token_id=-1,
                        tie_word_embeddings=True)
    model = vt.ModelForCausalLM(cfg)
    params = model.init(jax.random.PRNGKey(0))

    # -- 1. train the base model
    opt = optax.adamw(1e-3)

    @jax.jit
    def train_step(p, st, ids):
        def loss_fn(p):
            return cross_entropy(model.apply(p, ids).logits[:, :-1],
                                 ids[:, 1:])
        loss, g = jax.value_and_grad(loss_fn)(p)
        upd, st = opt.update(g, st, p)
        return optax.apply_updates(p, upd), st, loss

    st = opt.init(params)
    for ids in batches(np.random.default_rng(0), 150):
        params, st, loss = train_step(params, st, ids)
    print(f"base model trained: loss {float(loss):.3f}")

    # -- 2. train Medusa heads on the frozen model
    heads = medusa_init(None, cfg.hidden_size, num_heads=4)
    hopt = optax.adam(2e-3)

    @jax.jit
    def head_step(m, st, ids):
        def loss_fn(m):
            hidden = model.apply(params, ids).hidden_state
            return medusa_loss(params, m, hidden, ids)
        loss, g = jax.value_and_grad(loss_fn)(m)
        upd, st = hopt.update(g, st, m)
        return optax.apply_updates(m, upd), st, loss

    hst = hopt.init(heads)
    for ids in batches(np.random.default_rng(1), 120):
        heads, hst, hloss = head_step(heads, hst, ids)
    print(f"medusa heads trained: per-offset CE {float(hloss):.3f}")

    # -- 3. serve with and without the heads
    rng = np.random.default_rng(7)
    prompts = [[int(t) for t in next(iter(batches(rng, 1, batch=1,
                                                  seq=16)))[0]]
               for _ in range(8)]
    kw = dict(num_blocks=256, block_size=16, max_batch=8,
              max_blocks_per_seq=16, max_new_tokens=96,
              prefill_buckets=(16, 32))

    def serve(tag, **extra):
        eng = ContinuousBatchEngine(model, params, **kw, **extra)
        sids = [eng.submit(list(p)) for p in prompts]
        eng.run()  # warm pass pays compilation
        sids = [eng.submit(list(p)) for p in prompts]
        t0 = time.perf_counter()
        out = eng.run()
        dt = time.perf_counter() - t0
        n = sum(len(out[s]) for s in sids)
        print(f"[{tag:6s}] {n / dt:8.1f} tok/s")
        return [out[s] for s in sids], eng

    plain, _ = serve("plain", decode_horizon=32)
    spec, eng = serve("medusa", medusa_params=heads, gamma=4, spec_rounds=8)
    assert spec == plain, "medusa serving must be token-exact vs plain"
    acc = eng.spec_stats["accepted"] / max(1, eng.spec_stats["speculated"])
    print(f"token-exact ✓  acceptance {acc:.2f}")


if __name__ == "__main__":
    main()
