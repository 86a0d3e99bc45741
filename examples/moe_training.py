"""Expert-parallel MoE causal-LM training + decode parity demo.

Beyond-reference scaling extension (SURVEY.md §2.4: the reference has no
MoE/EP): a Qwen-style decoder whose MLPs are top-k-routed SwiGLU expert
banks (``QwenConfig(num_experts=...)``), trained on a (data, ep) mesh —
experts sharded over the ``ep`` axis by ``parallel.mesh`` rules, GSPMD
inserting the dispatch/combine collectives — with the router's Switch
load-balancing loss threaded through the trainer metrics. Ends with a
cached-greedy-decode parity check on the trained params (inference routing
is dropless, so the cached path is token-exact vs the full forward).

Run: ``python examples/moe_training.py`` (synthetic data; uses an 8-device
virtual CPU mesh unless real multi-device hardware is present).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# virtual 8-device CPU mesh when the process would otherwise see one chip
if "host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               " --xla_force_host_platform_device_count=8")

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import vyomai_tpu as vt
from vyomai_tpu.ops.fused import cross_entropy
from vyomai_tpu.parallel import shard_params
from vyomai_tpu.training import (MetricLogger, create_train_state,
                                 make_optimizer, make_train_step)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--experts", type=int, default=8)
    ap.add_argument("--data-par", type=int, default=2)
    args = ap.parse_args()

    devices = jax.devices("cpu") if jax.default_backend() != "cpu" \
        else jax.devices()
    n = len(devices)
    dp = min(args.data_par, n)
    ep = n // dp
    mesh = Mesh(np.asarray(devices[:dp * ep]).reshape(dp, ep), ("data", "ep"))
    print(f"mesh: data={dp} x ep={ep} ({jax.default_backend()} backend, "
          f"{n} devices visible)")

    cfg = vt.QwenConfig(
        vocab_size=2048, hidden_size=256, intermediate_size=512,
        num_hidden_layers=4, num_attention_heads=8, num_key_value_heads=4,
        head_dim=32, max_position_embeddings=128, qk_norm=False,
        tie_word_embeddings=True, num_experts=args.experts,
        num_experts_per_tok=2)
    model = vt.ModelForCausalLM(cfg)
    params = shard_params(model.init(jax.random.PRNGKey(0)), mesh)
    total = sum(x.size for x in jax.tree_util.tree_leaves(params))
    active = total - (args.experts - cfg.num_experts_per_tok) * \
        cfg.num_hidden_layers * 3 * cfg.hidden_size * cfg.intermediate_size
    print(f"params: {total / 1e6:.1f}M total, ~{active / 1e6:.1f}M active/tok")

    def loss_fn(p, batch, rng):
        out = model.apply(p, batch["ids"], train=True)  # capacity dropping on
        ce = cross_entropy(out.logits[:, :-1], batch["ids"][:, 1:])
        return (ce + cfg.router_aux_loss_coef * out.aux_loss,
                {"ce": ce, "aux_loss": out.aux_loss})

    opt = make_optimizer(3e-4)
    step = make_train_step(loss_fn, opt)
    state = create_train_state(params, opt)
    logger = MetricLogger(print_every=5)

    rng_np = np.random.default_rng(0)
    batch_sharding = NamedSharding(mesh, P("data"))
    rng = jax.random.PRNGKey(1)
    t0 = time.time()
    for i in range(args.steps):
        ids = rng_np.integers(3, cfg.vocab_size, size=(4 * dp, 64))
        batch = {"ids": jax.device_put(ids.astype(np.int32), batch_sharding)}
        rng, r = jax.random.split(rng)
        state, metrics = step(state, batch, r)
        logger.log(i + 1, metrics)
    dt = time.time() - t0
    print(f"{args.steps} steps in {dt:.1f}s "
          f"({args.steps * 4 * dp * 64 / dt:.0f} tokens/s)")

    # -- decode parity on the TRAINED params: cached greedy == full forward
    params = jax.device_get(state.params)
    ids = jnp.asarray(rng_np.integers(3, cfg.vocab_size, size=(1, 12)),
                      jnp.int32)
    full = model.apply(params, ids).logits
    cache = model.init_cache(batch_size=1, max_len=32)
    out = model.apply(params, ids[:, :6], cache=cache, start_pos=0)
    cache = out.kv_cache
    ok = True
    for t in range(6, 12):
        out = model.apply(params, ids[:, t:t + 1], cache=cache, start_pos=t)
        cache = out.kv_cache
        ok &= int(jnp.argmax(out.logits[0, 0])) == int(jnp.argmax(full[0, t]))
    print(f"cached greedy decode parity on trained MoE params: "
          f"{'OK' if ok else 'MISMATCH'}")
    assert ok


if __name__ == "__main__":
    main()
