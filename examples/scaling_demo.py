"""Multi-chip scaling walkthrough on a virtual device mesh.

Demonstrates every parallelism mode the framework ships — dp, tp, fsdp,
sp (ring attention), pp (GPipe), ep (MoE) — on ``--devices`` virtual CPU
devices, so it runs anywhere (`XLA_FLAGS=--xla_force_host_platform_device_count`
is set below before JAX initializes). On a real TPU slice the same code
runs unchanged with the mesh built from ``jax.devices()``; collectives ride
ICI. SURVEY.md §2.4/§2.5 maps these onto the reference's Accelerate DDP.
"""

import argparse
import os
import sys

if "--_child" not in sys.argv:
    # re-exec with the virtual device count pinned before JAX initializes
    n = "8"
    for i, a in enumerate(sys.argv):
        if a == "--devices" and i + 1 < len(sys.argv):
            n = sys.argv[i + 1]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    flags.append(f"--xla_force_host_platform_device_count={n}")
    os.environ["XLA_FLAGS"] = " ".join(flags)
    os.execv(sys.executable, [sys.executable, __file__, "--_child"]
             + sys.argv[1:])

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import vyomai_tpu as vt
from vyomai_tpu.layers import moe
from vyomai_tpu.layers.attention import sdpa, set_sdpa_impl
from vyomai_tpu.ops.fused import cross_entropy
from vyomai_tpu.ops.ring_attention import ring_attention
from vyomai_tpu.parallel import (create_mesh, pipeline_apply, shard_params,
                                 shard_params_fsdp)
from vyomai_tpu.training import (create_train_state, make_optimizer,
                                 make_train_step)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--_child", action="store_true")
    args = ap.parse_args()
    n = args.devices
    devices = jax.devices("cpu")[:n]
    set_sdpa_impl("xla")  # tiny shapes on a CPU mesh

    cfg = vt.EncoderConfig(hidden_size=128, num_attention_heads=8,
                           num_key_value_heads=4, num_hidden_layers=4,
                           vocab_size=512, max_position_embeddings=128,
                           intermediate_size=256, hidden_dropout_prob=0.0)
    model = vt.DecoderModel(cfg, pos_embedding_type="rope",
                            attention_type="gqa")
    with jax.default_device(devices[0]):
        params = model.init(jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (2 * n, 32), 0,
                                 cfg.vocab_size, dtype=jnp.int32)
    batch = {"ids": ids, "mask": jnp.ones_like(ids)}

    def loss_fn(p, b, rng):
        out = model.apply(p, b["ids"], b["mask"])
        return cross_entropy(out.logits[:, :-1], b["ids"][:, 1:]), {}

    opt = make_optimizer(1e-3)
    step = make_train_step(loss_fn, opt, donate=False)  # state reused across sections

    # -- dp x tp: batch over `data`, attention/FFN shards over `model`
    mesh = create_mesh((n // 2, 2), devices=np.asarray(devices))
    state = create_train_state(shard_params(params, mesh), opt)
    sb = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("data"))), batch)
    state, m = step(state, sb, jax.random.PRNGKey(2))
    print(f"[dp x tp]  mesh=({n // 2},2) loss={float(m['loss']):.4f}")

    # -- fsdp: params fully sharded over the data axis (ZeRO-3 via GSPMD)
    fmesh = create_mesh((n, 1), devices=np.asarray(devices))
    state = create_train_state(
        shard_params_fsdp(params, fmesh, min_weight_size=1024), opt)
    sb = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(fmesh, P("data"))), batch)
    state, m = step(state, sb, jax.random.PRNGKey(2))
    print(f"[fsdp]     {n}-way sharded params, loss={float(m['loss']):.4f}")

    # -- sp: ring attention over all devices == single-device attention
    sp_mesh = Mesh(np.asarray(devices), ("sp",))
    q, k, v = (jax.random.normal(kk, (1, 4, 16 * n, 32))
               for kk in jax.random.split(jax.random.PRNGKey(3), 3))
    ring = ring_attention(q, k, v, mesh=sp_mesh, causal=True)
    full = sdpa(q, k, v, causal=True)
    err = float(jnp.max(jnp.abs(ring - full)))
    print(f"[sp ring]  L={16 * n} over {n} devices, max_err={err:.2e}")

    # -- pp: GPipe over all devices == sequential layer stack
    pp_mesh = Mesh(np.asarray(devices), ("pp",))
    w = jax.random.normal(jax.random.PRNGKey(4), (2 * n, 32, 32)) * 0.3
    sf = lambda lw, h: jax.lax.scan(  # noqa: E731
        lambda h, wi: (jnp.tanh(h @ wi), None), h, lw)[0]
    x = jax.random.normal(jax.random.PRNGKey(5), (4 * n, 32))
    pp = pipeline_apply(sf, w, x, mesh=pp_mesh, num_microbatches=4)
    err = float(jnp.max(jnp.abs(pp - sf(w, x))))
    print(f"[pp gpipe] {2 * n} layers / {n} stages, max_err={err:.2e}")

    # -- ep: MoE experts sharded over all devices == unsharded layer
    ep_mesh = Mesh(np.asarray(devices), ("ep",))
    mp = moe.moe_init(jax.random.PRNGKey(6), cfg, num_experts=n)
    xe = jax.random.normal(jax.random.PRNGKey(7), (2, 16, cfg.hidden_size))
    ref, _ = moe.moe_apply(mp, xe, top_k=2)
    out, aux = jax.jit(lambda p, x: moe.moe_apply(p, x, top_k=2))(
        moe.shard_experts(mp, ep_mesh), xe)
    err = float(jnp.max(jnp.abs(out - ref)))
    print(f"[ep moe]   {n} experts / {n} devices, max_err={err:.2e} "
          f"aux={float(aux):.3f}")
    set_sdpa_impl("auto")


if __name__ == "__main__":
    main()
