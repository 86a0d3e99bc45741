"""Mesh-aware training loop (SURVEY.md §3.6 / §2.4).

Replaces the reference's HF-Accelerate wrapper (DDP, bf16, grad-accum,
clip-by-norm, tensorboard — ``vyomai-fused-kernals-2t4.ipynb`` main()) with:
- one jitted ``train_step`` whose gradient all-reduce is compiled in by
  GSPMD from the mesh shardings (data axis == DDP, model axis == TP),
- gradient accumulation as a ``lax.scan`` over microbatches,
- ``optax.clip_by_global_norm`` + any optax optimizer,
- a JSONL metric logger (tensorboard-format-free observability).
"""

import json
import time
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..parallel.mesh import create_mesh, data_sharding, shard_params


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(learning_rate=1e-4, *, clip_norm: Optional[float] = 1.0,
                   weight_decay: float = 0.0, warmup_steps: int = 0,
                   total_steps: Optional[int] = None,
                   schedule: str = "constant", kind: str = "adamw"):
    """AdamW + global-norm clipping + optional warmup-cosine schedule
    (the reference recipes' cosine LR + clip_grad_norm(1.0)).

    ``kind="muon"`` swaps the AdamW core for :func:`muon` (orthogonalized
    momentum on matrix kernels, AdamW on the rest — see
    ``training/muon.py``); the schedule then drives the Muon branch, whose
    LRs run ~100× Adam's (pass e.g. ``learning_rate=0.02``)."""
    if schedule == "cosine" and not total_steps:
        raise ValueError(
            "schedule='cosine' requires total_steps (silently running at "
            "constant LR is the surprise this error prevents)")
    if schedule == "cosine" and total_steps:
        warmup_steps = min(warmup_steps, max(total_steps - 1, 0))
        lr = optax.warmup_cosine_decay_schedule(
            0.0, learning_rate, warmup_steps, total_steps)
    elif warmup_steps:
        lr = optax.linear_schedule(0.0, learning_rate, warmup_steps)
    else:
        lr = learning_rate
    chain = []
    if clip_norm is not None:
        chain.append(optax.clip_by_global_norm(clip_norm))
    if kind == "muon":
        from .muon import muon
        chain.append(muon(lr, weight_decay=weight_decay))
    elif kind == "adamw":
        chain.append(optax.adamw(lr, weight_decay=weight_decay))
    elif kind == "adamw8bit":
        from .quant_opt import adamw8bit
        chain.append(adamw8bit(lr, weight_decay=weight_decay))
    else:
        raise ValueError(f"unknown optimizer kind: {kind!r}")
    return optax.chain(*chain)


def create_train_state(params, optimizer) -> TrainState:
    return TrainState(params=params, opt_state=optimizer.init(params),
                      step=jnp.zeros((), jnp.int32))


def make_train_step(loss_fn: Callable, optimizer, *,
                    grad_accum_steps: int = 1, donate: bool = True):
    """Build a jitted train step.

    ``loss_fn(params, batch, rng) -> (loss, aux_dict)``.
    With ``grad_accum_steps > 1`` every leading batch dim must be
    ``grad_accum_steps * microbatch``; gradients are averaged over
    microbatches via ``lax.scan`` (reference: ``accelerator.accumulate``).
    """
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def step(state: TrainState, batch, rng):
        if grad_accum_steps == 1:
            (loss, aux), grads = grad_fn(state.params, batch, rng)
        else:
            def reshape(x):
                return x.reshape(grad_accum_steps, x.shape[0] // grad_accum_steps,
                                 *x.shape[1:])
            micro = jax.tree_util.tree_map(reshape, batch)
            rngs = jax.random.split(rng, grad_accum_steps)

            def body(g_acc, xs):
                mb, r = xs
                (l, a), g = grad_fn(state.params, mb, r)
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
                return g_acc, (l, a)

            zero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            grads, (losses, auxs) = jax.lax.scan(body, zero, (micro, rngs))
            grads = jax.tree_util.tree_map(
                lambda g: g / grad_accum_steps, grads)
            loss = losses.mean()
            # aux metrics averaged over microbatches (not dropped)
            aux = jax.tree_util.tree_map(lambda x: x.mean(axis=0), auxs)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        metrics = {"loss": loss, "grad_norm": gnorm, **aux}
        return TrainState(params, opt_state, state.step + 1), metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


class MetricLogger:
    """JSONL metric sink + console prints (replaces
    ``accelerator.log``/tensorboard trackers)."""

    def __init__(self, path: Optional[str] = None, print_every: int = 50):
        self.path = path
        self.print_every = print_every
        self._fh = open(path, "a") if path else None
        self._t0 = time.time()

    def log(self, step: int, metrics: dict):
        rec = {"step": int(step), "time": round(time.time() - self._t0, 3)}
        # ONE device_get for the whole dict: per-metric float() would pay
        # one ~25 ms device->host round trip EACH on the remote-tunneled
        # chip (CLAUDE.md)
        metrics = jax.device_get(metrics)
        rec.update({k: float(v) for k, v in metrics.items()})
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        if self.print_every and step % self.print_every == 0:
            print(" ".join(f"{k}={v}" for k, v in rec.items()))

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None

    def __del__(self):
        self.close()


class Trainer:
    """Thin mesh-aware loop: shards params/data, runs jitted steps.

    ``loss_fn(params, batch, rng) -> (loss, aux)``. Pass ``mesh_shape``
    (data, model) to enable DP x TP over the available devices.
    """

    def __init__(self, model, loss_fn, *, optimizer=None,
                 mesh_shape=None, mesh_backend: Optional[str] = None,
                 grad_accum_steps: int = 1,
                 log_path: Optional[str] = None):
        self.model = model
        self.loss_fn = loss_fn
        self.optimizer = optimizer or make_optimizer()
        self.mesh = create_mesh(mesh_shape, backend=mesh_backend) \
            if mesh_shape else None
        self.grad_accum_steps = grad_accum_steps
        self.logger = MetricLogger(log_path)
        self._step_fn = make_train_step(loss_fn, self.optimizer,
                                        grad_accum_steps=grad_accum_steps)

    def init_state(self, params) -> TrainState:
        if self.mesh is not None:
            params = shard_params(params, self.mesh)
        return create_train_state(params, self.optimizer)

    def shard_batch(self, batch):
        if self.mesh is None:
            return batch
        sh = data_sharding(self.mesh)
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)

    def step(self, state: TrainState, batch, rng):
        state, metrics = self._step_fn(state, self.shard_batch(batch), rng)
        return state, metrics

    def fit(self, state: TrainState, data_iter, *, num_steps: int, rng,
            log_every: int = 10):
        for i in range(num_steps):
            batch = next(data_iter)
            rng, r = jax.random.split(rng)
            state, metrics = self.step(state, batch, r)
            # log on multiples of log_every in STEP numbering (state.step is
            # i+1), plus the first step — so MetricLogger's print_every
            # (also step-numbered) actually fires
            if i == 0 or (i + 1) % log_every == 0:
                self.logger.log(int(state.step), metrics)
        return state

    def close(self):
        self.logger.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
