"""Speculative serving benchmark (real TPU chip).

Measures the continuous-batching engine with a draft model
(``paged_model.speculative_horizon``) against the same engine's plain
horizon decode, on a ~0.9B-param target whose decode step is
weight-stream-bound — the regime speculation is for: one target weight
stream verifies up to ``gamma + 1`` tokens per lane instead of one.

Acceptance realism (same scheme as ``speculative_bench.py``): random-init
models draft garbage, so target and draft are first trained for a few
hundred steps on a deterministic synthetic next-token task (an LCG over a
499-token active vocab), driving both to peaked agreeing argmaxes. The
engine is greedy, so the reported tokens are token-exact between the two
runs (asserted).

Prints one human-readable block + one JSON line:
  {"metric": "serving_speculative", "spec_tokens_per_sec": ...,
   "plain_tokens_per_sec": ..., "speedup": ..., "acceptance": ...}
"""

import argparse
import gc
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
from vyomai_tpu.ops.fused import cross_entropy
from vyomai_tpu.serving import ContinuousBatchEngine
from vyomai_tpu.training import (create_train_state, make_optimizer,
                                 make_train_step)

VOCAB = 32_768
ACTIVE = 499             # active synthetic vocab (prime)
MAX_POS = 1024

# ~0.9B-param target (quant_bench's e2e model): decode streams ~1.8 GB of
# bf16 weights per step, so cutting target steps is the whole game
TARGET_CFG = vt.QwenConfig(
    vocab_size=VOCAB, hidden_size=2048, intermediate_size=8192,
    num_hidden_layers=12, num_attention_heads=16, num_key_value_heads=4,
    head_dim=128, max_position_embeddings=MAX_POS, qk_norm=True,
    eos_token_id=-1, tie_word_embeddings=True)
DRAFT_CFG = vt.QwenConfig(
    vocab_size=VOCAB, hidden_size=512, intermediate_size=2048,
    num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
    head_dim=64, max_position_embeddings=MAX_POS, qk_norm=True,
    eos_token_id=-1, tie_word_embeddings=True)


def synthetic_batch(rng: np.random.Generator, batch: int, seq: int,
                    active: int = ACTIVE):
    """x_{t+1} = (7 * x_t + 3) mod active — deterministic, learnable.

    ``active`` sets the cycle length: 499 (prime, long cycle) for the
    draft-model bench; a small modulus (short cycle) for the ngram bench,
    whose prompt-lookup proposer needs the output to revisit bigrams —
    the self-repetitive regime ngram speculation is for."""
    x = np.empty((batch, seq), dtype=np.int32)
    x[:, 0] = rng.integers(0, active, size=batch)
    for t in range(1, seq):
        x[:, t] = (7 * x[:, t - 1] + 3) % active
    return x


_CORPUS = None


def corpus_tokens() -> np.ndarray:
    """Natural-text token stream: the repo's own README + docs/*.md as
    BYTES, shifted to ids [2, 258) (0/1 reserved, eos=VOCAB-1 untouched).
    This is the VERDICT-r4 honest second workload for ngram speculation —
    real English statistics instead of a short-cycle task built to flatter
    prompt-lookup."""
    global _CORPUS
    if _CORPUS is None:
        import glob as _glob
        root = _os.path.join(_os.path.dirname(__file__), "..")
        text = b""
        for p in [_os.path.join(root, "README.md")] + sorted(
                _glob.glob(_os.path.join(root, "docs", "*.md"))):
            with open(p, "rb") as f:
                text += f.read() + b"\n\n"
        _CORPUS = np.frombuffer(text, dtype=np.uint8).astype(np.int32) + 2
    return _CORPUS


def natural_batch(rng: np.random.Generator, batch: int, seq: int,
                  active: int = None):
    """Random corpus windows (byte-level natural text)."""
    c = corpus_tokens()
    starts = rng.integers(0, len(c) - seq, size=batch)
    return np.stack([c[s:s + seq] for s in starts])


def train(model, steps: int, batch: int = 8, seq: int = 64,
          lr: float = 1e-3, warmup: int = 50, seed: int = 0,
          active: int = ACTIVE, sampler=synthetic_batch):
    params = model.init(jax.random.PRNGKey(seed), dtype=jnp.bfloat16)

    def loss_fn(p, b, rng):
        out = model.apply(p, b["ids"])
        return cross_entropy(out.logits[:, :-1], b["ids"][:, 1:]), {}

    opt = make_optimizer(lr, warmup_steps=warmup)
    step = make_train_step(loss_fn, opt)
    state = create_train_state(params, opt)
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    loss = None
    for _ in range(steps):
        ids = jnp.asarray(sampler(rng, batch, seq, active))
        state, m = step(state, {"ids": ids}, key)
        loss = m["loss"]
    return jax.device_get(state.params), float(loss)  # fetch = true sync


def train_medusa_heads(model, params, steps: int, *, k_heads: int = 4,
                       batch: int = 8, seq: int = 64, lr: float = 1e-3,
                       seed: int = 2, active: int = ACTIVE,
                       sampler=synthetic_batch):
    """Medusa-1 head training over the FROZEN trained target: grad flows
    only into the K head blocks (``training.losses.medusa_loss`` stops it
    at the hidden states and the reused lm_head). On the deterministic
    synthetic task every offset is a function of the current token, so
    trained heads approach perfect acceptance — the bench then measures
    the SERVING mechanics (one verify dispatch per gamma+1 tokens), not
    head quality."""
    import optax

    from vyomai_tpu.training.losses import medusa_loss
    from vyomai_tpu.layers.medusa import medusa_init

    heads = medusa_init(None, model.config.hidden_size, k_heads)
    opt = optax.adam(lr)

    # params is a jit ARGUMENT, not a closure: closing over the ~1.8 GB
    # host tree would embed it in the lowered program as constants (the
    # remote compile helper rejects such payloads with HTTP 413)
    @jax.jit
    def step(p, m, st, ids):
        def loss_fn(m):
            hidden = model.apply(p, ids).hidden_state
            return medusa_loss(p, m, hidden, ids)
        loss, g = jax.value_and_grad(loss_fn)(m)
        upd, st = opt.update(g, st, m)
        return optax.apply_updates(m, upd), st, loss

    params = jax.tree_util.tree_map(jnp.asarray, params)  # commit once
    st = opt.init(heads)
    rng = np.random.default_rng(seed)
    loss = None
    for _ in range(steps):
        ids = jnp.asarray(sampler(rng, batch, seq, active))
        heads, st, loss = step(params, heads, st, ids)
    return jax.device_get(heads), float(loss)


def _fingerprint(cfg, **hp) -> str:
    """8-hex digest of the model config + train hyperparams, so editing
    TARGET_CFG/DRAFT_CFG or lr/warmup/seed invalidates the pickle cache
    instead of silently reusing stale trained params (code-review r3)."""
    import dataclasses
    import hashlib
    import json
    d = (dataclasses.asdict(cfg) if dataclasses.is_dataclass(cfg)
         else dict(vars(cfg)))
    d.update(hp)
    return hashlib.sha1(
        json.dumps(d, sort_keys=True, default=str).encode()).hexdigest()[:8]


def _cached_train(model, cache_key: str, sampler=synthetic_batch, **kw):
    """Train once per (model config, workload) and pickle the host params
    to /tmp — the 0.9B train costs ~6 min on-chip, and bench iterations
    (debugging a phase, re-recording a metric) shouldn't repay it.
    Returns ``(params, loss)``; loss is None when served from cache.
    ``sampler`` is keyed by ``cache_key``, not fingerprinted (function
    reprs embed addresses and would bust the cache every process)."""
    import pickle
    tag = _fingerprint(getattr(model, "config", None), **kw)
    path = f"/tmp/spec_bench_{cache_key}_{tag}.pkl"
    if _os.path.exists(path):
        print(f"[train] cached params: {path}", flush=True)
        with open(path, "rb") as f:
            return pickle.load(f), None
    params, loss = train(model, sampler=sampler, **kw)
    with open(path, "wb") as f:
        pickle.dump(params, f)
    return params, loss


def run_spec_bench(speculator: str = "draft", steps: int = 400,
                   gamma: int = 4, rounds: int = 8, requests: int = 16,
                   prompt: int = 32, new: int = 128, batch: int = 8,
                   active: int = None, workload: str = "cycle") -> dict:
    """Train target (+ draft), then measure speculative vs plain serving.
    The exactness assertion is SOUND here because the trained model's
    argmax gaps are decisive (unlike random-init logits, whose top-2 gaps
    sit below TPU matmul rounding and flip across differently-fused
    programs).

    ``workload="cycle"`` is the deterministic short-cycle task (prompt-
    lookup's best case by construction); ``workload="natural"`` trains and
    prompts on the repo's own docs as a byte stream — English statistics,
    the honest second number VERDICT r4 asked for."""
    active = active or (41 if speculator == "ngram" else 499)
    natural = workload == "natural"
    sampler = natural_batch if natural else synthetic_batch
    train_seq = 128 if natural else 64

    target = vt.ModelForCausalLM(TARGET_CFG)
    t0 = time.perf_counter()
    ckey = (f"target_nat{len(corpus_tokens())}_{steps}" if natural
            else f"target_{active}_{steps}")
    t_params, t_loss = _cached_train(target, ckey, sampler=sampler,
                                     steps=steps, lr=3e-4, warmup=100,
                                     seed=0, active=active, seq=train_seq)
    fmt = lambda l: "cached" if l is None else f"{l:.3f}"  # noqa: E731
    wtag = f"nat{len(corpus_tokens())}" if natural else str(active)
    d_params = draft = m_heads = None
    if speculator == "draft":
        draft = vt.ModelForCausalLM(DRAFT_CFG)
        d_params, d_loss = _cached_train(draft, f"draft_{wtag}_{steps}",
                                         sampler=sampler,
                                         steps=steps, lr=1e-3, seed=1,
                                         active=active, seq=train_seq)
        print(f"[train] {steps} steps each: target loss {fmt(t_loss)}, "
              f"draft loss {fmt(d_loss)} ({time.perf_counter() - t0:.0f}s)")
    elif speculator == "medusa":
        import pickle
        m_steps = max(1, steps // 2)  # heads are 17M params on a solved task
        tag = _fingerprint(TARGET_CFG, medusa=True, steps=m_steps,
                           k_heads=max(4, gamma), active=active,
                           target_steps=steps, workload=workload)
        path = f"/tmp/spec_bench_medusa_{tag}.pkl"
        if _os.path.exists(path):
            print(f"[train] cached medusa heads: {path}", flush=True)
            with open(path, "rb") as f:
                m_heads = pickle.load(f)
            m_loss = None
        else:
            m_heads, m_loss = train_medusa_heads(
                target, t_params, m_steps, k_heads=max(4, gamma),
                active=active, sampler=sampler)
            with open(path, "wb") as f:
                pickle.dump(m_heads, f)
        print(f"[train] target loss {fmt(t_loss)}, medusa head loss "
              f"{fmt(m_loss)} ({time.perf_counter() - t0:.0f}s)")
    else:
        print(f"[train] {steps} steps: target loss {fmt(t_loss)} "
              f"(mod {active}, {time.perf_counter() - t0:.0f}s)")

    # drop the training step's device state (params + Adam moments of a
    # ~0.9B model are ~10 GB of HBM) before the engines allocate pools
    gc.collect()

    rng = np.random.default_rng(7)
    prompts = [list(row) for row in sampler(rng, requests, prompt, active)]
    maxb = -(-(prompt + new + 1) // 64) + 1
    kw = dict(num_blocks=max(256, batch * maxb * 2), block_size=64,
              max_batch=batch, max_blocks_per_seq=maxb, max_new_tokens=new,
              prefill_buckets=(32, 64), eos_token_id=VOCAB - 1)

    def run(with_spec: bool, tag: str = ""):
        # ONE engine per mode, run twice: the warm pass pays tracing +
        # remote-helper compilation (~10 min for this 0.9B engine's
        # prefill buckets + horizon/spec while_loops), the timed pass
        # reuses the same programs. Building a fresh engine per pass
        # (the old 4-engine structure) recompiled everything each time —
        # the "timed" phases measured the compile helper, not serving.
        # Flushed phase markers keep a stall attributable from the log.
        print(f"[phase] {tag} start (spec={with_spec})", flush=True)
        if with_spec and speculator == "ngram":
            eng = ContinuousBatchEngine(target, t_params,
                                        ngram_speculation=True,
                                        gamma=gamma,
                                        spec_rounds=rounds, **kw)
        elif with_spec and speculator == "medusa":
            eng = ContinuousBatchEngine(target, t_params,
                                        medusa_params=m_heads,
                                        gamma=gamma,
                                        spec_rounds=rounds, **kw)
        elif with_spec:
            eng = ContinuousBatchEngine(target, t_params, draft_model=draft,
                                        draft_params=d_params,
                                        gamma=gamma,
                                        spec_rounds=rounds, **kw)
        else:
            eng = ContinuousBatchEngine(target, t_params, decode_horizon=64,
                                        **kw)

        def one_pass(label):
            for p in prompts:
                eng.submit(list(p))
            c0 = dict(eng.counters)
            t0 = time.perf_counter()
            ticks = []
            while eng.waiting or eng.active or eng.needs_prefill:
                t1 = time.perf_counter()
                eng.step()
                ticks.append(time.perf_counter() - t1)
            out = {sid: s.tokens[s.prompt_len:]
                   for sid, s in eng.finished.items()}
            eng.finished.clear()
            dt = time.perf_counter() - t0
            n = sum(len(v) for v in out.values())
            print(f"[phase] {tag}-{label} done: {n} tokens in {dt:.1f}s",
                  flush=True)
            if label == "timed":
                # per-tick attribution: where does the wall time go?
                c1 = eng.counters
                dticks = c1["decode_ticks"] - c0.get("decode_ticks", 0)
                sticks = c1["spec_ticks"] - c0.get("spec_ticks", 0)
                pcalls = c1["prefill_calls"] - c0.get("prefill_calls", 0)
                ticks_sorted = sorted(ticks)
                print(json.dumps({
                    "metric": "spec_tick_profile", "mode": tag,
                    "n_ticks": len(ticks),
                    "tick_mean_ms": round(1e3 * sum(ticks) / len(ticks), 1),
                    "tick_p50_ms": round(
                        1e3 * ticks_sorted[len(ticks) // 2], 1),
                    "tick_max_ms": round(1e3 * ticks_sorted[-1], 1),
                    "decode_ticks": dticks, "spec_ticks": sticks,
                    "prefill_calls": pcalls,
                    "tokens": n, "wall_s": round(dt, 2),
                    "tok_per_tick": round(n / max(1, len(ticks)), 1),
                }), flush=True)
            return n / dt, out

        one_pass("warm")
        tps, out = one_pass("timed")
        acc = None
        if with_spec and eng.spec_stats["speculated"]:
            acc = eng.spec_stats["accepted"] / eng.spec_stats["speculated"]
        del eng
        gc.collect()  # drop engine pool before the next mode's engine
        return tps, out, acc

    plain_tps, plain_out, _ = run(False, "plain")
    spec_tps, spec_out, acc = run(True, "spec")
    agreement = None
    if natural:
        # natural text leaves genuine near-ties in the logits: greedy
        # argmax flips between the two engines' differently-fused
        # programs (bf16 rounding), so exactness is measured as the mean
        # agreed-prefix share rather than asserted — speculation itself
        # is still greedy-exact WITHIN an engine by construction
        total = agreed = 0
        for sid in plain_out:
            a, b = plain_out[sid], spec_out[sid]
            n = next((i for i, (x, y) in enumerate(zip(a, b)) if x != y),
                     min(len(a), len(b)))
            agreed += n
            total += max(len(a), len(b))
        agreement = agreed / max(total, 1)
        print(f"[natural] greedy agreed-prefix share {agreement:.2f} "
              f"(tie-flips across engine programs)")
    else:
        assert spec_out == plain_out, \
            "speculative output drifted from greedy"
    print(f"[plain]       {plain_tps:.0f} tokens/s (horizon 64)")
    print(f"[speculative] {spec_tps:.0f} tokens/s "
          f"({speculator}, gamma={gamma}, rounds={rounds}, "
          f"acceptance={acc:.2f})")
    rec = {
        "metric": "serving_speculative",
        "speculator": speculator,
        "workload": workload,
        "spec_tokens_per_sec": round(spec_tps, 1),
        "plain_tokens_per_sec": round(plain_tps, 1),
        "speedup": round(spec_tps / plain_tps, 3),
        "acceptance": round(acc, 3),
        "gamma": gamma, "rounds": rounds,
        "batch": batch, "requests": requests,
    }
    if agreement is not None:
        rec["greedy_agreement"] = round(agreement, 3)
    print(json.dumps(rec))
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--gamma", type=int, default=4)
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--requests", type=int, default=16)
    ap.add_argument("--prompt", type=int, default=32)
    ap.add_argument("--new", type=int, default=128)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--speculator", choices=("draft", "ngram", "medusa"),
                    default="draft")
    ap.add_argument("--active", type=int, default=None,
                    help="synthetic vocab modulus (cycle length); default "
                         "41 for ngram, 499 otherwise")
    ap.add_argument("--workload", choices=("cycle", "natural"),
                    default="cycle",
                    help="'natural' trains/prompts on the repo docs as a "
                         "byte stream (honest ngram number)")
    args = ap.parse_args()
    run_spec_bench(args.speculator, args.steps, args.gamma, args.rounds,
                   args.requests, args.prompt, args.new, args.batch,
                   args.active, args.workload)


if __name__ == "__main__":
    main()
