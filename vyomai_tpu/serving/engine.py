"""Continuous-batching serving engine (reference ``simple_vllm.ipynb``
``ContinuousBatchEngine`` — SURVEY.md §2.2 N4, §3.5).

Host-side scheduler (waiting room, block-budget admission, radix prefix
match, finished harvest) around jitted static-shape device steps:
- prefill: one sequence at a time, suffix padded to a power-of-two bucket
  (bounded compile count);
- decode: all active sequences in one fixed-width batch (dead lanes
  masked), so admissions/retirements never recompile.

Sampling is greedy argmax (the reference's choice).
"""

import hashlib
import time
from collections import deque
from functools import partial
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec

from . import paged_model
from .kv_manager import PagedKVManager, SequenceState


_sample_jit = jax.jit(paged_model.sample_tokens)


@jax.jit
def _sample_seeded_jit(logits, rng, temps, tps, mps, lane_seeds, gen_base):
    """Prefill-path sampling with per-request seeds: lane n's k-th
    generated token always draws from ``fold_in(PRNGKey(seed), k)`` (the
    same stream ``decode_horizon`` continues)."""
    keys = jax.vmap(jax.random.PRNGKey)(jnp.maximum(lane_seeds, 0))
    lk = jax.vmap(jax.random.fold_in)(keys, gen_base)
    return paged_model.sample_tokens(logits, rng, temps, tps, mps,
                                     lane_keys=lk, seeded=lane_seeds >= 0)


@partial(jax.jit, static_argnums=(0,))
def _score_jit(model, params, ids, lanes):
    """Teacher-forced per-token logprobs over a padded [1, T] prompt:
    position i scores token i+1 (``lanes`` [1]: multi-LoRA adapter id,
    -1 = base). Returns [T-1] fp32 (pad region junk — the caller slices
    to the true length)."""
    from ..core import nn as cnn
    with cnn.lora_lanes(lanes):
        logits = model.apply(params, ids).logits.astype(jnp.float32)
    dist = jax.nn.log_softmax(logits[:, :-1], axis=-1)
    return jnp.take_along_axis(
        dist, ids[:, 1:][..., None], axis=-1)[0, :, 0]


@jax.jit
def _pack_i32_f32(ints, floats):
    """Pack an int32 and a float32 array (same shape) into one int32
    array along axis 1 for a SINGLE host fetch — each device->host fetch
    pays a full tunnel round trip on this rig, so two fetches per decode
    tick measurably tax serving throughput (bitcast, not cast: the host
    reinterprets the second half via ``.view(np.float32)``)."""
    return jnp.concatenate(
        [ints.astype(jnp.int32),
         jax.lax.bitcast_convert_type(floats.astype(jnp.float32),
                                      jnp.int32)], axis=1)


@jax.jit
def _pack_i32x4(gen, counts, acc, spec):
    """[B, W] gen + three [B] int vectors -> one [B, W+3] int32 array
    (single fetch for the speculative tick's four results)."""
    cols = [v.astype(jnp.int32)[:, None] for v in (counts, acc, spec)]
    return jnp.concatenate([gen.astype(jnp.int32)] + cols, axis=1)


@jax.jit
def _logprob_jit(logits, tokens):
    """Raw-model logprob of each chosen token ([B, V], [B]) -> [B] fp32."""
    dist = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(
        dist, tokens[:, None].astype(jnp.int32), axis=1)[:, 0]


def _bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"prompt suffix of {n} tokens exceeds the largest "
                     f"prefill bucket {buckets[-1]}")


class ContinuousBatchEngine:
    def __init__(self, model, params, *, num_blocks: int = 256,
                 block_size: int = 16, max_batch: int = 8,
                 max_blocks_per_seq: int = 32,
                 max_new_tokens: int = 128, eos_token_id: Optional[int] = None,
                 prefill_buckets: Sequence[int] = (32, 64, 128, 256, 512),
                 dtype=jnp.bfloat16, plus_one: bool = False,
                 kv_backend: str = "auto", decode_horizon: int = 8,
                 prefill_group: int = 4, do_sample: bool = False,
                 temperature: float = 1.0, top_p: float = 1.0,
                 min_p: float = 0.0, presence_penalty: float = 0.0,
                 frequency_penalty: float = 0.0,
                 repetition_penalty: float = 1.0,
                 seed: int = 0, mesh=None, draft_model=None,
                 draft_params=None, draft_plus_one: bool = False,
                 gamma: int = 4, spec_rounds: int = 2,
                 ngram_speculation: bool = False, medusa_params=None,
                 fsms=None,
                 loras=None, return_logprobs: bool = False,
                 position_offset: int = 0, radix_cache: bool = True,
                 max_prefill_per_tick: Optional[int] = 4,
                 cache_aware_admission: bool = False,
                 pipeline_decode: bool = True):
        """``mesh``: a ``jax.sharding.Mesh`` with a ``model`` axis enables
        tensor-parallel serving — weights sharded by the Megatron
        column/row rules, the paged pool split on its kv-head width, decode
        and prefill running SPMD with GSPMD-inserted activation all-reduces
        (one per layer o_proj + down_proj). Greedy output is identical to
        the single-chip engine. The Pallas paged-decode and flash-prefill
        kernels run per shard via shard_map on each device's local heads
        and pool columns (``paged_model._tp_paged_attn`` /
        ``_tp_flash_prefill``) when the local shard shapes satisfy the
        kernels' alignment; otherwise the XLA attention path (which
        partitions cleanly under GSPMD) is used.

        ``draft_model``/``draft_params`` enable speculative decoding: each
        decode tick runs up to ``spec_rounds`` rounds of (draft ``gamma``
        tokens -> one multi-token target verification) on device
        (``paged_model.speculative_horizon``) — one target weight stream
        per up-to-``gamma+1`` tokens. The draft keeps its own paged pool
        indexed by the same block tables. Greedy only (token-exact vs the
        non-speculative engine); acceptance totals accumulate in
        ``spec_stats``.

        ``ngram_speculation=True`` enables DRAFTER-FREE speculative
        decoding by prompt lookup (vLLM's ngram speculator, in-graph):
        each decode tick runs up to ``spec_rounds`` rounds of (propose
        ``gamma`` tokens from the sequence's own history by bigram match
        -> one multi-token target verification) on device
        (``paged_model.ngram_horizon``) — no draft model, no second pool,
        and the proposer costs one vectorized compare+gather per round.
        Shines on self-repetitive outputs (summarization, code, structured
        extraction). Greedy only, token-exact vs the plain engine; same
        incompatibilities as draft-model speculation.

        ``medusa_params`` enables SELF-speculative decoding via Medusa
        heads (``layers.medusa``, arXiv:2401.10774): each decode tick runs
        up to ``spec_rounds`` rounds of (propose ``gamma`` tokens from the
        previous round's verified hidden state through the K trained head
        blocks -> one multi-token target verification) on device
        (``paged_model.medusa_horizon``). The cheapest proposer of the
        three speculative flavors: no draft model, no second pool, no
        history buffer — proposals are one batched einsum + one lm_head
        matmul riding the verification dispatch. Requires
        ``gamma <= K`` heads; token-exact vs the plain engine for ANY head
        weights (training only moves acceptance). Same incompatibilities
        as draft-model speculation.

        ``fsms``: a list of ``generation.constrained.TokenFSM`` grammars
        for guided decoding — a request submitted with ``fsm_id=i`` only
        ever emits tokens its grammar allows (structured output). The
        stacked ``[F, S, V]`` transition table lives on device; masking
        rides the horizon-decode loop (one gather per step). Incompatible
        with speculative decoding (draft proposals would be
        unconstrained).

        ``loras``: a list of LoRA adapter trees (``layers.adapters.
        inject_lora`` over these params) for MULTI-TENANT serving — a
        request submitted with ``lora_id=i`` runs base + adapter ``i``,
        while sharing the batch, the paged pool and one copy of the base
        weights with every other request (S-LoRA style). Factors are
        stacked on device (``embed_multi_lora``); each decode/prefill step
        gathers per-lane factors and adds two rank-r matmuls per linear.
        Incompatible with speculative decoding (the target verifier does
        not thread lanes).

        ``dtype`` sets the paged pool storage: ``jnp.bfloat16`` (default),
        ``jnp.int8`` (2x block capacity, per-row scales, in-kernel
        dequant, greedy-token-exact on tested models), or the string
        ``"int4"`` (4x capacity, per-(row, head) scales, documented LOSSY
        — see ``paged_model.init_pool``).

        ``radix_cache=False`` disables prefix caching entirely (every
        request bypasses radix match AND deposit) — the ablation control
        for shared-prefix workloads (``benchmarks/prefix_cache_bench.py``)
        and the right setting when prompts provably never share prefixes.

        ``return_logprobs``: track each generated token's RAW model
        log-probability (fp32 log-softmax of unmasked/untempered logits —
        the serving-API ``logprobs`` convention). Read them via
        ``run(with_logprobs=True)`` or a finished state's ``logprobs``.
        Incompatible with speculative decoding."""
        self.model = model
        self.params = params
        self.ngram_speculation = bool(ngram_speculation)
        self.medusa_params = medusa_params
        n_spec = sum((draft_model is not None, self.ngram_speculation,
                      medusa_params is not None))
        if n_spec > 1:
            raise ValueError("pick ONE speculator: draft_model, "
                             "ngram_speculation, or medusa_params")
        speculative = n_spec > 0
        self.speculative = speculative
        self.num_loras = 0
        if loras:
            if speculative:
                raise ValueError("multi-LoRA serving is incompatible with "
                                 "speculative decoding")
            from ..layers.adapters import embed_multi_lora
            self.params = embed_multi_lora(self.params, list(loras))
            self.num_loras = len(loras)
        self.cfg = model.config
        self.plus_one = plus_one  # gemma-style (1+w) RMSNorm towers
        # host scheduler: native C++ radix/allocator when available
        self.kv = None
        if kv_backend in ("auto", "native"):
            try:
                from .native import NativeKVManager, available
                if available():
                    self.kv = NativeKVManager(num_blocks, block_size)
            except Exception:
                if kv_backend == "native":
                    raise
        if self.kv is None:
            self.kv = PagedKVManager(num_blocks, block_size)
        self.block_size = block_size
        self.max_batch = max_batch
        self.max_blocks_per_seq = max_blocks_per_seq
        self.max_new_tokens = max_new_tokens
        # int OR list/tuple of ids (HF Llama-3 convention): the primary id
        # kills lanes in-graph; the full set finish-checks host-side (a
        # secondary eos ends the request at commit time, wasting at most
        # the rest of one horizon chunk)
        from ..generation.sampling import normalize_eos
        self.eos_token_id, self.eos_ids = normalize_eos(
            eos_token_id if eos_token_id is not None
            else getattr(self.cfg, "eos_token_id", None))
        self.prefill_buckets = tuple(prefill_buckets)
        # tokens decoded per host round-trip (device-side multi-step loop)
        self.decode_horizon = max(1, decode_horizon)
        # admissions prefilled per device call (padded, recompile-free)
        self.prefill_group = max(1, prefill_group)
        # prefill GROUP CALLS per scheduler tick while decodes are live
        # (None = drain all before decoding, the legacy policy; a small cap
        # bounds running sequences' inter-token latency under an arrival
        # burst — each tick then does <= cap prefill dispatches before the
        # decode dispatch). When no sequence is decoding, prefills always
        # drain freely (nobody is starving). DEFAULT 4 from the r5
        # cap x horizon x rate frontier (METRICS_r05 serving_stall_p99_ms
        # points): drain-all blows up in at least one regime (2.7 s p99
        # stall at horizon 8 / 4 req/s), cap=1 starves admissions at long
        # horizons (355 ms at horizon 32 / 12 req/s), cap=4 never exceeded
        # 214 ms anywhere on the grid — all at throughput parity (±2%).
        self.max_prefill_per_tick = (None if max_prefill_per_tick is None
                                     else max(1, max_prefill_per_tick))
        # prefer waiting requests with the longest cached prefix (radix
        # peek, no side effects); FIFO tiebreak, with an anti-starvation
        # cap on how many times one request can be passed over
        self.cache_aware_admission = bool(cache_aware_admission)
        self._admission_skip_cap = 8
        # sampling (greedy when do_sample=False — the reference's choice)
        self.do_sample = do_sample
        self.temperature = float(temperature)
        self.top_p = float(top_p)
        self.min_p = float(min_p)
        self.presence_penalty = float(presence_penalty)
        self.frequency_penalty = float(frequency_penalty)
        self.repetition_penalty = float(repetition_penalty)
        if self.repetition_penalty <= 0:
            raise ValueError("repetition_penalty must be > 0 (1.0 = off)")
        self._rng = jax.random.PRNGKey(seed)
        # pipelined plain-decode: one tick kept in flight, next tick
        # dispatched from its device carry before its results are fetched
        self.pipeline_decode = bool(pipeline_decode)
        self._inflight = None
        self.dtype = dtype
        self.pool = paged_model.init_pool(self.cfg, num_blocks, block_size,
                                          dtype=dtype)
        self.draft_model = draft_model
        self.draft_params = draft_params
        self.draft_plus_one = draft_plus_one
        self.gamma = int(gamma)
        self.spec_rounds = max(1, int(spec_rounds))
        self.spec_stats = {"accepted": 0, "speculated": 0}
        self.draft_pool = None
        if speculative:
            if do_sample:
                raise ValueError(
                    "speculative serving is greedy-only (token-exactness "
                    "vs the plain engine); do_sample=True is unsupported")
            if self.gamma < 1:
                raise ValueError("gamma must be >= 1")
        if medusa_params is not None:
            k_heads = int(medusa_params["w1"].shape[0])
            if self.gamma > k_heads:
                raise ValueError(f"gamma={self.gamma} needs at least that "
                                 f"many Medusa heads (got {k_heads})")
        if draft_model is not None:
            if draft_model.config.vocab_size != self.cfg.vocab_size:
                raise ValueError(
                    f"draft vocab {draft_model.config.vocab_size} != target "
                    f"vocab {self.cfg.vocab_size}")
            self.draft_pool = paged_model.init_pool(
                draft_model.config, num_blocks, block_size, dtype=dtype)
        # radix_cache=False: every request bypasses prefix matching AND
        # deposit (ablation/bench control; also the right setting for
        # workloads with provably disjoint prompts, where radix insert/
        # evict bookkeeping is pure overhead)
        self.radix_cache = bool(radix_cache)
        self.position_offset = int(position_offset)
        if self.position_offset and speculative:
            raise ValueError("position_offset (PaliGemma 1-indexed RoPE) "
                             "is unsupported with speculative decoding")
        self.mesh = mesh
        self._allow_pallas = True
        # static `mesh` kwarg for the jitted steps: under TP the Pallas
        # kernels run per shard via shard_map (None = single-chip/GSPMD)
        self._kernel_mesh = None
        if mesh is not None:
            tp = mesh.shape.get("model", 1)
            if self.cfg.num_key_value_heads % tp:
                raise ValueError(
                    f"num_key_value_heads={self.cfg.num_key_value_heads} "
                    f"not divisible by the model axis ({tp})")
            self.params, self.pool = paged_model.shard_serving_state(
                self.params, self.pool, mesh)
            if draft_model is not None:
                if draft_model.config.num_key_value_heads % tp:
                    raise ValueError(
                        f"draft num_key_value_heads="
                        f"{draft_model.config.num_key_value_heads} not "
                        f"divisible by the model axis ({tp})")
                self.draft_params, self.draft_pool = \
                    paged_model.shard_serving_state(
                        self.draft_params, self.draft_pool, mesh)
            self._kernel_mesh = mesh if tp > 1 else None
            self._replicated = NamedSharding(mesh, PartitionSpec())
        else:
            # Commit host (numpy) params to device ONCE. Numpy leaves
            # passed into the per-tick jitted steps are re-transferred on
            # EVERY dispatch (jit does not cache host->device puts) — on
            # the remote-tunneled chip that turned a 1.6k tok/s 0.9B
            # engine into ~4 tok/s (~1.8 GB re-uploaded per tick) and
            # leaked ~350 MB/tick of host transfer buffers, which read as
            # "the chip degraded". jnp.asarray is a no-op on leaves
            # already on device.
            self.params = jax.tree_util.tree_map(jnp.asarray, self.params)
            if self.draft_params is not None:
                self.draft_params = jax.tree_util.tree_map(
                    jnp.asarray, self.draft_params)
        if self.medusa_params is not None:
            # commit once, in the model's hidden dtype (the head einsum
            # runs in w1's dtype — fp32 heads on a bf16 model would
            # silently upcast the proposer)
            from ..core import nn as _cnn
            hd = _cnn.embedding_dtype(self.params["embed_tokens"])
            m = jax.tree_util.tree_map(
                lambda x: jnp.asarray(x, dtype=hd), self.medusa_params)
            if mesh is not None:
                m = jax.device_put(m, self._replicated)
            self.medusa_params = m
        self.fsms = list(fsms) if fsms else None
        self._fsm_next_dev = None
        if self.fsms:
            if speculative:
                raise ValueError("guided decoding (fsms) is incompatible "
                                 "with speculative decoding")
            for f in self.fsms:
                if f.vocab_size != self.cfg.vocab_size:
                    raise ValueError(
                        f"FSM vocab {f.vocab_size} != model vocab "
                        f"{self.cfg.vocab_size}")
            s_max = max(f.num_states for f in self.fsms)
            stacked = np.full((len(self.fsms), s_max, self.cfg.vocab_size),
                              -1, dtype=np.int32)
            for i, f in enumerate(self.fsms):
                stacked[i, :f.num_states] = f.next_state
            self._fsm_next_dev = self._put(stacked)
        self.return_logprobs = bool(return_logprobs)
        if self.return_logprobs and speculative:
            raise ValueError("return_logprobs is incompatible with "
                             "speculative decoding (verification emits "
                             "tokens without per-step distributions)")
        self.waiting: deque = deque()
        self.active: Dict[int, SequenceState] = {}
        self.needs_prefill: deque = deque()
        self.finished: Dict[int, SequenceState] = {}
        self._next_id = 0
        # observability: running counters + per-request time-to-first-token
        self.counters = {
            "requests_submitted": 0, "requests_completed": 0,
            "prompt_tokens": 0, "cached_prompt_tokens": 0,
            "tokens_generated": 0, "prefill_calls": 0,
            "decode_ticks": 0, "spec_ticks": 0, "preemptions": 0,
        }
        self._ttft: List[float] = []
        self._t_start = time.monotonic()
        self._families: Dict[int, list] = {}  # best_of rollout groups
        # (media_key, sha256(prompt ids)) -> interned radix salt id; see
        # the prefix-LM block in submit() for why this must be sequential
        self._media_salts: Dict[tuple, int] = {}
        # sliding-window memory reclaim: blocks behind the band are freed
        # as the sequence advances (python manager only — the native
        # backend keeps the plain always-grow tables)
        self._window_free = None
        win = getattr(self.cfg, "sliding_window", None)
        if win is not None and isinstance(self.kv, PagedKVManager):
            sinks = getattr(self.cfg, "attention_sinks", 0)
            self._window_free = (int(win), -(-sinks // block_size))

    def _put(self, x):
        """Host array -> device. Under a mesh, commit replicated so every
        device step input lives with the sharded params/pool."""
        if self.mesh is None:
            return jnp.asarray(x)
        return jax.device_put(np.asarray(x), self._replicated)

    # -- API ------------------------------------------------------------------
    def submit(self, prompt: Sequence[int], *,
               max_new_tokens: Optional[int] = None,
               temperature: Optional[float] = None,
               top_p: Optional[float] = None,
               min_p: Optional[float] = None,
               presence_penalty: Optional[float] = None,
               frequency_penalty: Optional[float] = None,
               repetition_penalty: Optional[float] = None,
               min_tokens: int = 0,
               ignore_eos: bool = False,
               logit_bias: Optional[Dict[int, float]] = None,
               seed: Optional[int] = None,
               fsm_id: Optional[int] = None,
               lora_id: Optional[int] = None,
               stop: Optional[Sequence[Sequence[int]]] = None,
               best_of: int = 1,
               prefix_embeds=None, prefix_lm: bool = False,
               media_key=None) -> int:
        """Queue a request. Per-request overrides (engine defaults when
        None): ``max_new_tokens`` (must not exceed the engine's — pool
        budgeting is sized to it), ``temperature``/``top_p`` (only
        meaningful on a ``do_sample=True`` engine — the decode batch
        threads them as per-lane vectors),
        ``presence_penalty``/``frequency_penalty`` (OpenAI semantics over
        output tokens: ``logit[t] -= presence * seen(t) + frequency *
        count(t)`` — discourage reuse; work with greedy AND sampling),
        ``repetition_penalty`` (CTRL/HF/vLLM semantics over prompt AND
        output tokens: seen positive logits divide by it, negative
        multiply; 1.0 = off), ``min_tokens`` (vLLM semantics: EOS is
        banned in the logits and stop sequences don't match until this
        many tokens have been generated), ``ignore_eos`` (never finish on
        EOS — only ``max_new_tokens``/``stop``/pool capacity end the
        request; vLLM/benchmark convention), ``logit_bias`` ({token_id:
        bias} added to the logits every step, OpenAI semantics),
        ``seed`` (vLLM semantics: the request's sampling stream is its
        own — the k-th generated token always draws from
        ``fold_in(PRNGKey(seed), k)``, so the output is DETERMINISTIC
        regardless of batch composition, the engine's seed, tick
        boundaries, or preemption replays; ``best_of`` siblings derive
        ``seed + 1, seed + 2, ...``),
        ``fsm_id`` (guided decoding:
        index into the engine's ``fsms`` grammar list; the request's
        generated tokens follow that grammar), and ``lora_id`` (multi-LoRA:
        index into the engine's ``loras`` adapter list; None = base
        model), and ``stop`` (a list of token-id sequences: generation
        finishes when the output ends with any of them; the matched stop
        suffix is EXCLUDED from the result, vLLM stop-string semantics —
        EOS handling is unchanged and independent), and ``best_of``
        (OpenAI semantics: sample ``best_of`` completions and return only
        the one with the highest MEAN token logprob — requires a
        ``do_sample=True, return_logprobs=True`` engine; the rollouts ride
        the same continuous batch and share the radix-cached prompt)."""
        if not len(prompt):
            raise ValueError("empty prompt (prefill would attend nothing "
                             "and emit an arbitrary first token)")
        if max_new_tokens is not None and \
                not (1 <= max_new_tokens <= self.max_new_tokens):
            raise ValueError(
                f"per-request max_new_tokens={max_new_tokens} outside "
                f"[1, {self.max_new_tokens}] (the engine's limit sizes "
                "pool budgeting)")
        max_pos = getattr(self.cfg, "max_position_embeddings", None)
        if max_pos and (len(prompt) + self.max_new_tokens
                        + self.position_offset) > max_pos:
            # positions past the RoPE table would silently clamp to its
            # last row (jnp.take mode=clip) — wrong rotations, not an error
            raise ValueError(
                f"prompt of {len(prompt)} + max_new_tokens "
                f"{self.max_new_tokens} exceeds max_position_embeddings "
                f"{max_pos}")
        if fsm_id is not None:
            if not self.fsms:
                raise ValueError("engine has no fsms (pass fsms=[...] at "
                                 "construction for guided decoding)")
            if not 0 <= fsm_id < len(self.fsms):
                raise ValueError(f"fsm_id {fsm_id} outside "
                                 f"[0, {len(self.fsms)})")
            if self.eos_token_id is None:
                raise ValueError("guided decoding needs eos_token_id (EOS "
                                 "terminates a completed grammar)")
        if self.speculative and (
                presence_penalty or frequency_penalty or
                self.presence_penalty or self.frequency_penalty or
                (repetition_penalty not in (None, 1.0)) or
                self.repetition_penalty != 1.0 or min_tokens or
                ignore_eos or logit_bias):
            raise ValueError(
                "penalties/min_tokens/ignore_eos/logit_bias are unsupported "
                "with speculative decoding (the verifier emits multi-token "
                "blocks without per-step logits processing)")
        if repetition_penalty is not None and repetition_penalty <= 0:
            raise ValueError("repetition_penalty must be > 0 (1.0 = off)")
        if min_tokens:
            if fsm_id is not None:
                raise ValueError(
                    "min_tokens is incompatible with guided decoding (a "
                    "completed grammar may allow ONLY EOS, which min_tokens "
                    "bans — every token would be masked)")
            if self.eos_token_id is None and not (stop or []):
                raise ValueError("min_tokens without eos_token_id or stop "
                                 "sequences has nothing to delay")
        limit_new = (self.max_new_tokens if max_new_tokens is None
                     else max_new_tokens)
        if not 0 <= min_tokens <= limit_new:
            raise ValueError(f"min_tokens={min_tokens} outside "
                             f"[0, {limit_new}] (the request's token limit)")
        logit_bias = {int(t): float(v) for t, v in (logit_bias or {}).items()}
        if any(not 0 <= t < self.cfg.vocab_size for t in logit_bias):
            raise ValueError("logit_bias token id outside the vocab")
        if seed is not None:
            if not self.do_sample:
                raise ValueError("per-request seed needs do_sample=True "
                                 "(greedy decoding draws nothing)")
            if not 0 <= seed < 2 ** 31:
                raise ValueError("seed must be in [0, 2**31)")
        if lora_id is not None:
            if not self.num_loras:
                raise ValueError("engine has no loras (pass loras=[...] at "
                                 "construction for multi-LoRA serving)")
            if not 0 <= lora_id < self.num_loras:
                raise ValueError(f"lora_id {lora_id} outside "
                                 f"[0, {self.num_loras})")
        stop = [list(map(int, seq)) for seq in (stop or [])]
        if any(not seq for seq in stop):
            raise ValueError("empty stop sequence (would match immediately)")
        if best_of < 1:
            raise ValueError(f"best_of must be >= 1, got {best_of}")
        if prefix_embeds is not None or prefix_lm:
            # multimodal / prefix-LM request (PaliGemma-style captioning
            # through the continuous batch — reference paligemma.ipynb +
            # simple_vllm.ipynb combined)
            if self.speculative:
                raise ValueError("multimodal/prefix-LM requests are "
                                 "unsupported with speculative decoding")
            if getattr(self.cfg, "sliding_window", None):
                raise ValueError("prefix-LM is incompatible with "
                                 "sliding-window attention")
        n_embed = 0
        if prefix_embeds is not None:
            import numpy as _np
            if not isinstance(prefix_embeds, jax.Array):
                # host arrays normalize to fp32; DEVICE arrays stay on
                # device — the tower output feeds prefill with no
                # host round-trip (2 x ~16 MB/tick over the tunnel was a
                # measured caption-serving cost, VERDICT r4 #3)
                prefix_embeds = _np.asarray(prefix_embeds, _np.float32)
            if prefix_embeds.ndim != 2 or \
                    prefix_embeds.shape[1] != self.cfg.hidden_size:
                raise ValueError(
                    f"prefix_embeds must be [n, {self.cfg.hidden_size}], "
                    f"got {prefix_embeds.shape}")
            n_embed = prefix_embeds.shape[0]
            if n_embed > len(prompt):
                raise ValueError(f"prefix_embeds rows ({n_embed}) exceed "
                                 f"the prompt length ({len(prompt)})")
        if prefix_lm and len(prompt) > self.prefill_buckets[-1]:
            # the whole bidirectional region must be covered by (cached +
            # one prefill chunk): every prefix token attends every other,
            # so it cannot be split across chunk boundaries
            raise ValueError(
                f"prefix-LM prompt of {len(prompt)} tokens exceeds the "
                f"largest prefill bucket {self.prefill_buckets[-1]} (the "
                "bidirectional prefix must prefill in one chunk)")
        if best_of > 1:
            if not self.do_sample:
                raise ValueError("best_of > 1 needs do_sample=True "
                                 "(identical greedy rollouts are pointless)")
            if not self.return_logprobs:
                raise ValueError("best_of > 1 needs return_logprobs=True "
                                 "(rollouts are ranked by mean logprob)")
        sid = self._next_id
        self._next_id += 1
        state = SequenceState(sid, prompt)
        if not self.radix_cache:
            state.no_radix = True
        state.stop_seqs = stop
        state.max_new = (self.max_new_tokens if max_new_tokens is None
                         else max_new_tokens)
        state.temperature = (self.temperature if temperature is None
                             else float(temperature))
        state.top_p = self.top_p if top_p is None else float(top_p)
        state.min_p = self.min_p if min_p is None else float(min_p)
        state.presence_penalty = (self.presence_penalty if presence_penalty
                                  is None else float(presence_penalty))
        state.frequency_penalty = (self.frequency_penalty if
                                   frequency_penalty is None
                                   else float(frequency_penalty))
        state.repetition_penalty = (self.repetition_penalty if
                                    repetition_penalty is None
                                    else float(repetition_penalty))
        state.min_tokens = int(min_tokens)
        state.ignore_eos = bool(ignore_eos)
        state.logit_bias = logit_bias
        state.seed = seed
        state.fsm_id = fsm_id
        state.fsm_state = 0
        state.lora_id = -1 if lora_id is None else lora_id
        # adapter requests produce adapter-specific KV: shift their radix
        # keys into a disjoint namespace so prefixes are shared only among
        # requests with the SAME adapter (never with base or each other)
        state.cache_salt = (state.lora_id + 1) << 33
        state.prefix_embeds = prefix_embeds
        state.embed_len = n_embed
        state.prefix_lm = bool(prefix_lm)
        state.bidir_len = len(prompt) if prefix_lm else 0
        if prefix_lm or prefix_embeds is not None:
            # Prefix-LM KV depends on the WHOLE bidirectional region (and
            # on the image, which token ids don't encode): radix prefixes
            # may be shared only between requests with an identical
            # (image, prompt) pair. Each distinct pair gets an INTERNED
            # sequential salt id in bits 40..61 (disjoint from the lora
            # salt's 33..39 and from token ids; keys stay inside the native
            # manager's int64). Sequential ids, not a hash: two images with
            # the same caption prompt have identical token ids, so a hash
            # collision would silently serve the wrong image's cached KV
            # (code-review r3). media_key=None means "this image is unique"
            # — sharing is impossible by construction, so bypass the radix
            # cache entirely; ditto if the 2^22-2 id space is ever
            # exhausted (never sharing is always sound).
            salt_id = None
            if media_key is not None:
                src = (media_key, hashlib.sha256(np.asarray(
                    prompt, dtype=np.int64).tobytes()).digest())
                salt_id = self._media_salts.get(src)
                if salt_id is None and \
                        len(self._media_salts) < (1 << 22) - 2:
                    salt_id = len(self._media_salts) + 1
                    self._media_salts[src] = salt_id
            if salt_id is None:
                state.no_radix = True
                salt_id = (1 << 22) - 1  # reserved: registered, never shared
            state.cache_salt += salt_id << 40
        state.logprobs = []
        state.t_submit = time.monotonic()
        state.family = None
        self.counters["requests_submitted"] += 1
        self.counters["prompt_tokens"] += len(prompt)
        self.waiting.append(state)
        if best_of > 1:
            # siblings are ordinary requests in the same continuous batch;
            # the LAST one to finish triggers the family pick
            state.family = sid
            self._families[sid] = [state]
            for _ in range(best_of - 1):
                sib_id = self._next_id
                self._next_id += 1
                sib = SequenceState(sib_id, prompt)
                for attr in ("max_new", "temperature", "top_p", "min_p",
                             "presence_penalty", "frequency_penalty",
                             "repetition_penalty", "min_tokens",
                             "ignore_eos", "logit_bias",
                             "fsm_id", "fsm_state", "lora_id", "cache_salt",
                             "no_radix",
                             "stop_seqs", "t_submit", "prefix_embeds",
                             "embed_len", "prefix_lm", "bidir_len"):
                    setattr(sib, attr, getattr(state, attr))
                # identical seeds would make rollouts identical: derive.
                # Wrap into the validated int32 range — seed=2**31-1 must
                # not overflow the np.int32 seed lanes in _decode_batch.
                sib.seed = (None if seed is None else
                            (seed + len(self._families[sid])) % (2 ** 31))
                sib.logprobs = []
                sib.family = sid
                self._families[sid].append(sib)
                self.waiting.append(sib)
        return sid

    def run(self, with_logprobs: bool = False) -> Dict[int, List[int]]:
        """Drain all requests; returns {seq_id: generated tokens} — or
        {seq_id: (tokens, logprobs)} with ``with_logprobs=True`` on a
        ``return_logprobs`` engine — for the sequences that finished since
        the last ``run`` (results are consumed — a long-lived engine does
        not accumulate them)."""
        if with_logprobs and not self.return_logprobs:
            raise ValueError("engine was built with return_logprobs=False")
        while self.waiting or self.active or self.needs_prefill:
            self.step()
        if with_logprobs:
            done = {sid: (s.tokens[s.prompt_len:], list(s.logprobs))
                    for sid, s in self.finished.items()}
        else:
            done = {sid: s.tokens[s.prompt_len:]
                    for sid, s in self.finished.items()}
        self.finished.clear()
        return done

    def abort(self, seq_id: int) -> bool:
        """Cancel a request wherever it is (waiting, awaiting prefill, or
        actively decoding). Its blocks are freed immediately (generated-so-
        far KV still deposits into the radix cache); it never appears in
        ``run``/``stream`` results. Returns False if the id is unknown or
        already finished."""
        fam = self._families.pop(seq_id, None)
        if fam is not None:   # best_of: cancel every rollout of the family
            for member in fam:
                member.family = None
                if not member.finished:
                    self.abort(member.seq_id)
            return True
        for q in (self.waiting, self.needs_prefill):
            for state in q:
                if state.seq_id == seq_id:
                    q.remove(state)
                    self.kv.release_sequence(state)
                    return True
        state = self.active.pop(seq_id, None)
        if state is None:
            return False
        state.finished = True  # decode ticks in flight drop it
        # no_radix: never deposit (the native manager's deposit gate is
        # this argument; the Python manager also checks the flag itself)
        self.kv.free(state, cache_prefix=not state.no_radix)
        return True

    def score(self, prompt: Sequence[int],
              lora_id: Optional[int] = None) -> List[float]:
        """Prompt logprobs (the vLLM ``prompt_logprobs`` / perplexity-
        scoring role): raw-model log-probability of each prompt token given
        its prefix — ``len(prompt) - 1`` floats (the first token has no
        prefix). ``lora_id`` scores under that adapter (multi-LoRA engines;
        None = base). Synchronous, dense teacher-forced forward, padded to
        the engine's prefill buckets so repeated calls never recompile."""
        prompt = list(prompt)
        if len(prompt) < 2:
            raise ValueError("need >= 2 tokens (the first is unscored)")
        if self.position_offset:
            raise ValueError(
                "score() is text-only and uses the model's default (0-"
                "indexed) positions; a position_offset engine (PaliGemma) "
                "would score with inconsistent RoPE tables")
        if lora_id is not None and not 0 <= lora_id < self.num_loras:
            raise ValueError(f"lora_id {lora_id} outside "
                             f"[0, {self.num_loras})")
        t_pad = _bucket(len(prompt), self.prefill_buckets)
        ids = np.zeros((1, t_pad), dtype=np.int32)
        ids[0, :len(prompt)] = prompt
        lanes = np.full((1,), -1 if lora_id is None else lora_id, np.int32)
        lps = _score_jit(self.model, self.params, self._put(ids),
                         self._put(lanes))
        return np.asarray(lps)[:len(prompt) - 1].tolist()

    def metrics(self) -> Dict[str, float]:
        """Snapshot of serving metrics: the running ``counters`` plus
        derived rates — ``ttft_mean_s``/``ttft_max_s`` (submit -> first
        generated token), ``cache_hit_rate`` (prompt tokens served from the
        radix cache), and ``tokens_per_s`` since engine construction."""
        out = dict(self.counters)
        if hasattr(self.kv, "cache_stats"):
            out.update(self.kv.cache_stats())   # radix hit/miss/evict
        out["ttft_mean_s"] = (sum(self._ttft) / len(self._ttft)
                              if self._ttft else 0.0)
        out["ttft_max_s"] = max(self._ttft, default=0.0)
        out["cache_hit_rate"] = (
            self.counters["cached_prompt_tokens"]
            / max(self.counters["prompt_tokens"], 1))
        out["tokens_per_s"] = self.counters["tokens_generated"] / max(
            time.monotonic() - self._t_start, 1e-9)
        return out

    def stream(self):
        """Drain all requests, yielding ``(seq_id, token_id, finished)``
        as tokens are produced — the streaming front of ``run()``. Tokens
        surface after each scheduler tick: a prefill yields a sequence's
        first token, each decode tick up to ``decode_horizon`` per live
        lane (lower the horizon for lower time-to-first-byte; throughput
        benches use 64). ``finished=True`` marks a sequence's last token;
        finished results are consumed as they stream (``run()`` after a
        full ``stream()`` drain returns nothing new). Preemption is safe:
        a preempted victim keeps its generated tokens and re-prefills
        them, so already-streamed tokens never change."""
        emitted: Dict[int, int] = {}
        while self.waiting or self.active or self.needs_prefill:
            self.step()
            yield from self.poll_events(emitted)

    def poll_events(self, emitted: Dict[int, int]):
        """Harvest the ``(seq_id, token_id | None, finished)`` events newly
        available after a ``step()`` — the shared core of ``stream()`` and
        the thread-safe ``AsyncEngine`` frontend. ``emitted`` is the
        caller-owned progress map (seq_id -> tokens surfaced so far);
        finished sequences are consumed (removed from ``finished``) once
        fully delivered."""
        for src in (self.active, self.finished):
            for sid, s in list(src.items()):
                if src is self.active and \
                        getattr(s, "family", None) is not None:
                    # best_of rollouts stream nothing until the family
                    # resolves (losers are discarded wholesale; only
                    # the winner ever reaches ``finished``)
                    continue
                start = emitted.get(sid, s.prompt_len)
                hold = 0
                if src is self.active and getattr(s, "stop_seqs", None):
                    # a stop match TRUNCATES up to max(len(stop))
                    # tokens; holding that many back guarantees a
                    # yielded token is never retracted and at least
                    # one token remains to carry finished=True
                    hold = max(len(q) for q in s.stop_seqs)
                end = len(s.tokens) - hold
                fresh = s.tokens[start:end] if end > start else []
                emitted[sid] = start + len(fresh)
                for i, tok in enumerate(fresh):
                    done = s.finished and start + i + 1 == len(s.tokens)
                    yield sid, int(tok), done
                if src is self.finished and not fresh:
                    # a stop match truncated back to (or before) the
                    # emitted boundary: zero unstreamed tokens remain,
                    # so deliver completion as a (sid, None, True)
                    # sentinel (vLLM's empty final chunk)
                    yield sid, None, True
        for sid in [sid for sid, s in self.finished.items()
                    if emitted.get(sid, 0) >= len(s.tokens)]:
            del self.finished[sid]
            emitted.pop(sid, None)

    # -- scheduling -------------------------------------------------------------
    def _select_admission(self):
        """Rotate the next admission candidate to the head of ``waiting``.
        FIFO by default; with ``cache_aware_admission`` the waiting request
        with the longest cached prefix (radix peek, no side effects) goes
        first — its prefill is cheaper AND its blocks are shared, so
        admitting it under a tight pool frees more capacity per admission.
        FIFO tiebreak; a request passed over ``_admission_skip_cap`` times
        is admitted next regardless (no starvation)."""
        if not self.cache_aware_admission or len(self.waiting) <= 1 or \
                not hasattr(self.kv, "peek_prefix"):
            return
        best_i, best_cov = 0, -1
        for i, s in enumerate(self.waiting):
            if getattr(s, "admission_skips", 0) >= self._admission_skip_cap:
                best_i = i
                break
            if getattr(s, "no_radix", False):
                cov = 0
            else:
                cov = self.kv.peek_prefix(s.tokens[:s.prefill_len],
                                          s.cache_salt)
            if cov > best_cov:
                best_i, best_cov = i, cov
        if best_i:
            chosen = self.waiting[best_i]
            del self.waiting[best_i]
            self.waiting.appendleft(chosen)

    def _try_admit(self):
        while self.waiting and len(self.active) + len(self.needs_prefill) \
                < self.max_batch:
            self._select_admission()
            state = self.waiting[0]
            budget = len(state.tokens) + 1  # room for the first new token
            if self.kv.blocks_needed(budget) > self.max_blocks_per_seq:
                raise ValueError(
                    f"prompt of {len(state.tokens)} tokens exceeds the "
                    f"per-sequence block table "
                    f"({self.max_blocks_per_seq} x {self.block_size})")
            self.kv.match_prefix(state)
            if not self.kv.allocate(state, budget):
                self.kv.release_sequence(state)  # roll back and wait
                if not self.active and not self.needs_prefill:
                    # nothing running that could ever free blocks: the pool
                    # is simply too small for this request
                    raise RuntimeError(
                        f"KV pool too small: prompt of {len(state.tokens)} "
                        f"tokens needs {self.kv.blocks_needed(budget)} "
                        f"blocks, pool has {self.kv.num_blocks}")
                break
            self.counters["cached_prompt_tokens"] += state.num_cached_tokens
            self.waiting.popleft()
            if self.cache_aware_admission:
                # a skip = a competing request actually got admitted ahead
                # of you (NOT a failed-allocation pass — counting those
                # degraded admission to FIFO within a few congested ticks)
                for s in self.waiting:
                    s.admission_skips = getattr(s, "admission_skips", 0) + 1
            self.needs_prefill.append(state)

    def _preempt_youngest(self):
        """Pool exhausted with no decode progress possible: evict the most
        recently admitted sequence (recompute policy — free its blocks, put
        it back at the head of the waiting queue; its generated tokens are
        re-prefilled on re-admission)."""
        victim = max(self.active.values(), key=lambda s: s.seq_id)
        self.counters["preemptions"] += 1
        self.kv.free(victim, cache_prefix=False)
        self.active.pop(victim.seq_id, None)
        victim.prefill_len = len(victim.tokens)
        victim.num_cached_tokens = 0
        self.waiting.appendleft(victim)

    def _slots_for(self, state: SequenceState, start: int, count: int):
        """(blocks, offsets) pool targets for token positions
        [start, start+count)."""
        bs = self.block_size
        blocks = [state.block_table[(start + i) // bs] for i in range(count)]
        offs = [(start + i) % bs for i in range(count)]
        return blocks, offs

    def _prefill_group_call(self, states):
        """Prefill up to ``prefill_group`` admissions in one device call
        (padded to the group's largest suffix bucket; dead lanes masked).

        Suffixes longer than the largest bucket are CHUNKED: this call
        writes KV for the first bucket-sized chunk and re-queues the
        sequence (head of the prefill queue) for the rest — long prompts
        and preempted-sequence recomputes never exceed a bucket."""
        n_pad = self.prefill_group
        cap = self.prefill_buckets[-1]
        suffixes = [s.tokens[s.num_cached_tokens:
                             min(s.prefill_len, s.num_cached_tokens + cap)]
                    for s in states]
        is_final = [s.num_cached_tokens + len(sf) >= s.prefill_len
                    for s, sf in zip(states, suffixes)]
        t_pad = _bucket(max(len(sf) for sf in suffixes),
                        self.prefill_buckets)
        ids = np.zeros((n_pad, t_pad), dtype=np.int32)
        positions = np.zeros((n_pad, t_pad), dtype=np.int32)
        slot_blocks = np.full((n_pad, t_pad), -1, dtype=np.int32)
        slot_offsets = np.zeros((n_pad, t_pad), dtype=np.int32)
        tables = np.full((n_pad, self.max_blocks_per_seq), -1, dtype=np.int32)
        ctx_len = np.zeros(n_pad, dtype=np.int32)
        true_len = np.zeros(n_pad, dtype=np.int32)
        for i, (state, suffix) in enumerate(zip(states, suffixes)):
            cached = state.num_cached_tokens
            t = len(suffix)
            ids[i, :t] = suffix
            positions[i] = np.minimum(cached + np.arange(t_pad),
                                      cached + max(t - 1, 0))
            blocks, offs = self._slots_for(state, cached, t)
            slot_blocks[i, :t] = blocks
            slot_offsets[i, :t] = offs
            tables[i, :len(state.block_table)] = state.block_table
            ctx_len[i] = state.prefill_len
            true_len[i] = t

        ops = (self._put(ids), self._put(positions), self._put(slot_blocks),
               self._put(slot_offsets), self._put(tables), self._put(ctx_len),
               self._put(true_len))
        mm_kw = {}
        if any(getattr(st, "embed_len", 0) or getattr(st, "bidir_len", 0)
               for st in states):
            embed_len = np.zeros(n_pad, dtype=np.int32)
            bidir_len = np.zeros(n_pad, dtype=np.int32)
            row_list = [None] * n_pad
            any_dev = False
            for i, state in enumerate(states):
                ne = getattr(state, "embed_len", 0)
                cached = state.num_cached_tokens
                if ne:
                    rows = state.prefix_embeds[cached:min(ne, cached
                                                          + len(suffixes[i]))]
                    if len(rows):
                        row_list[i] = rows
                        any_dev |= isinstance(rows, jax.Array)
                    embed_len[i] = ne
                bidir_len[i] = getattr(state, "bidir_len", 0)
            if any_dev:
                # device-resident embeds (tower output): assemble the
                # padded [n_pad, t_pad, H] buffer ON DEVICE — no host
                # round-trip for the image features. Cast to the model's
                # HIDDEN dtype (self.dtype may be an int8/int4 pool dtype)
                from ..core import nn as _cnn
                hdt = _cnn.embedding_dtype(self.params["embed_tokens"])
                lanes = []
                for rows in row_list:
                    if rows is None:
                        lanes.append(jnp.zeros(
                            (t_pad, self.cfg.hidden_size), hdt))
                    else:
                        r = jnp.asarray(rows, hdt)
                        lanes.append(jnp.pad(
                            r, ((0, t_pad - r.shape[0]), (0, 0))))
                embeds_op = jnp.stack(lanes)
                if self.mesh is not None:
                    embeds_op = jax.device_put(embeds_op, self._replicated)
            else:
                embeds = np.zeros((n_pad, t_pad, self.cfg.hidden_size),
                                  dtype=np.float32)
                for i, rows in enumerate(row_list):
                    if rows is not None:
                        embeds[i, :len(rows)] = rows
                embeds_op = self._put(embeds)
            mm_kw = dict(embeds=embeds_op,
                         embed_len=self._put(embed_len),
                         bidir_len=self._put(bidir_len))
        if self.position_offset:
            mm_kw["rope_offset"] = self.position_offset
        lora_kw = {}
        if self.num_loras:
            lanes = np.full(n_pad, -1, dtype=np.int32)
            for i, state in enumerate(states):
                lanes[i] = getattr(state, "lora_id", -1)
            lora_kw = dict(lora_lanes=self._put(lanes))
        logits, self.pool = paged_model.prefill(
            self.model, self.plus_one, self.params, self.pool, *ops,
            allow_pallas=self._allow_pallas, mesh=self._kernel_mesh,
            **mm_kw, **lora_kw)
        if self.draft_model is not None:
            # the draft pool must hold the same context (same slots) so
            # speculative rounds can attend it; its logits are discarded
            _, self.draft_pool = paged_model.prefill(
                self.draft_model, self.draft_plus_one, self.draft_params,
                self.draft_pool, *ops, allow_pallas=self._allow_pallas,
                mesh=self._kernel_mesh)
        self.counters["prefill_calls"] += 1
        next_tokens, next_lps = self._pick_tokens(logits, states)
        for i, state in enumerate(states):
            if is_final[i]:
                self.active[state.seq_id] = state
                self._append_token(
                    state, int(next_tokens[i]),
                    None if next_lps is None else next_lps[i])
            else:  # more chunks to go: KV written, logits discarded
                state.num_cached_tokens += len(suffixes[i])
                self.needs_prefill.appendleft(state)

    def _append_token(self, state: SequenceState, tok: int,
                      logprob: Optional[float] = None):
        """Append a generated token, advancing the request's grammar state
        (host mirror of the device-side FSM threading), then finish-check."""
        state.tokens.append(tok)
        if len(state.tokens) == state.prompt_len + 1:
            self._ttft.append(time.monotonic()
                              - getattr(state, "t_submit", self._t_start))
        self.counters["tokens_generated"] += 1
        if self.return_logprobs:
            state.logprobs.append(0.0 if logprob is None else float(logprob))
        if getattr(state, "fsm_id", None) is not None \
                and tok not in self.eos_ids:
            state.fsm_state = self.fsms[state.fsm_id].advance(
                state.fsm_state, tok)
        for seq in getattr(state, "stop_seqs", ()):
            gen = state.tokens[state.prompt_len:]
            if len(gen) < getattr(state, "min_tokens", 0):
                break  # vLLM min_tokens: stop conditions don't fire yet
            if len(gen) >= len(seq) and gen[-len(seq):] == seq:
                # exclude the stop suffix (vLLM stop-string semantics);
                # its KV is freed with the sequence
                del state.tokens[len(state.tokens) - len(seq):]
                if self.return_logprobs:
                    del state.logprobs[len(state.logprobs) - len(seq):]
                self._finish(state)
                return
        self._maybe_finish(state)

    def _finish(self, state: SequenceState):
        """Shared completion bookkeeping: free blocks, route best_of
        rollouts through family resolution (a family counts as ONE
        completed request, at resolution), surface singles directly."""
        state.finished = True
        self.kv.free(state, cache_prefix=not state.no_radix)
        self.active.pop(state.seq_id, None)
        if getattr(state, "family", None) is not None:
            self._maybe_resolve_family(state.family)
        else:
            self.counters["requests_completed"] += 1
            self.finished[state.seq_id] = state

    def _fsm_mask(self, states, b):
        """[b, V] bool allow-mask for a batch row list (True everywhere for
        unconstrained lanes); None when nothing in the batch is guided."""
        rows = [(i, s) for i, s in enumerate(states[:b])
                if s is not None and getattr(s, "fsm_id", None) is not None]
        if not rows:
            return None
        mask = np.ones((b, self.cfg.vocab_size), dtype=bool)
        for i, s in rows:
            mask[i] = self.fsms[s.fsm_id].allowed(s.fsm_state)
        return mask

    def _pick_tokens(self, logits, states):
        """(tokens [b], logprobs [b] | None) for one batch of last-position
        logits (prefill path). Logprobs follow the raw-model convention of
        ``decode_horizon(with_logprobs=True)``."""
        raw = logits
        b = logits.shape[0]
        pps = np.zeros(b, np.float32)
        fps = np.zeros(b, np.float32)
        for i, st in enumerate(states[:b]):
            if st is not None:
                pps[i] = getattr(st, "presence_penalty", 0.0)
                fps[i] = getattr(st, "frequency_penalty", 0.0)
        if pps.any() or fps.any():
            counts = np.zeros((b, self.cfg.vocab_size), np.float32)
            for i, st in enumerate(states[:b]):
                if st is not None and len(st.tokens) > st.prompt_len:
                    np.add.at(counts[i],
                              np.asarray(st.tokens[st.prompt_len:]), 1)
            logits = (logits.astype(jnp.float32)
                      - self._put(pps[:, None] * (counts > 0))
                      - self._put(fps[:, None] * counts))
        rps = np.ones(b, np.float32)
        for i, st in enumerate(states[:b]):
            if st is not None:
                rps[i] = getattr(st, "repetition_penalty", 1.0)
        if (rps != 1.0).any():
            seen = np.zeros((b, self.cfg.vocab_size), bool)
            for i, st in enumerate(states[:b]):
                if st is not None:
                    seen[i, np.asarray(st.tokens)] = True
            l32 = logits.astype(jnp.float32)
            rp = self._put(rps[:, None])
            logits = jnp.where(self._put(seen),
                               jnp.where(l32 > 0, l32 / rp, l32 * rp), l32)
        extra = np.zeros((b, self.cfg.vocab_size), np.float32)
        extra_any = False
        for i, st in enumerate(states[:b]):
            if st is None:
                continue
            for t, v in (getattr(st, "logit_bias", None) or {}).items():
                extra[i, t] += v
                extra_any = True
            # owed = tokens still due under min_tokens; nonzero on a fresh
            # prefill, but a PREEMPTION REPLAY re-prefills after some were
            # already generated — gate on the count or the replayed step
            # would ban EOS the original run allowed (token-exactness)
            owed = getattr(st, "min_tokens", 0) - \
                (len(st.tokens) - st.prompt_len)
            if owed > 0:
                for e in self.eos_ids:
                    if 0 <= e < self.cfg.vocab_size:
                        extra[i, e] = -1e30
                        extra_any = True
        if extra_any:
            logits = logits.astype(jnp.float32) + self._put(extra)
        mask = self._fsm_mask(states, logits.shape[0]) if self.fsms else None
        if mask is not None:
            logits = jnp.where(self._put(mask), logits, -1e30)
        if not self.do_sample:
            toks = jnp.argmax(logits, axis=-1)
        else:
            self._rng, sub = jax.random.split(self._rng)
            temps, tps, mps = self._lane_sampling(states, logits.shape[0])
            seeds = np.full(b, -1, np.int32)
            genb = np.zeros(b, np.int32)
            for i, st in enumerate(states[:b]):
                if st is not None and getattr(st, "seed", None) is not None:
                    seeds[i] = st.seed
                    genb[i] = len(st.tokens) - st.prompt_len
            if (seeds >= 0).any():
                toks = _sample_seeded_jit(logits, self._put(sub), temps,
                                          tps, mps, self._put(seeds),
                                          self._put(genb))
            else:
                toks = _sample_jit(logits, self._put(sub), temps, tps, mps)
        if not self.return_logprobs:
            return np.asarray(toks), None
        lps = _logprob_jit(raw, toks)
        packed = np.asarray(_pack_i32_f32(toks[:, None], lps[:, None]))
        return packed[:, 0], packed[:, 1:].view(np.float32)[:, 0]

    def _lane_sampling(self, states, b):
        """Per-lane [b] temperature/top_p vectors (per-request overrides,
        engine defaults elsewhere). Row i belongs to states[i]."""
        temps = np.full(b, self.temperature, np.float32)
        tps = np.full(b, self.top_p, np.float32)
        mps = np.full(b, self.min_p, np.float32)
        for i, s in enumerate(states[:b]):
            if s is not None:
                temps[i] = getattr(s, "temperature", self.temperature)
                tps[i] = getattr(s, "top_p", self.top_p)
                mps[i] = getattr(s, "min_p", self.min_p)
        return self._put(temps), self._put(tps), self._put(mps)

    def _decode_batch(self):
        """Plain decode tick, PIPELINED when safe: the previous tick's
        device-side carry (final tokens + eos-death flags) feeds the next
        tick's dispatch BEFORE the previous results are fetched, so the
        host bookkeeping + tunnel round-trip of a tick overlaps the next
        tick's device execution. Measured r5 (decode_step_profile, 0.9B
        M=8 horizon=32): an engine step cost 5.99 ms of which only
        ~2.5 ms was device time — the blocking fetch + host work this
        overlap hides. With the flattened-pool carry (paged_model) the
        engine step landed at 2.48 ms vs the 1.95 ms weight-stream
        floor."""
        prev, self._inflight = self._inflight, None
        if prev is not None:
            nxt = self._try_chain(prev)   # dispatch while prev in flight
            self._harvest_decode(prev)
            if nxt is not None:
                self._inflight = nxt
                return
        rec = self._dispatch_decode()
        if rec is None:
            return
        if rec["chainable"]:
            self._inflight = rec          # harvested next step, overlapped
        else:
            self._harvest_decode(rec)

    def _dispatch_decode(self):
        states = [s for s in self.active.values() if not s.finished]
        if not states:
            return None
        b = self.max_batch
        horizon = self.decode_horizon
        tokens = np.zeros(b, dtype=np.int32)
        positions = np.zeros(b, dtype=np.int32)
        live_mask = np.zeros(b, dtype=bool)
        budget = np.zeros(b, dtype=np.int32)
        tables = np.full((b, self.max_blocks_per_seq), -1, dtype=np.int32)

        live = []
        for i, state in enumerate(states[:b]):
            if self._window_free is not None:
                # reclaim blocks no future step can attend (band start only
                # advances) BEFORE allocating this tick's grant
                w, keep = self._window_free
                if len(state.tokens) > w:
                    self.kv.release_prewindow(
                        state, (len(state.tokens) - w) // self.block_size,
                        keep)
            pos = len(state.tokens) - 1  # position of the latest token
            # budget the whole horizon up front so in-graph slot arithmetic
            # never walks off the block table; cap by table capacity
            remaining = getattr(state, "max_new", self.max_new_tokens) - \
                (len(state.tokens) - state.prompt_len)
            cap = self.max_blocks_per_seq * self.block_size - pos
            h = max(min(horizon, remaining, cap), 1)
            while h >= 1 and not self.kv.allocate(state, pos + h):
                h //= 2  # pool pressure: shrink the grant
            if h < 1:
                continue  # pool exhausted: retry next tick
            tokens[i] = state.tokens[-1]
            positions[i] = pos
            live_mask[i] = True
            budget[i] = h
            tables[i, :len(state.block_table)] = state.block_table
            live.append((i, state, h))

        if not live:
            # every lane failed to allocate even one step: preempt the
            # youngest sequence so the survivors (or it, re-admitted once
            # blocks free up) can make progress — no busy-spin
            self._preempt_youngest()
            return None
        # greedy never reads the key in-graph: skip the per-tick eager
        # split (~10 ms of tunnel dispatches on the remote rig)
        sub = self._rng
        if self.do_sample:
            self._rng, sub = jax.random.split(self._rng)
        temps, tps, mps = self._lane_sampling(states, b)
        fsm_kw = {}
        if self.fsms:
            fsm_ids = np.full(b, -1, dtype=np.int32)
            fsm_states = np.zeros(b, dtype=np.int32)
            for i, state, _ in live:
                if getattr(state, "fsm_id", None) is not None:
                    fsm_ids[i] = state.fsm_id
                    fsm_states[i] = state.fsm_state
            fsm_kw = dict(fsm_next=self._fsm_next_dev,
                          fsm_ids=self._put(fsm_ids),
                          fsm_states=self._put(fsm_states))
        if self.num_loras:
            lanes = np.full(b, -1, dtype=np.int32)
            for i, state, _ in live:
                lanes[i] = getattr(state, "lora_id", -1)
            fsm_kw["lora_lanes"] = self._put(lanes)
        pps = np.zeros(b, np.float32)
        fps = np.zeros(b, np.float32)
        for i, state, _ in live:
            pps[i] = getattr(state, "presence_penalty", 0.0)
            fps[i] = getattr(state, "frequency_penalty", 0.0)
        if pps.any() or fps.any():
            # OpenAI-style penalties: counts over OUTPUT tokens so far,
            # updated in-loop on device as the horizon emits more
            counts = np.zeros((b, self.cfg.vocab_size), np.int32)
            for i, state, _ in live:
                gen = np.asarray(state.tokens[state.prompt_len:])
                if len(gen):
                    np.add.at(counts[i], gen, 1)
            fsm_kw.update(token_counts=self._put(counts),
                          presence_penalty=self._put(pps),
                          frequency_penalty=self._put(fps))
        rps = np.ones(b, np.float32)
        mins = np.zeros(b, np.int32)
        ignore = np.zeros(b, bool)
        nbias = 0
        for i, state, _ in live:
            rps[i] = getattr(state, "repetition_penalty", 1.0)
            done = len(state.tokens) - state.prompt_len
            mins[i] = max(0, getattr(state, "min_tokens", 0) - done)
            ignore[i] = getattr(state, "ignore_eos", False)
            nbias = max(nbias, len(getattr(state, "logit_bias", None) or ()))
        if (rps != 1.0).any():
            # repetition penalty sees prompt AND output (vLLM convention)
            seen = np.zeros((b, self.cfg.vocab_size), bool)
            for i, state, _ in live:
                seen[i, np.asarray(state.tokens)] = True
            fsm_kw.update(rep_penalty=self._put(rps),
                          seen_mask=self._put(seen))
        if mins.any():
            fsm_kw["min_steps"] = self._put(mins)
        if nbias:
            nbias = max(8, 1 << (nbias - 1).bit_length())  # bound recompiles
            bidx = np.full((b, nbias), self.cfg.vocab_size, np.int32)  # OOB
            bval = np.zeros((b, nbias), np.float32)
            for i, state, _ in live:
                for j, (t, v) in enumerate(
                        (getattr(state, "logit_bias", None) or {}).items()):
                    bidx[i, j] = t
                    bval[i, j] = v
            fsm_kw.update(bias_idx=self._put(bidx), bias_val=self._put(bval))
        eos_arg = -1 if self.eos_token_id is None else self.eos_token_id
        if ignore.any():
            ev = np.full(b, eos_arg, np.int32)
            ev[ignore] = -1
            eos_arg = self._put(ev)
        if self.do_sample:
            seeds = np.full(b, -1, np.int32)
            genb = np.zeros(b, np.int32)
            for i, state, _ in live:
                if getattr(state, "seed", None) is not None:
                    seeds[i] = state.seed
                    genb[i] = len(state.tokens) - state.prompt_len
            if (seeds >= 0).any():
                fsm_kw.update(lane_seeds=self._put(seeds),
                              gen_base=self._put(genb))
        self.counters["decode_ticks"] += 1
        gen, lps, carry, self.pool = paged_model.decode_horizon(
            self.model, self.plus_one, self.params, self.pool,
            self._put(tokens), self._put(positions), self._put(tables),
            self._put(live_mask), horizon, self.do_sample,
            eos=eos_arg,
            rng=sub, temperature=temps,
            top_p=tps, min_p=mps, budget=self._put(budget),
            allow_pallas=self._allow_pallas, mesh=self._kernel_mesh,
            rope_offset=self.position_offset,
            with_logprobs=self.return_logprobs,
            dead_mask=self._put(np.zeros(b, bool)), **fsm_kw)
        # Chain safety: every finish condition the DEVICE cannot see
        # (multi-eos, stop strings, FSM accept, penalties' host-rebuilt
        # state, window reclaim, best_of families) breaks the guarantee
        # that an in-flight chained tick never writes KV into blocks the
        # host is about to free — those fall back to synchronous ticks.
        chainable = (
            self.pipeline_decode
            # speculative engines fall back to plain ticks under pool
            # pressure; their NEXT tick reads host token state, so a
            # stashed in-flight tick would desync it
            and self.draft_model is None and not self.ngram_speculation
            and self.medusa_params is None
            and "fsm_ids" not in fsm_kw
            and "token_counts" not in fsm_kw
            and "rep_penalty" not in fsm_kw
            and "min_steps" not in fsm_kw
            and "bias_idx" not in fsm_kw
            and self._window_free is None
            and len(self.eos_ids) <= 1
            and all(not getattr(s, "stop_seqs", ())
                    and getattr(s, "family", None) is None
                    for _, s, _ in live))
        return {"gen": gen, "lps": lps, "carry": carry, "live": live,
                "chainable": chainable}

    def _try_chain(self, prev):
        """Dispatch the next decode tick from the in-flight tick's DEVICE
        carry (no host round-trip): valid only when the batch composition
        is unchanged and every lane can take at least one more step.
        Returns the new in-flight record, or None (caller falls back to a
        synchronous tick after harvesting)."""
        if not prev["chainable"]:
            return None
        states = [s for s in self.active.values() if not s.finished]
        prev_states = [s for _, s, _ in prev["live"]]
        if len(states) != len(prev_states) or \
                any(a is not b for a, b in zip(states, prev_states)):
            return None             # admission/finish changed composition
        b = self.max_batch
        horizon = self.decode_horizon
        bs = self.block_size
        positions = np.zeros(b, dtype=np.int32)
        live_mask = np.zeros(b, dtype=bool)
        budget = np.zeros(b, dtype=np.int32)
        tables = np.full((b, self.max_blocks_per_seq), -1, dtype=np.int32)
        live = []
        for i, state, h_prev in prev["live"]:
            # the in-flight tick's tokens are not harvested yet: assume
            # alive lanes emitted their full grant (exact for alive lanes;
            # eos-dead lanes are masked out via the device carry below)
            assumed_len = len(state.tokens) + h_prev
            pos1 = assumed_len - 1
            if assumed_len >= self.max_blocks_per_seq * bs:
                # lane finishes out_of_blocks at the coming harvest (frees
                # its blocks while this chained tick would still write its
                # carry token's KV): drain + sync tick
                return None
            remaining = getattr(state, "max_new", self.max_new_tokens) \
                - (assumed_len - state.prompt_len)
            cap1 = self.max_blocks_per_seq * bs - pos1
            h1 = min(horizon, remaining, cap1)
            if h1 < 1:
                return None         # someone at a cap: drain + sync tick
            if not self.kv.allocate(state, pos1 + h1):
                return None         # pool pressure: sync path handles it
            positions[i] = pos1
            live_mask[i] = True
            budget[i] = h1
            tables[i, :len(state.block_table)] = state.block_table
            live.append((i, state, h1))
        toks_dev, eosd_dev = prev["carry"]
        # eos-dead lanes are masked INSIDE the jitted program (dead_mask):
        # eager mask ops here cost ~10 ms/dispatch through the tunnel
        sub = self._rng
        if self.do_sample:
            self._rng, sub = jax.random.split(self._rng)
        temps, tps, mps = self._lane_sampling(states, b)
        fsm_kw = {}
        if self.num_loras:
            lanes = np.full(b, -1, dtype=np.int32)
            for i, state, _ in live:
                lanes[i] = getattr(state, "lora_id", -1)
            fsm_kw["lora_lanes"] = self._put(lanes)
        ignore = np.zeros(b, bool)
        for i, state, _ in live:
            ignore[i] = getattr(state, "ignore_eos", False)
        eos_arg = -1 if self.eos_token_id is None else self.eos_token_id
        if ignore.any():
            ev = np.full(b, eos_arg, np.int32)
            ev[ignore] = -1
            eos_arg = self._put(ev)
        if self.do_sample:
            prev_h = {i: hp for i, _, hp in prev["live"]}
            seeds = np.full(b, -1, np.int32)
            genb = np.zeros(b, np.int32)
            for i, state, _ in live:
                if getattr(state, "seed", None) is not None:
                    seeds[i] = state.seed
                    # alive lanes emitted exactly their previous grant
                    genb[i] = (len(state.tokens) - state.prompt_len
                               + prev_h[i])
            if (seeds >= 0).any():
                fsm_kw.update(lane_seeds=self._put(seeds),
                              gen_base=self._put(genb))
        self.counters["decode_ticks"] += 1
        self.counters["chained_ticks"] = \
            self.counters.get("chained_ticks", 0) + 1
        gen, lps, carry, self.pool = paged_model.decode_horizon(
            self.model, self.plus_one, self.params, self.pool,
            toks_dev, self._put(positions), self._put(tables),
            self._put(live_mask), horizon, self.do_sample,
            eos=eos_arg,
            rng=sub, temperature=temps,
            top_p=tps, min_p=mps, budget=self._put(budget),
            allow_pallas=self._allow_pallas, mesh=self._kernel_mesh,
            rope_offset=self.position_offset,
            with_logprobs=self.return_logprobs,
            dead_mask=eosd_dev, **fsm_kw)
        return {"gen": gen, "lps": lps, "carry": carry, "live": live,
                "chainable": True}

    def _harvest_decode(self, rec):
        gen, lps = rec["gen"], rec["lps"]
        if self.return_logprobs:
            packed = np.asarray(_pack_i32_f32(gen, lps))
            h_w = packed.shape[1] // 2
            gen = packed[:, :h_w]
            lps = packed[:, h_w:].view(np.float32)
        else:
            gen = np.asarray(gen)
            lps = None
        for i, state, h in rec["live"]:
            if state.finished:
                # finished at a previous harvest while this (stale) tick
                # was in flight; the device carry kept the lane dead
                continue
            # only the granted steps are backed by allocated blocks
            for j in range(h):
                self._append_token(state, int(gen[i, j]),
                                   None if lps is None else lps[i, j])
                if state.finished:
                    break

    def _spec_lane_setup(self, states, with_history: bool):
        """Shared lane-grant setup for both speculative tick flavors:
        grants each lane up to ``spec_rounds`` rounds of ``gamma + 1``
        token slots, shrinking under pool pressure. Returns None after
        falling back to a plain decode tick (some lane can't afford ONE
        round — near those edges plain horizon decode degrades
        gracefully); else a dict of batch arrays + the live lane list."""
        b = self.max_batch
        gp1 = self.gamma + 1
        lanes = {
            "tokens2": np.zeros((b, 2), dtype=np.int32),
            "positions": np.zeros(b, dtype=np.int32),
            "live_mask": np.zeros(b, dtype=bool),
            "budget": np.zeros(b, dtype=np.int32),
            "tables": np.full((b, self.max_blocks_per_seq), -1,
                              dtype=np.int32),
            "live": [],
        }
        if with_history:
            hl = self.max_blocks_per_seq * self.block_size
            lanes["history"] = np.full((b, hl), -1, dtype=np.int32)
            lanes["hist_len"] = np.zeros(b, dtype=np.int32)
        for i, state in enumerate(states[:b]):
            pos = len(state.tokens) - 1
            cap = self.max_blocks_per_seq * self.block_size - pos
            # cap the grant by the lane's REMAINING token need too: rounds
            # past max_new produce tokens the host drops, and at high
            # acceptance they were ~half of a finishing tick's device time
            # (each wasted round still streams the full target weights)
            limit = getattr(state, "max_new", self.max_new_tokens)
            need = max(1, limit - (len(state.tokens) - state.prompt_len))
            r = min(self.spec_rounds, cap // gp1, -(-need // gp1))
            while r >= 1 and not self.kv.allocate(state, pos + r * gp1):
                r //= 2  # pool pressure: shrink the grant
            if r < 1:
                self._decode_batch()
                return None
            lanes["tokens2"][i] = (state.tokens[-2], state.tokens[-1])
            lanes["positions"][i] = pos
            lanes["live_mask"][i] = True
            lanes["budget"][i] = r * gp1
            lanes["tables"][i, :len(state.block_table)] = state.block_table
            if with_history:
                lanes["history"][i, :len(state.tokens)] = state.tokens
                lanes["hist_len"][i] = len(state.tokens)
            lanes["live"].append((i, state))
        self.counters["spec_ticks"] += 1
        return lanes

    def _spec_commit(self, live, gen, counts, acc, spec):
        """Shared commit for both speculative tick flavors. ONE host fetch
        for all four results (each fetch is a full tunnel round trip — see
        ``_pack_i32_f32``)."""
        packed = np.asarray(_pack_i32x4(gen, counts, acc, spec))
        gen = packed[:, :-3]
        counts, acc, spec = packed[:, -3], packed[:, -2], packed[:, -1]
        for i, state in live:
            self.spec_stats["accepted"] += int(acc[i])
            self.spec_stats["speculated"] += int(spec[i])
            # tokens past max_new are dropped by the finish check's break
            for t in gen[i, :counts[i]]:
                self._append_token(state, int(t))
                if state.finished:
                    break

    def _spec_decode_batch(self):
        """Draft-model speculative decode tick
        (``paged_model.speculative_horizon``)."""
        states = [s for s in self.active.values() if not s.finished]
        if not states:
            return
        lanes = self._spec_lane_setup(states, with_history=False)
        if lanes is None:
            return
        gen, counts, acc, spec, self.pool, self.draft_pool = \
            paged_model.speculative_horizon(
                self.model, self.draft_model, self.plus_one,
                self.draft_plus_one, self.params, self.draft_params,
                self.pool, self.draft_pool, self._put(lanes["tokens2"]),
                self._put(lanes["positions"]), self._put(lanes["tables"]),
                self._put(lanes["live_mask"]), self.gamma, self.spec_rounds,
                eos=(-1 if self.eos_token_id is None else self.eos_token_id),
                budget=self._put(lanes["budget"]),
                allow_pallas=self._allow_pallas, mesh=self._kernel_mesh)
        self._spec_commit(lanes["live"], gen, counts, acc, spec)

    def _ngram_decode_batch(self):
        """Prompt-lookup speculative decode tick (drafter-free): ships each
        lane's token history to the device once per tick; the bigram
        proposer + verification rounds run in-graph
        (``paged_model.ngram_horizon``)."""
        states = [s for s in self.active.values() if not s.finished]
        if not states:
            return
        lanes = self._spec_lane_setup(states, with_history=True)
        if lanes is None:
            return
        gen, counts, acc, spec, self.pool = paged_model.ngram_horizon(
            self.model, self.plus_one, self.params, self.pool,
            self._put(lanes["tokens2"]), self._put(lanes["positions"]),
            self._put(lanes["tables"]), self._put(lanes["live_mask"]),
            self._put(lanes["history"]), self._put(lanes["hist_len"]),
            self.gamma, self.spec_rounds,
            eos=(-1 if self.eos_token_id is None else self.eos_token_id),
            budget=self._put(lanes["budget"]),
            allow_pallas=self._allow_pallas, mesh=self._kernel_mesh)
        self._spec_commit(lanes["live"], gen, counts, acc, spec)

    def _medusa_decode_batch(self):
        """Self-speculative decode tick via Medusa heads: proposals come
        from the previous round's verified hidden state through the head
        blocks, in-graph (``paged_model.medusa_horizon``) — no drafter, no
        history shipping, the proposer rides the verification dispatch."""
        states = [s for s in self.active.values() if not s.finished]
        if not states:
            return
        lanes = self._spec_lane_setup(states, with_history=False)
        if lanes is None:
            return
        gen, counts, acc, spec, self.pool = paged_model.medusa_horizon(
            self.model, self.plus_one, self.params, self.medusa_params,
            self.pool, self._put(lanes["tokens2"]),
            self._put(lanes["positions"]), self._put(lanes["tables"]),
            self._put(lanes["live_mask"]), self.gamma, self.spec_rounds,
            eos=(-1 if self.eos_token_id is None else self.eos_token_id),
            budget=self._put(lanes["budget"]),
            allow_pallas=self._allow_pallas, mesh=self._kernel_mesh)
        self._spec_commit(lanes["live"], gen, counts, acc, spec)

    def _maybe_finish(self, state: SequenceState):
        new = len(state.tokens) - state.prompt_len
        hit_eos = (self.eos_token_id is not None
                   and not getattr(state, "ignore_eos", False)
                   and state.tokens[-1] in self.eos_ids
                   # a SECONDARY eos isn't banned in-graph under
                   # min_tokens; don't let it finish the lane early
                   and new >= getattr(state, "min_tokens", 0))
        out_of_blocks = len(state.tokens) >= \
            self.max_blocks_per_seq * self.block_size
        limit = getattr(state, "max_new", self.max_new_tokens)
        if hit_eos or new >= limit or out_of_blocks:
            self._finish(state)

    def _maybe_resolve_family(self, fam_id: int):
        """When every best_of rollout of a family has finished, surface
        only the winner (highest mean token logprob, OpenAI best_of) under
        the ORIGINAL submit id; losers are dropped."""
        fam = self._families.get(fam_id)
        if fam is None or not all(s.finished for s in fam):
            return
        def score(s):
            lps = s.logprobs or [float("-inf")]
            return sum(lps) / len(lps)
        winner = max(fam, key=score)
        winner.seq_id = fam_id          # surface under the submit id
        self.counters["requests_completed"] += 1   # one per SUBMIT
        self.finished[fam_id] = winner
        del self._families[fam_id]

    def step(self):
        """One scheduler tick: admit -> prefill -> decode batch.

        By default prefills drain fully before decoding so horizon-decode
        batches run at full occupancy (a decode tick costs the same
        regardless of how many lanes are live). ``max_prefill_per_tick``
        caps the prefill group calls per tick once sequences are decoding
        — bounding running sequences' inter-token stall under an arrival
        burst to ~cap prefill dispatches (the mixed-step role of the
        reference's ``_prepare_inference_data``, ``simple_vllm.ipynb``
        nb lines 705-738, done the static-shape way: bounded interleave
        rather than one ragged fused dispatch)."""
        self._try_admit()
        groups_done = 0
        while self.needs_prefill:
            if (self.max_prefill_per_tick is not None and self.active
                    and groups_done >= self.max_prefill_per_tick):
                break  # decode now; remaining prefills ride later ticks
            group = []
            while self.needs_prefill and len(group) < self.prefill_group:
                group.append(self.needs_prefill.popleft())
            self._prefill_group_call(group)
            groups_done += 1
            self._try_admit()
        if self.draft_model is not None:
            self._spec_decode_batch()
        elif self.ngram_speculation:
            self._ngram_decode_batch()
        elif self.medusa_params is not None:
            self._medusa_decode_batch()
        else:
            self._decode_batch()
