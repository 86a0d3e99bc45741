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

from collections import deque
from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from . import paged_model
from .kv_manager import PagedKVManager, SequenceState


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
                 prefill_group: int = 4):
        self.model = model
        self.params = params
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
        self.eos_token_id = (eos_token_id if eos_token_id is not None
                             else getattr(self.cfg, "eos_token_id", None))
        self.prefill_buckets = tuple(prefill_buckets)
        # tokens decoded per host round-trip (device-side multi-step loop)
        self.decode_horizon = max(1, decode_horizon)
        # admissions prefilled per device call (padded, recompile-free)
        self.prefill_group = max(1, prefill_group)
        self.pool = paged_model.init_pool(self.cfg, num_blocks, block_size,
                                          dtype=dtype)
        self.waiting: deque = deque()
        self.active: Dict[int, SequenceState] = {}
        self.needs_prefill: deque = deque()
        self.finished: Dict[int, SequenceState] = {}
        self._next_id = 0

    # -- API ------------------------------------------------------------------
    def submit(self, prompt: Sequence[int]) -> int:
        sid = self._next_id
        self._next_id += 1
        self.waiting.append(SequenceState(sid, prompt))
        return sid

    def run(self) -> Dict[int, List[int]]:
        """Drain all requests; returns {seq_id: generated tokens}."""
        while self.waiting or self.active or self.needs_prefill:
            self.step()
        return {sid: s.tokens[s.prompt_len:]
                for sid, s in self.finished.items()}

    # -- scheduling -------------------------------------------------------------
    def _try_admit(self):
        while self.waiting and len(self.active) + len(self.needs_prefill) \
                < self.max_batch:
            state = self.waiting[0]
            self.kv.match_prefix(state)
            budget = len(state.tokens) + 1  # room for the first new token
            if not self.kv.allocate(state, budget):
                self.kv.release_sequence(state)  # roll back and wait
                break
            self.waiting.popleft()
            self.needs_prefill.append(state)

    def _slots_for(self, state: SequenceState, start: int, count: int):
        """(blocks, offsets) pool targets for token positions
        [start, start+count)."""
        bs = self.block_size
        blocks = [state.block_table[(start + i) // bs] for i in range(count)]
        offs = [(start + i) % bs for i in range(count)]
        return blocks, offs

    def _prefill_group_call(self, states):
        """Prefill up to ``prefill_group`` admissions in one device call
        (padded to the group's largest suffix bucket; dead lanes masked)."""
        n_pad = self.prefill_group
        suffixes = [s.tokens[s.num_cached_tokens:s.prompt_len]
                    for s in states]
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
            ctx_len[i] = state.prompt_len
            true_len[i] = t

        logits, self.pool = paged_model.prefill(
            self.model, self.plus_one, self.params, self.pool,
            jnp.asarray(ids), jnp.asarray(positions),
            jnp.asarray(slot_blocks), jnp.asarray(slot_offsets),
            jnp.asarray(tables), jnp.asarray(ctx_len), jnp.asarray(true_len))
        next_tokens = np.asarray(jnp.argmax(logits, axis=-1))
        for i, state in enumerate(states):
            state.tokens.append(int(next_tokens[i]))
            self.active[state.seq_id] = state
            self._maybe_finish(state)

    def _decode_batch(self):
        states = [s for s in self.active.values() if not s.finished]
        if not states:
            return
        b = self.max_batch
        horizon = self.decode_horizon
        tokens = np.zeros(b, dtype=np.int32)
        positions = np.zeros(b, dtype=np.int32)
        live_mask = np.zeros(b, dtype=bool)
        tables = np.full((b, self.max_blocks_per_seq), -1, dtype=np.int32)

        live = []
        for i, state in enumerate(states[:b]):
            pos = len(state.tokens) - 1  # position of the latest token
            # budget the whole horizon up front so in-graph slot arithmetic
            # never walks off the block table; cap by table capacity
            remaining = self.max_new_tokens - (len(state.tokens)
                                               - state.prompt_len)
            cap = self.max_blocks_per_seq * self.block_size - pos
            h = max(min(horizon, remaining, cap), 1)
            while h >= 1 and not self.kv.allocate(state, pos + h):
                h //= 2  # pool pressure: shrink the grant
            if h < 1:
                continue  # pool exhausted: retry next tick
            tokens[i] = state.tokens[-1]
            positions[i] = pos
            live_mask[i] = True
            tables[i, :len(state.block_table)] = state.block_table
            live.append((i, state, h))

        if not live:
            return
        gen, self.pool = paged_model.decode_horizon(
            self.model, self.plus_one, self.params, self.pool,
            jnp.asarray(tokens), jnp.asarray(positions), jnp.asarray(tables),
            jnp.asarray(live_mask), horizon)
        gen = np.asarray(gen)
        for i, state, h in live:
            # only the granted steps are backed by allocated blocks
            for t in gen[i, :h]:
                state.tokens.append(int(t))
                self._maybe_finish(state)
                if state.finished:
                    break

    def _maybe_finish(self, state: SequenceState):
        new = len(state.tokens) - state.prompt_len
        hit_eos = (self.eos_token_id is not None
                   and state.tokens[-1] == self.eos_token_id)
        out_of_blocks = len(state.tokens) >= \
            self.max_blocks_per_seq * self.block_size
        if hit_eos or new >= self.max_new_tokens or out_of_blocks:
            state.finished = True
            self.kv.free(state)
            self.active.pop(state.seq_id, None)
            self.finished[state.seq_id] = state

    def step(self):
        """One scheduler tick: admit -> drain prefills -> decode batch.

        Prefills drain fully before decoding so horizon-decode batches run
        at full occupancy (a decode tick costs the same regardless of how
        many lanes are live)."""
        self._try_admit()
        while self.needs_prefill:
            group = []
            while self.needs_prefill and len(group) < self.prefill_group:
                group.append(self.needs_prefill.popleft())
            self._prefill_group_call(group)
            self._try_admit()
        self._decode_batch()
