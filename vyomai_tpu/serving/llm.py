"""vLLM-style offline batch inference API.

``LLM`` wraps :class:`~vyomai_tpu.serving.engine.ContinuousBatchEngine`
behind the interface vLLM users reach for first::

    llm = LLM(model, params, tokenizer=tok)
    outs = llm.generate(["a prompt", "another"],
                        SamplingParams(temperature=0.8, max_tokens=64))
    outs[0].outputs[0].text

The reference's serving notebook (``simple_vllm.ipynb`` cell 6) drives its
engine with a hand-written drain loop; this is the batteries-included
equivalent: prompt tokenization, pool sizing, per-request parameter
mapping, ``n`` parallel samples, finish reasons, and detokenized text.

Everything here is host-side sugar — the device work is exactly the
engine's (continuous batching, paged KV, horizon decode), so throughput
matches driving the engine directly.
"""

from dataclasses import dataclass, field, replace
from typing import Any, Dict, List, Optional, Sequence, Union

__all__ = ["LLM", "SamplingParams", "RequestOutput", "CompletionOutput"]


@dataclass
class SamplingParams:
    """Per-request sampling parameters (vLLM field names and semantics).

    ``temperature=0`` means greedy. On a mixed batch (some greedy, some
    sampled) the engine runs in sampling mode and greedy requests sample
    at temperature clamped to 1e-6 — argmax up to fp32 ties. ``stop``
    strings require the ``LLM`` to have a tokenizer (they are encoded as
    token sequences; a stop that never tokenizes to a suffix of the
    output cannot match — prefer ``stop_token_ids`` for exactness).
    ``n`` parallel samples are independent engine requests sharing the
    radix-cached prompt; with a ``seed``, sample ``i`` derives ``seed+i``.
    """
    n: int = 1
    best_of: Optional[int] = None          # > n picks the best by logprob
    temperature: float = 1.0
    top_p: float = 1.0
    min_p: float = 0.0
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    repetition_penalty: float = 1.0
    seed: Optional[int] = None
    max_tokens: int = 16
    min_tokens: int = 0
    ignore_eos: bool = False
    logprobs: bool = False
    logit_bias: Optional[Dict[int, float]] = None
    stop: Optional[Union[str, List[str]]] = None
    stop_token_ids: Optional[List[List[int]]] = None
    extra: Dict[str, Any] = field(default_factory=dict)  # fsm_id/lora_id/...

    def is_greedy(self) -> bool:
        return self.temperature == 0.0


@dataclass
class CompletionOutput:
    """One generated completion (vLLM ``CompletionOutput`` role)."""
    index: int
    token_ids: List[int]
    text: Optional[str]
    logprobs: Optional[List[float]]
    finish_reason: str                      # "stop" | "length"


@dataclass
class RequestOutput:
    """All completions for one prompt (vLLM ``RequestOutput`` role)."""
    prompt: Optional[str]
    prompt_token_ids: List[int]
    outputs: List[CompletionOutput]


def _as_list(x):
    return x if isinstance(x, list) else [x]


class LLM:
    """Offline batch generation over one model + params.

    ``tokenizer``: optional; anything with ``encode(str) -> List[int]``
    and ``decode(List[int]) -> str`` (an HF tokenizer works as-is).
    String prompts, ``stop`` strings, and output ``text`` need it.

    ``engine_kwargs`` pass through to ``ContinuousBatchEngine`` (mesh=...,
    dtype=..., kv_backend=..., fsms=..., loras=..., num_blocks=...). The
    engine is (re)built per :meth:`generate` call with limits sized to
    the batch — pool allocation is one device alloc; jit caches persist
    across engines, so repeated calls pay no recompiles.
    """

    def __init__(self, model, params, *, tokenizer=None, **engine_kwargs):
        self.model = model
        self.params = params
        self.tokenizer = tokenizer
        self.engine_kwargs = dict(engine_kwargs)

    # -- helpers ---------------------------------------------------------------
    def _encode(self, prompt) -> List[int]:
        if isinstance(prompt, str):
            if self.tokenizer is None:
                raise ValueError("string prompts need a tokenizer "
                                 "(pass tokenizer= to LLM)")
            return list(self.tokenizer.encode(prompt))
        return list(map(int, prompt))

    def _stops(self, sp: SamplingParams) -> Optional[List[List[int]]]:
        seqs: List[List[int]] = [list(map(int, s))
                                 for s in (sp.stop_token_ids or [])]
        stops = ([sp.stop] if isinstance(sp.stop, str) else (sp.stop or []))
        for s in stops:
            if self.tokenizer is None:
                raise ValueError("stop strings need a tokenizer; use "
                                 "stop_token_ids instead")
            ids = list(self.tokenizer.encode(s))
            if ids:
                seqs.append(ids)
        return seqs or None

    def _build_engine(self, params_list: List[SamplingParams],
                      prompt_lens: List[int]):
        from .engine import ContinuousBatchEngine
        kw = dict(self.engine_kwargs)
        sampling = any(not sp.is_greedy() for sp in params_list)
        need_lp = any(sp.logprobs or (sp.best_of or sp.n) > sp.n
                      for sp in params_list)
        max_new = max(sp.max_tokens for sp in params_list)
        kw.setdefault("max_new_tokens", max_new)
        kw["max_new_tokens"] = max(kw["max_new_tokens"], max_new)
        bs = kw.setdefault("block_size", 16)
        need_tok = max(pl for pl in prompt_lens) + kw["max_new_tokens"]
        blocks_per_seq = -(-need_tok // bs) + 1
        kw.setdefault("max_blocks_per_seq", blocks_per_seq)
        kw["max_blocks_per_seq"] = max(kw["max_blocks_per_seq"],
                                       blocks_per_seq)
        mb = kw.setdefault("max_batch", 8)
        # pool sized so a full batch never thrashes preemption
        kw.setdefault("num_blocks",
                      max(256, mb * kw["max_blocks_per_seq"]))
        kw.setdefault("do_sample", sampling)
        kw.setdefault("return_logprobs", need_lp)
        return ContinuousBatchEngine(self.model, self.params, **kw)

    # -- API -------------------------------------------------------------------
    def generate(self, prompts, sampling_params: Union[
            SamplingParams, Sequence[SamplingParams], None] = None,
            ) -> List[RequestOutput]:
        """Generate completions for one prompt or a list (strings or
        token-id lists). ``sampling_params``: one shared instance, a
        per-prompt list, or None (defaults). Returns one
        :class:`RequestOutput` per prompt, in prompt order."""
        single = not isinstance(prompts, list) or (
            prompts and isinstance(prompts[0], int))
        prompt_list = [prompts] if single else list(prompts)
        if not prompt_list:
            return []
        if sampling_params is None:
            sampling_params = SamplingParams()
        sp_list = (_as_list(sampling_params)
                   if isinstance(sampling_params, SamplingParams)
                   else list(sampling_params))
        if len(sp_list) == 1:
            sp_list = sp_list * len(prompt_list)
        if len(sp_list) != len(prompt_list):
            raise ValueError(f"{len(sp_list)} sampling_params for "
                             f"{len(prompt_list)} prompts")
        token_prompts = [self._encode(p) for p in prompt_list]
        eng = self._build_engine(sp_list, [len(t) for t in token_prompts])

        # (prompt index, sample index) -> engine seq id
        sids: Dict[int, List[int]] = {}
        for pi, (toks, sp) in enumerate(zip(token_prompts, sp_list)):
            if sp.n < 1:
                raise ValueError(f"n must be >= 1, got {sp.n}")
            kwargs: Dict[str, Any] = dict(
                max_new_tokens=sp.max_tokens,
                min_tokens=sp.min_tokens,
                ignore_eos=sp.ignore_eos,
                stop=self._stops(sp),
                **sp.extra)
            if sp.logit_bias:
                kwargs["logit_bias"] = sp.logit_bias
            best_of = sp.best_of or sp.n
            if best_of < sp.n:
                raise ValueError(f"best_of={best_of} < n={sp.n}")
            if best_of > sp.n and sp.n != 1:
                raise ValueError("best_of > n requires n == 1 (the engine "
                                 "surfaces one winner per family)")
            if eng.do_sample:
                # greedy request on a sampling engine: clamp-to-argmax
                kwargs.update(
                    temperature=max(sp.temperature, 1e-6),
                    top_p=sp.top_p, min_p=sp.min_p)
            if sp.presence_penalty:
                kwargs["presence_penalty"] = sp.presence_penalty
            if sp.frequency_penalty:
                kwargs["frequency_penalty"] = sp.frequency_penalty
            if sp.repetition_penalty != 1.0:
                kwargs["repetition_penalty"] = sp.repetition_penalty
            if best_of > sp.n:
                kwargs["best_of"] = best_of
            row = []
            for si in range(sp.n):
                # vLLM accepts seed with greedy sampling (it is a no-op);
                # the engine validates seed needs do_sample — only forward
                # it when the engine actually samples (code-review r3)
                if sp.seed is not None and eng.do_sample:
                    kwargs["seed"] = (sp.seed + si) % (2 ** 31)
                row.append(eng.submit(list(toks), **kwargs))
            sids[pi] = row

        results = eng.run(with_logprobs=eng.return_logprobs)

        outs: List[RequestOutput] = []
        for pi, (toks, sp) in enumerate(zip(token_prompts, sp_list)):
            comps = []
            for si, sid in enumerate(sids[pi]):
                res = results[sid]
                gen, lps = res if isinstance(res, tuple) else (res, None)
                # under ignore_eos the run is length-capped and a trailing
                # token that coincidentally equals an EOS id is a REAL
                # generated token: report "length" and keep it in .text
                hit_eos = (not sp.ignore_eos and bool(gen)
                           and gen[-1] in eng.eos_ids)
                finish = ("stop" if hit_eos or len(gen) < sp.max_tokens
                          else "length")
                text = None
                if self.tokenizer is not None:
                    shown = gen[:-1] if hit_eos else gen
                    text = self.tokenizer.decode(shown)
                comps.append(CompletionOutput(
                    index=si, token_ids=list(gen), text=text,
                    logprobs=(list(lps) if sp.logprobs and lps is not None
                              else None),
                    finish_reason=finish))
            outs.append(RequestOutput(
                prompt=(prompt_list[pi]
                        if isinstance(prompt_list[pi], str) else None),
                prompt_token_ids=list(toks), outputs=comps))
        return outs

    def chat(self, messages, sampling_params: Optional[SamplingParams]
             = None, *, chat_ids: Dict[str, Any]) -> RequestOutput:
        """One chat completion over ``[(role, content), ...]`` using the
        Qwen-style template (``serving.chat.build_chat_prompt``).
        ``chat_ids``: ``im_start_id``/``im_end_id``/``newline_id`` (+
        optional ``assistant_role_ids``). Needs a tokenizer."""
        if self.tokenizer is None:
            raise ValueError("chat needs a tokenizer")
        from .chat import build_chat_prompt
        ids = build_chat_prompt(list(messages), self.tokenizer.encode,
                                **chat_ids)
        sp = sampling_params or SamplingParams()
        if not sp.stop_token_ids:
            sp = replace(sp, stop_token_ids=[[chat_ids["im_end_id"]]])
        return self.generate([ids], sp)[0]
