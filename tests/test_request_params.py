"""Serving request-API completeness vs vLLM ``SamplingParams``:
``repetition_penalty`` / ``min_tokens`` / ``ignore_eos`` / ``logit_bias``
per request, riding the on-device horizon loop. Gold references:
``generate_hf`` (same penalty/min-length semantics in one jitted program)
and hand-constructed logits expectations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vyomai_tpu as vt
from vyomai_tpu.generation import generate_hf
from vyomai_tpu.serving import ContinuousBatchEngine

QCFG = vt.QwenConfig(vocab_size=512, hidden_size=64, intermediate_size=128,
                     num_hidden_layers=2, num_attention_heads=4,
                     num_key_value_heads=2, head_dim=32,
                     max_position_embeddings=256, qk_norm=True,
                     eos_token_id=9999, tie_word_embeddings=True)

PROMPT = [3, 17, 42, 9]


@pytest.fixture(scope="module")
def qwen():
    model = vt.ModelForCausalLM(QCFG)
    params = model.init(jax.random.PRNGKey(2), dtype=jnp.float32)
    return model, params


def _engine(model, params, **kw):
    kw.setdefault("decode_horizon", 4)
    return ContinuousBatchEngine(model, params, num_blocks=64, block_size=8,
                                 max_batch=4, max_new_tokens=12,
                                 dtype=jnp.float32, **kw)


def _one(eng, *a, **kw):
    sid = eng.submit(*a, **kw)
    return eng.run()[sid]


def test_repetition_penalty_matches_generate_hf(qwen):
    """Engine greedy with repetition_penalty == generate_hf greedy with the
    same penalty (CTRL semantics over prompt + output), and differs from
    the unpenalized run (greedy loops get broken).

    Runs on the CPU backend: dividing logits by the penalty compresses
    argmax gaps, and the engine (paged pool) and generate_hf (dense cache)
    are different programs — on the TPU's bf16-multiply fp32 matmuls a
    ~1e-3 logit jitter flips near-tie argmaxes on late tokens (observed:
    last-token mismatch at rp=1.3). CPU fp32 is deterministic and the
    semantics under test are backend-independent."""
    model, params = qwen
    with jax.default_device(jax.devices("cpu")[0]):
        _rep_penalty_body(model, params)


def _rep_penalty_body(model, params):
    eng = _engine(model, params)
    plain = eng.run() if not eng.submit(PROMPT) else eng.run()
    plain = list(plain.values())[0]
    assert len(set(plain)) < len(plain), "baseline must actually repeat"

    for rp in (1.3, 2.0):
        gold = generate_hf(model, params, jnp.asarray([PROMPT]),
                           max_new_tokens=12, repetition_penalty=rp,
                           eos_token_id=None)
        gold = np.asarray(gold)[0, len(PROMPT):].tolist()
        eng = _engine(model, params)
        sid = eng.submit(PROMPT, repetition_penalty=rp)
        got = eng.run()[sid]
        assert got == gold, rp
        assert got != plain, "penalty must change a repeating greedy path"

    # engine-level default applies to every request
    eng = _engine(model, params, repetition_penalty=1.3)
    sid = eng.submit(PROMPT)
    gold = generate_hf(model, params, jnp.asarray([PROMPT]),
                       max_new_tokens=12, repetition_penalty=1.3,
                       eos_token_id=None)
    assert eng.run()[sid] == np.asarray(gold)[0, len(PROMPT):].tolist()


def test_repetition_penalty_first_token(qwen):
    """The penalty also applies to the PREFILL-sampled first token (prompt
    tokens are 'seen'): a prompt whose greedy continuation equals its last
    token gets redirected when the penalty is strong."""
    model, params = qwen
    eng = _engine(model, params)
    sid = eng.submit(PROMPT)
    first = eng.run()[sid][0]
    # make the first generated token a repeat case: prompt ends with it
    prompt2 = PROMPT + [first]
    eng = _engine(model, params)
    base = eng.run() if not eng.submit(prompt2) else eng.run()
    gold = generate_hf(model, params, jnp.asarray([prompt2]),
                       max_new_tokens=12, repetition_penalty=50.0,
                       eos_token_id=None)
    gold = np.asarray(gold)[0, len(prompt2):].tolist()
    eng = _engine(model, params)
    sid = eng.submit(prompt2, repetition_penalty=50.0)
    assert eng.run()[sid] == gold


def _eos_model(qwen, ref_tokens, at):
    """A config whose eos is a token the greedy run actually emits."""
    eos = int(ref_tokens[at])
    cfg = vt.QwenConfig(**{**QCFG.__dict__, "eos_token_id": eos})
    return vt.ModelForCausalLM(cfg), eos


def _varied_case(model, params):
    """(prompt, ref, at): a prompt whose greedy output first emits token
    ref[at] at generated index at >= 1 (so an eos-model built from it
    finishes after exactly at+1 tokens). Greedy toy models love to loop,
    so probe a few prompts."""
    for prompt in ([5, 11], [3, 17, 42, 9], [2, 3, 5, 7, 11, 13],
                   [100, 200, 300], [63, 1, 250]):
        e = _engine(model, params)
        ref = _one(e, prompt)
        for at in range(1, len(ref) - 3):
            if ref[at] not in ref[:at] and ref[at] not in prompt:
                return prompt, ref, at
    raise AssertionError("no varied greedy continuation found")


def test_min_tokens_delays_eos(qwen):
    """EOS is banned until min_tokens generated; afterwards decoding
    proceeds normally (matches generate_hf's min_new_tokens)."""
    model, params = qwen
    prompt, ref, at = _varied_case(model, params)
    m2, eos = _eos_model(qwen, ref, at)

    e2 = _engine(m2, params)
    short = _one(e2, prompt)
    assert short[-1] == eos and len(short) == at + 1, "eos must fire early"

    for mt in (at + 3, at + 6):
        gold = generate_hf(m2, params, jnp.asarray([prompt]),
                           max_new_tokens=12, min_new_tokens=mt,
                           eos_token_id=eos, pad_token_id=0)
        g = np.asarray(gold)[0, len(prompt):].tolist()
        g = g[:g.index(eos) + 1] if eos in g else g
        e3 = _engine(m2, params)
        sid = e3.submit(prompt, min_tokens=mt)
        got = e3.run()[sid]
        assert got == g, mt
        assert len(got) >= mt


def test_min_tokens_first_token(qwen):
    """min_tokens covers the prefill-sampled FIRST token too: a model
    whose immediate greedy pick is EOS must emit something else."""
    model, params = qwen
    eng = _engine(model, params)
    ref = list((eng.run() if not eng.submit(PROMPT) else eng.run()
                ).values())[0]
    m2, eos = _eos_model(qwen, ref, 0)  # eos == very first greedy token
    e2 = _engine(m2, params)
    assert _one(e2, PROMPT) == [eos]
    e3 = _engine(m2, params)
    got = _one(e3, PROMPT, min_tokens=3)
    assert len(got) >= 3 and got[0] != eos


def test_min_tokens_gates_stop_sequences(qwen):
    """Stop sequences don't match until min_tokens have been generated
    (vLLM: min_tokens delays every stop condition except max_tokens).
    Gold: host replay of the unstopped greedy stream with the same
    gating (stops don't alter logits, only truncate)."""
    model, params = qwen
    eng = _engine(model, params)
    ref = list((eng.run() if not eng.submit(PROMPT) else eng.run()
                ).values())[0]
    stop = [ref[1:3]]

    def replay(mt):
        out = []
        for t in ref:
            out.append(t)
            if len(out) >= mt:
                for seq in stop:
                    if len(out) >= len(seq) and out[-len(seq):] == seq:
                        return out[:-len(seq)]
        return out

    e1 = _engine(model, params)
    early = _one(e1, PROMPT, stop=stop)
    assert early == replay(0)
    e2 = _engine(model, params)
    late = _one(e2, PROMPT, stop=stop, min_tokens=6)
    assert late == replay(6)
    assert len(late) > len(early), "gating must delay the match"


def test_ignore_eos_runs_to_limit(qwen):
    """ignore_eos: the request decodes straight past EOS to its token
    limit (the vLLM benchmark convention)."""
    model, params = qwen
    prompt, ref, at = _varied_case(model, params)
    m2, eos = _eos_model(qwen, ref, at)
    e1 = _engine(m2, params)
    assert len(_one(e1, prompt)) == at + 1
    e2 = _engine(m2, params)
    got = _one(e2, prompt, ignore_eos=True, max_new_tokens=10)
    assert len(got) == 10
    assert got[at] == eos, "EOS token itself still appears in the stream"


def test_logit_bias_forces_and_bans(qwen):
    """OpenAI logit_bias: a +100 bias forces a token every step; a -100
    bias on the greedy winner redirects the output; logprobs stay
    raw-model (the bias is not baked into reported scores)."""
    model, params = qwen
    eng = _engine(model, params)
    ref = list((eng.run() if not eng.submit(PROMPT) else eng.run()
                ).values())[0]

    e1 = _engine(model, params)
    sid = e1.submit(PROMPT, logit_bias={7: 100.0})
    assert e1.run()[sid] == [7] * 12

    e2 = _engine(model, params, return_logprobs=True)
    sid = e2.submit(PROMPT, logit_bias={int(ref[0]): -100.0,
                                        int(ref[1]): -100.0})
    toks, lps = e2.run(with_logprobs=True)[sid]
    assert toks[0] not in (ref[0], ref[1])
    # raw-model convention: the reported logprob of a heavily-biased pick
    # is the model's own (possibly tiny) probability, not ~0
    e3 = _engine(model, params, return_logprobs=True)
    sid = e3.submit(PROMPT, logit_bias={7: 100.0})
    _, lps3 = e3.run(with_logprobs=True)[sid]
    assert min(lps3) < -1.0, "biased pick must report raw (low) logprob"


def test_request_params_validation(qwen):
    """Bad values are rejected at submit; speculative engines reject the
    whole family of per-step logits processing."""
    model, params = qwen
    eng = _engine(model, params)
    with pytest.raises(ValueError, match="repetition_penalty"):
        eng.submit(PROMPT, repetition_penalty=0.0)
    with pytest.raises(ValueError, match="min_tokens"):
        eng.submit(PROMPT, min_tokens=99)
    with pytest.raises(ValueError, match="vocab"):
        eng.submit(PROMPT, logit_bias={QCFG.vocab_size: 1.0})
    spec = _engine(model, params, ngram_speculation=True)
    for kw in ({"repetition_penalty": 1.5}, {"min_tokens": 2},
               {"ignore_eos": True}, {"logit_bias": {7: 1.0}}):
        with pytest.raises(ValueError, match="speculative"):
            spec.submit(PROMPT, **kw)
    with pytest.raises(ValueError, match="repetition_penalty"):
        _engine(model, params, repetition_penalty=-1.0)


def test_params_compose_in_one_batch(qwen):
    """Different lanes with different request params share one batch: each
    output matches its single-request run (per-lane vectors really are
    per-lane)."""
    model, params = qwen
    subs = [dict(), dict(repetition_penalty=2.0), dict(logit_bias={7: 100.0}),
            dict(min_tokens=1)]

    singles = []
    for kw in subs:
        e = _engine(model, params)
        singles.append(_one(e, PROMPT, **kw))

    eng = _engine(model, params)
    sids = [eng.submit(PROMPT, **kw) for kw in subs]
    out = eng.run()
    assert [out[s] for s in sids] == singles


def test_params_survive_best_of_and_stream(qwen):
    """best_of siblings inherit the new params; stream() coexists with
    logit_bias (forced tokens stream normally)."""
    model, params = qwen
    eng = _engine(model, params, do_sample=True, temperature=0.7, seed=5,
                  return_logprobs=True)
    sid = eng.submit(PROMPT, best_of=2, logit_bias={7: 100.0})
    out = eng.run()[sid]
    assert out == [7] * 12

    eng2 = _engine(model, params)
    sid2 = eng2.submit(PROMPT, logit_bias={7: 100.0}, max_new_tokens=5)
    got = [t for s, t, d in eng2.stream() if t is not None]
    assert got == [7] * 5


def test_seed_deterministic_across_batch_and_engine(qwen):
    """A seeded request's sampled output is a pure function of (weights,
    prompt, seed): identical whether it runs alone, next to other traffic,
    or on an engine with a different global seed (vLLM per-request seed)."""
    model, params = qwen

    def run(engine_seed, extra_traffic):
        eng = _engine(model, params, do_sample=True, temperature=1.0,
                      seed=engine_seed)
        sid = eng.submit(PROMPT, seed=1234)
        if extra_traffic:
            eng.submit([5, 11], seed=None)
            eng.submit([2, 3, 5, 7])
        return eng.run()[sid]

    alone = run(0, False)
    assert run(0, True) == alone, "batch composition changed a seeded lane"
    assert run(99, True) == alone, "engine seed leaked into a seeded lane"
    assert run(99, False) == alone
    # a different request seed gives a different stream
    eng = _engine(model, params, do_sample=True, temperature=1.0)
    assert _one(eng, PROMPT, seed=77) != alone


def test_seed_survives_preemption(qwen):
    """Preemption replays a victim's prefill; the fold_in(PRNGKey(seed), k)
    stream keys on the GENERATED INDEX, so the replayed request continues
    its exact sampled trajectory."""
    model, params = qwen
    calm = _engine(model, params, do_sample=True, temperature=1.0)
    want = _one(calm, PROMPT, seed=4321)

    rng = np.random.default_rng(3)
    eng = ContinuousBatchEngine(model, params, num_blocks=9, block_size=8,
                                max_batch=4, max_blocks_per_seq=8,
                                max_new_tokens=12, decode_horizon=2,
                                dtype=jnp.float32,
                                do_sample=True, temperature=1.0, seed=5)
    sid = eng.submit(PROMPT, seed=4321)
    for _ in range(6):
        eng.submit(list(rng.integers(2, 400, size=int(rng.integers(12, 30)))))
    out = eng.run()
    assert eng.metrics()["preemptions"] > 0, "pool too big to force preempt"
    assert out[sid] == want


def test_seed_same_twice_and_best_of(qwen):
    """Same seed twice = same output; best_of siblings derive distinct
    seeds, so the family result is ALSO deterministic end-to-end."""
    model, params = qwen
    eng = _engine(model, params, do_sample=True, temperature=1.0)
    a = _one(eng, PROMPT, seed=7)
    eng2 = _engine(model, params, do_sample=True, temperature=1.0, seed=8)
    assert _one(eng2, PROMPT, seed=7) == a

    def fam(engine_seed):
        e = _engine(model, params, do_sample=True, temperature=1.0,
                    seed=engine_seed, return_logprobs=True)
        return _one(e, PROMPT, seed=7, best_of=3)

    assert fam(0) == fam(42), "seeded best_of family must be deterministic"


def test_seed_validation(qwen):
    model, params = qwen
    greedy = _engine(model, params)
    with pytest.raises(ValueError, match="do_sample"):
        greedy.submit(PROMPT, seed=3)
    eng = _engine(model, params, do_sample=True)
    with pytest.raises(ValueError, match="seed"):
        eng.submit(PROMPT, seed=-1)


def test_best_of_sibling_seed_wraps(qwen):
    """Sibling seeds derive from the request seed; at the top of the
    validated range they must wrap back into int32 (np.int32 seed lanes
    overflow otherwise, crashing the decode tick)."""
    model, params = qwen
    eng = _engine(model, params, do_sample=True, return_logprobs=True)
    sid = eng.submit(PROMPT, seed=2 ** 31 - 1, best_of=2)
    assert all(0 <= s.seed < 2 ** 31 for s in eng._families[sid])
    out = eng.run()                     # would OverflowError unwrapped
    assert sid in out and len(out[sid]) > 0


def test_min_tokens_gates_on_generated_count(qwen):
    """The prefill-path EOS ban must count tokens already generated: a
    PREEMPTION REPLAY re-prefills mid-generation, and banning EOS after
    min_tokens is already met would change the replayed token (breaking
    greedy token-exactness under preemption)."""
    model, params = qwen
    eng = _engine(model, params, eos_token_id=7)
    eng.submit(PROMPT, min_tokens=1)
    st = eng.waiting[0]
    logits = jnp.zeros((1, QCFG.vocab_size)).at[0, 7].set(100.0)
    fresh, _ = eng._pick_tokens(logits, [st])
    assert int(fresh[0]) != 7           # still owes 1 token: EOS banned
    st.tokens = st.tokens + [5]         # replay: 1 token already generated
    replay, _ = eng._pick_tokens(logits, [st])
    assert int(replay[0]) == 7          # debt met: EOS must be allowed
