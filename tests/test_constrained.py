"""Guided (constrained) decoding: token FSMs, regex->DFA->token lift,
the jitted constrained loop, and per-request grammars in the serving
engine. Closes the constrained-decoding sliver of the reference's HF
``generate`` breadth (``models/custom_transformer.py:606-747``)."""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vyomai_tpu as vt
from vyomai_tpu.generation import (constrained_generate, fsm_from_regex,
                                   fsm_from_token_sequences)
from vyomai_tpu.serving import ContinuousBatchEngine

# toy tokenizer: index = token id; mix of single- and multi-char tokens so
# the lift exercises multi-char DFA walks; id 0 reserved (banned), last = EOS
TOKEN_STRINGS = [None, "a", "b", "c", "d", "e", "ab", "cd", "0", "1", "2",
                 "34", ".", "-", "ee", ""]
EOS = len(TOKEN_STRINGS)
TOKEN_STRINGS.append("<eos>")  # EOS placeholder (never matched as text)
VOCAB = len(TOKEN_STRINGS)

CFG = vt.QwenConfig(vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
                    num_hidden_layers=2, num_attention_heads=2,
                    num_key_value_heads=2, head_dim=16,
                    max_position_embeddings=128, eos_token_id=EOS)


def _decode(tokens):
    return "".join(TOKEN_STRINGS[t] or "" for t in tokens)


@pytest.fixture(scope="module")
def model():
    m = vt.ModelForCausalLM(CFG)
    params = m.init(jax.random.PRNGKey(0), dtype=jnp.float32)
    return m, params


def _strings_for_eos(fsm):
    """Enumerate every token path the FSM accepts (finite grammars only),
    decoded to strings."""
    out, stack = [], [(0, [])]
    while stack:
        s, path = stack.pop()
        row = fsm.next_state[s]
        for tok in np.nonzero(row >= 0)[0]:
            if tok == EOS:
                out.append(_decode(path))
            else:
                stack.append((int(row[tok]), path + [int(tok)]))
    return out


def test_trie_fsm_semantics():
    fsm = fsm_from_token_sequences([[3, 5, 7], [3, 9]], vocab_size=16,
                                   eos_token_id=15)
    assert fsm.advance(0, 3) == fsm.advance(0, 3)
    s1 = fsm.advance(0, 3)
    assert set(np.nonzero(fsm.allowed(s1))[0]) == {5, 9}
    s2 = fsm.advance(s1, 9)
    assert fsm.accepting[s2]
    assert set(np.nonzero(fsm.allowed(s2))[0]) == {15}   # only EOS
    with pytest.raises(ValueError):
        fsm.advance(0, 7)    # 7 is not a valid first token


def test_regex_fsm_lift_exhaustive():
    """Every token path the lifted FSM accepts decodes to a regex fullmatch,
    and known-good strings are reachable."""
    fsm = fsm_from_regex("(ab|cd)+e", TOKEN_STRINGS, EOS)
    # the grammar is infinite ((..)+); walk bounded depth instead
    seen = set()
    stack = [(0, "")]
    while stack:
        s, text = stack.pop()
        if len(text) > 7:
            continue
        row = fsm.next_state[s]
        for tok in np.nonzero(row >= 0)[0]:
            if tok == EOS:
                seen.add(text)
            else:
                stack.append((int(row[tok]), text + TOKEN_STRINGS[tok]))
    assert seen  # something is accepted
    for text in seen:
        assert re.fullmatch("(ab|cd)+e", text), text
    # multi-char token "ab" and single chars 'c','d' both spell matches
    assert "abe" in seen and "cde" in seen and "abcde" in seen
    # empty-string and None tokens are banned everywhere
    assert (fsm.next_state[:, 0] == -1).all()
    assert (fsm.next_state[:, 15] == -1).all()


def test_regex_number_grammar():
    pat = r"-?\d+(\.\d+)?"
    fsm = fsm_from_regex(pat, TOKEN_STRINGS, EOS)
    # walk "-", "34", ".", "1" then EOS
    s = 0
    for tok in [13, 11, 12, 9]:
        s = fsm.advance(s, tok)
    assert fsm.accepting[s]
    assert fsm.next_state[s, EOS] == s
    # "." alone is not a number: from the start state '.' is disallowed
    assert fsm.next_state[0, 12] == -1


def test_regex_rejects_unreachable():
    with pytest.raises(ValueError):
        fsm_from_regex("xyz+", TOKEN_STRINGS, EOS)  # no x/y/z in any token


def test_constrained_generate_finite_grammar(model):
    """A finite grammar ((ab|cd)e) forces greedy decode to a fullmatch and
    an EOS stop; every lane, every prompt."""
    m, params = model
    fsm = fsm_from_regex("(ab|cd)e", TOKEN_STRINGS, EOS)
    prompts = jnp.array([[1, 2, 3], [4, 5, 1]], dtype=jnp.int32)
    toks, states = constrained_generate(m, params, prompts, fsm,
                                        max_new_tokens=8)
    toks = np.asarray(toks)
    accepted = _strings_for_eos(fsm)
    for lane in range(2):
        gen = list(toks[lane, 3:])
        assert EOS in gen, gen
        text = _decode(gen[:gen.index(EOS)])
        assert text in accepted and re.fullmatch("(ab|cd)e", text), text
    assert np.asarray(fsm.accepting)[np.asarray(states)].all()


def test_constrained_generate_sampled(model):
    """Sampling under the grammar still only emits grammar tokens."""
    m, params = model
    pat = "(ab|cd)+e"
    fsm = fsm_from_regex(pat, TOKEN_STRINGS, EOS)
    prompts = jnp.array([[1, 2], [3, 4], [5, 1]], dtype=jnp.int32)
    toks, _ = constrained_generate(
        m, params, prompts, fsm, max_new_tokens=10, do_sample=True,
        temperature=1.5, rng=jax.random.PRNGKey(7))
    toks = np.asarray(toks)
    for lane in range(3):
        gen = list(toks[lane, 2:])
        gen = gen[:gen.index(EOS)] if EOS in gen else gen
        s = 0
        for t in gen:     # stepwise-legal under the FSM
            s = fsm.advance(s, int(t))
        text = _decode(gen)
        if EOS in list(toks[lane, 2:]):
            assert re.fullmatch(pat, text), text


def test_engine_guided_decoding(model):
    """Per-request grammars in the serving engine: a guided request
    fullmatches its grammar; an unguided one is untouched (token-exact vs
    an engine without fsms)."""
    m, params = model
    fsm_word = fsm_from_regex("(ab|cd)e", TOKEN_STRINGS, EOS)
    fsm_num = fsm_from_regex(r"-?\d+", TOKEN_STRINGS, EOS)
    prompts = [[1, 2, 3], [4, 5], [2, 2, 1, 3]]

    plain = ContinuousBatchEngine(m, params, num_blocks=64, block_size=8,
                                  max_batch=4, max_new_tokens=12,
                                  dtype=jnp.float32)
    for p in prompts:
        plain.submit(p)
    base = plain.run()

    eng = ContinuousBatchEngine(m, params, num_blocks=64, block_size=8,
                                max_batch=4, max_new_tokens=12,
                                dtype=jnp.float32,
                                fsms=[fsm_word, fsm_num])
    sid_word = eng.submit(prompts[0], fsm_id=0)
    sid_free = eng.submit(prompts[1])
    sid_num = eng.submit(prompts[2], fsm_id=1)
    out = eng.run()

    text = _decode(out[sid_word][:-1])
    assert out[sid_word][-1] == EOS
    assert re.fullmatch("(ab|cd)e", text), text
    gen_num = out[sid_num]
    gen_num = gen_num[:gen_num.index(EOS)] if EOS in gen_num else gen_num
    s = 0
    for t in gen_num:
        s = fsm_num.advance(s, int(t))    # stepwise-legal
    assert out[sid_free] == base[1], "unguided lane must be untouched"


def test_engine_fsm_validation(model):
    m, params = model
    fsm = fsm_from_regex("ab", TOKEN_STRINGS, EOS)
    eng = ContinuousBatchEngine(m, params, num_blocks=32, block_size=8,
                                max_batch=2, dtype=jnp.float32, fsms=[fsm])
    with pytest.raises(ValueError):
        eng.submit([1, 2], fsm_id=3)
    plain = ContinuousBatchEngine(m, params, num_blocks=32, block_size=8,
                                  max_batch=2, dtype=jnp.float32)
    with pytest.raises(ValueError):
        plain.submit([1, 2], fsm_id=0)
