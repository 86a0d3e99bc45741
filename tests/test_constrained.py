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


def test_trie_fsm_eos_inside_sequence():
    """eos_token_id appearing MID-sequence must not be clobbered by the
    accepting state's EOS self-loop — continuation wins (code-review r3;
    the longer sequence was silently ungeneratable before)."""
    fsm = fsm_from_token_sequences([[5], [5, 2, 7]], vocab_size=10,
                                   eos_token_id=2)
    s1 = fsm.advance(0, 5)
    s2 = fsm.advance(s1, 2)
    assert s2 != s1                     # trie edge, not a self-loop
    s3 = fsm.advance(s2, 7)
    assert fsm.accepting[s3]
    assert set(np.nonzero(fsm.allowed(s3))[0]) == {2}   # stop via EOS


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


# ---------------------------------------------------------------------------
# JSON Schema structured output
# ---------------------------------------------------------------------------

import json

from vyomai_tpu.generation import fsm_from_json_schema, json_schema_to_regex

# tokenizer fragment with full JSON punctuation + digits + some words
JSON_TOKENS = [None, "{", "}", "[", "]", '"', ":", ",", "-", ".",
               "0", "1", "2", "3", "4", "5", "6", "7", "8", "9",
               "true", "false", "null", "a", "b", "name", "age", "id",
               "e", "E", "+", '\\', "t", "n", "ab", "12", ""]
JEOS = len(JSON_TOKENS)
JSON_TOKENS.append("<eos>")
JVOCAB = len(JSON_TOKENS)


def _jdecode(tokens):
    return "".join(JSON_TOKENS[t] or "" for t in tokens)


def _walk_accepted(fsm, decode, max_len=14, cap=4000):
    """Bounded DFS over accepted token paths, decoded to strings."""
    out, stack = [], [(0, [])]
    while stack and len(out) < cap:
        s, path = stack.pop()
        if len(path) > max_len:
            continue
        row = fsm.next_state[s]
        for tok in np.nonzero(row >= 0)[0]:
            if tok == JEOS:
                out.append(decode(path))
            else:
                stack.append((int(row[tok]), path + [int(tok)]))
    return out


def test_schema_regex_scalars():
    for schema, good, bad in [
        ({"type": "integer"}, ["0", "-7", "123"], ["01", "--1", "1.5", ""]),
        ({"type": "number"}, ["0", "-1.5", "2e9", "1.25E-3"],
         ["1.", ".5", "e9"]),
        ({"type": "boolean"}, ["true", "false"], ["True", "1"]),
        ({"type": "null"}, ["null"], ["nil", ""]),
        ({"type": "string"}, ['""', '"ab"', '"a\\nb"', '"\\u00e9"'],
         ['"', 'ab', '"a"b"']),
        ({"enum": ["a", 1, True, None]}, ['"a"', "1", "true", "null"],
         ['a', '2']),
        ({"const": {"k": [1, 2]}}, ['{"k":[1,2]}'], ['{"k": [1,2]}']),
        ({"type": "string", "minLength": 2, "maxLength": 3},
         ['"ab"', '"abc"'], ['"a"', '"abcd"']),
        ({"type": "string", "pattern": "^ab+$"}, ['"ab"', '"abb"'],
         ['"a"', 'ab']),
        ({"anyOf": [{"type": "integer"}, {"type": "null"}]},
         ["3", "null"], ["true"]),
        ({"type": ["integer", "boolean"]}, ["4", "true"], ["null"]),
    ]:
        pat = json_schema_to_regex(schema)
        for s in good:
            assert re.fullmatch(pat, s), (schema, s, pat)
        for s in bad:
            assert not re.fullmatch(pat, s), (schema, s, pat)


def test_schema_regex_object_array():
    schema = {
        "type": "object",
        "properties": {
            "name": {"type": "string", "minLength": 1, "maxLength": 4},
            "age": {"type": "integer"},
            "tags": {"type": "array", "items": {"enum": ["a", "b"]},
                     "minItems": 1, "maxItems": 3},
        },
        "required": ["name", "age"],
    }
    pat = json_schema_to_regex(schema)
    for s in ['{"name":"ab","age":3}',
              '{"name":"x","age":-1,"tags":["a"]}',
              '{"name":"abcd","age":0,"tags":["a","b","a"]}']:
        assert re.fullmatch(pat, s), s
        json.loads(s)
    for s in ['{"age":3}',                        # missing required
              '{"age":3,"name":"ab"}',            # wrong order (canonical)
              '{"name":"ab","age":3,"tags":[]}',  # minItems
              '{"name":"ab","age":3,"tags":["a","b","a","b"]}',  # maxItems
              '{"name":"","age":3}',              # minLength
              '{ "name":"ab","age":3}']:          # whitespace
        assert not re.fullmatch(pat, s), s


def test_schema_regex_refs_and_errors():
    schema = {
        "$defs": {"coord": {"type": "array", "items": {"type": "number"},
                            "minItems": 2, "maxItems": 2}},
        "type": "object",
        "properties": {"p": {"$ref": "#/$defs/coord"}},
        "required": ["p"],
    }
    pat = json_schema_to_regex(schema)
    assert re.fullmatch(pat, '{"p":[1.5,-2]}')
    assert not re.fullmatch(pat, '{"p":[1.5]}')
    with pytest.raises(ValueError):    # recursion
        json_schema_to_regex({"$defs": {"n": {"$ref": "#/$defs/n"}},
                              "$ref": "#/$defs/n"})
    with pytest.raises(ValueError):    # allOf
        json_schema_to_regex({"allOf": [{"type": "integer"}]})
    with pytest.raises(ValueError):    # required not in properties
        json_schema_to_regex({"type": "object", "properties": {},
                              "required": ["x"]})
    with pytest.raises(ValueError):    # no type
        json_schema_to_regex({})


def test_schema_fsm_every_path_is_valid_json():
    """Bounded-exhaustive: every token path the lifted FSM accepts parses as
    JSON AND validates against the schema."""
    # finite id domain so the bounded DFS covers the whole language
    # (an unbounded integer floods the walk cap with digit expansions)
    schema = {"type": "object",
              "properties": {"id": {"enum": [0, 7, 12]},
                             "a": {"enum": [True, None]}},
              "required": ["id"]}
    fsm = fsm_from_json_schema(schema, JSON_TOKENS, JEOS)
    texts = _walk_accepted(fsm, _jdecode, max_len=16)
    assert texts, "nothing accepted"
    seen_optional = False
    for t in texts:
        obj = json.loads(t)      # parses
        assert isinstance(obj["id"], int)
        extra = set(obj) - {"id", "a"}
        assert not extra, t
        if "a" in obj:
            assert obj["a"] in (True, None)
            seen_optional = True
    assert seen_optional, "optional property never emitted in the walk"


def test_constrained_generate_json_schema(model):
    """End-to-end: greedy decode under a schema FSM emits schema-valid
    compact JSON, terminated by EOS."""
    m, params = model
    # model vocab is VOCAB (17); build a JSON-capable toy map of that size
    toks = [None, "{", "}", '"', ":", ",", "a", "b", "0", "1",
            "-", "true", "false", "null", "[", "]"]
    assert len(toks) == VOCAB - 1
    toks.append("<eos>")
    # finite grammar (enum + boolean) so greedy MUST reach EOS: an
    # unbounded integer would let the model pad digits past max_new_tokens
    schema = {"type": "object",
              "properties": {"a": {"enum": [0, 1, 10]},
                             "b": {"type": "boolean"}},
              "required": ["a", "b"]}
    fsm = fsm_from_json_schema(schema, toks, EOS)
    prompts = jnp.array([[1, 2, 3], [4, 5, 1]], dtype=jnp.int32)
    out, states = constrained_generate(m, params, prompts, fsm,
                                       max_new_tokens=24)
    out = np.asarray(out)
    for lane in range(2):
        gen = list(out[lane, 3:])
        assert EOS in gen, gen
        text = "".join(toks[t] or "" for t in gen[:gen.index(EOS)])
        obj = json.loads(text)
        assert isinstance(obj["a"], int) and isinstance(obj["b"], bool), text
    assert np.asarray(fsm.accepting)[np.asarray(states)].all()


def test_engine_json_schema_guided(model):
    """Per-request structured output through the serving engine."""
    m, params = model
    toks = [None, "{", "}", '"', ":", ",", "a", "b", "0", "1",
            "-", "true", "false", "null", "[", "]", "<eos>"]
    schema = {"type": "object",
              "properties": {"a": {"enum": [0, 1, 10]}},
              "required": ["a"]}
    fsm = fsm_from_json_schema(schema, toks, EOS)
    eng = ContinuousBatchEngine(m, params, num_blocks=64, block_size=8,
                                max_batch=2, max_new_tokens=16,
                                dtype=jnp.float32, fsms=[fsm])
    sid = eng.submit([2, 3, 4], fsm_id=0)
    out = eng.run()[sid]
    assert out[-1] == EOS
    text = "".join(toks[t] or "" for t in out[:-1])
    assert json.loads(text)["a"] in (0, 1, 10), text


def test_token_strings_from_hf():
    """Lift a real (in-memory) HF fast tokenizer: specials banned, byte
    fragments banned, normal tokens decode to their text; the result feeds
    fsm_from_regex directly."""
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    vocab = {"<pad>": 0, "<eos>": 1, "a": 2, "b": 3, "ab": 4, "1": 5,
             "23": 6, "-": 7, ".": 8}
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<pad>"))
    tok.pre_tokenizer = pre_tokenizers.WhitespaceSplit()
    hf = PreTrainedTokenizerFast(tokenizer_object=tok,
                                 pad_token="<pad>", eos_token="<eos>")
    from vyomai_tpu.generation import token_strings_from_hf
    strings = token_strings_from_hf(hf)
    assert strings[0] is None and strings[1] is None      # specials banned
    assert strings[2] == "a" and strings[4] == "ab" and strings[6] == "23"
    fsm = fsm_from_regex(r"-?\d+(\.\d+)?", strings, eos_token_id=1)
    s = 0
    for t in [7, 5, 8, 6]:          # "-1.23"
        s = fsm.advance(s, t)
    assert fsm.accepting[s]


def test_regex_lift_property_fuzz():
    """Property fuzz over random regexes x random toy vocabularies: every
    token path the lifted FSM accepts (bounded walk) decodes to a Python
    ``re.fullmatch`` of the pattern, and every FSM state can still reach
    acceptance (dead-end pruning invariant)."""
    rng = np.random.default_rng(0)
    ALPHA = "abc01"
    PIECES = ["a", "b", "c", "0", "1", "[ab]", "[^c]", r"\d", ".",
              "(ab|c)", "(a|b0)"]
    QUANTS = ["", "*", "+", "?", "{2}", "{1,3}"]
    checked = 0
    for trial in range(40):
        n = int(rng.integers(1, 5))
        pat = "".join(str(rng.choice(PIECES)) + str(rng.choice(QUANTS))
                      for _ in range(n))
        # random vocab: single chars + random 2-3 char fragments
        vocab = [None] + list(ALPHA)
        for _ in range(6):
            ln = int(rng.integers(2, 4))
            vocab.append("".join(rng.choice(list(ALPHA), size=ln)))
        eos = len(vocab)
        vocab.append("<eos>")
        try:
            fsm = fsm_from_regex(pat, vocab, eos)
        except ValueError:
            continue  # pattern unreachable in this alphabet: fine
        # bounded DFS over accepted paths
        seen, stack = [], [(0, "")]
        while stack and len(seen) < 500:
            s, text = stack.pop()
            if len(text) > 8:
                continue
            row = fsm.next_state[s]
            for tok in np.nonzero(row >= 0)[0]:
                if tok == eos:
                    seen.append(text)
                else:
                    stack.append((int(row[tok]), text + vocab[tok]))
        for text in seen:
            assert re.fullmatch(pat, text), (pat, text)
            checked += 1
        # pruning invariant: from EVERY state some path reaches acceptance
        n_states = fsm.num_states
        reach = set(np.nonzero(fsm.accepting)[0].tolist())
        changed = True
        while changed:
            changed = False
            for s in range(n_states):
                if s in reach:
                    continue
                nxt = set(fsm.next_state[s][fsm.next_state[s] >= 0].tolist())
                if nxt & reach:
                    reach.add(s)
                    changed = True
        assert reach == set(range(n_states)), pat
    assert checked > 200, f"fuzz too weak: only {checked} strings checked"


def test_regex_lift_prunes_token_level_dead_ends():
    """A char-reachable state with NO token continuation must be pruned
    (code-review r3): vocab has '34' but no lone '3'/'4', so '3' and
    '3+4' are char-expressible but token-impossible, while '34' works."""
    with pytest.raises(ValueError):
        fsm_from_regex("3", TOKEN_STRINGS, EOS)       # no token spells '3'
    with pytest.raises(ValueError):
        fsm_from_regex("3a", TOKEN_STRINGS, EOS)      # '34' overshoots
    fsm = fsm_from_regex("34", TOKEN_STRINGS, EOS)    # token 11 = '34'
    s = fsm.advance(0, 11)
    assert fsm.accepting[s]
    # partial dead branches pruned, live branch kept: 'a(34|q)' -> only 34
    fsm2 = fsm_from_regex("a(34|0x)", TOKEN_STRINGS, EOS)
    s2 = fsm2.advance(0, 1)                           # 'a'
    allowed = set(np.nonzero(fsm2.allowed(s2))[0])
    assert 11 in allowed and 8 not in allowed         # '0' leads nowhere
    # invariant: every state allows at least one token (or is accepting)
    for st in range(fsm2.num_states):
        assert fsm2.accepting[st] or (fsm2.next_state[st] >= 0).any()
