"""Guided (constrained) decoding: finite-state machines over *token ids*.

Closes the last sliver of the reference's HF ``generate`` breadth
(``/root/reference/VyomAI/models/custom_transformer.py:606-747`` inherits
HF's constrained decoding) and provides the production-serving "structured
output" feature the TPU-native way: the constraint is compiled AHEAD OF
TIME into a dense ``[num_states, vocab]`` transition table, so applying it
inside a jitted decode loop is one gather + one mask per step — static
shapes, no host callbacks, no per-step Python.

Two builders:

- :func:`fsm_from_token_sequences` — a trie over explicitly allowed token
  sequences (HF ``force_words_ids``-style "output must be one of these").
- :func:`fsm_from_regex` — compiles a regex subset to a character DFA
  (Thompson NFA -> subset construction) and lifts it to the tokenizer's
  vocabulary by walking each token's string through the DFA from every
  state (the outlines/guided-generation algorithm): a token is allowed in
  state ``s`` iff its whole string survives, and its arrival state is the
  token-level transition. EOS is allowed exactly in accepting states.

The table is ``O(states * vocab)`` int32 — e.g. 64 states x 32k vocab is
8 MB; for very large grammars build per-request on host and stream.

Decode entry points:

- :func:`constrained_generate` — one jitted program (prefill + cached
  ``while_loop``), greedy or temperature/top-k/top-p sampling, per-lane
  FSM state threading; mirrors ``generate_hf``.
- the serving engine takes ``fsms=[TokenFSM, ...]`` and per-request
  ``fsm_id`` (``serving/engine.py``) — the mask rides the on-device
  horizon loop (``serving/paged_model.decode_horizon``).
"""

from functools import partial
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_MASKED = -1e30


class TokenFSM(NamedTuple):
    """A deterministic FSM over token ids. Start state is 0.

    next_state: [S, V] int32 — next state for (state, token); -1 where the
        token is disallowed. EOS rows self-loop in accepting states.
    accepting: [S] bool — states where the output so far is complete
        (EOS is allowed exactly here).
    """
    next_state: np.ndarray
    accepting: np.ndarray

    @property
    def num_states(self) -> int:
        return self.next_state.shape[0]

    @property
    def vocab_size(self) -> int:
        return self.next_state.shape[1]

    def allowed(self, state: int) -> np.ndarray:
        """Host-side: bool [V] of tokens allowed in ``state``."""
        return self.next_state[state] >= 0

    def advance(self, state: int, token: int) -> int:
        """Host-side single transition; raises on a disallowed token."""
        nxt = int(self.next_state[state, token])
        if nxt < 0:
            raise ValueError(f"token {token} not allowed in state {state}")
        return nxt


def fsm_from_token_sequences(sequences: Sequence[Sequence[int]],
                             vocab_size: int,
                             eos_token_id: int) -> TokenFSM:
    """Trie FSM: the generated output must be exactly one of ``sequences``
    (token-id lists), then EOS. Shared prefixes share states."""
    if not sequences:
        raise ValueError("need at least one allowed sequence")
    children: List[dict] = [{}]   # state -> {token: state}
    accepting = [False]
    for seq in sequences:
        if not len(seq):
            raise ValueError("empty sequence (would accept immediately "
                             "with no tokens — use plain EOS forcing)")
        s = 0
        for tok in seq:
            tok = int(tok)
            if not 0 <= tok < vocab_size:
                raise ValueError(f"token {tok} outside vocab {vocab_size}")
            if tok not in children[s]:
                children.append({})
                accepting.append(False)
                children[s][tok] = len(children) - 1
            s = children[s][tok]
        accepting[s] = True
    n = len(children)
    next_state = np.full((n, vocab_size), -1, dtype=np.int32)
    for s, kids in enumerate(children):
        for tok, nxt in kids.items():
            next_state[s, tok] = nxt
        # EOS self-loop marks "may stop here" — but never clobber a real
        # trie edge: if eos_token_id is also a valid CONTINUATION at this
        # accepting state (it appears mid-sequence), continuation wins
        # (code-review r3; the sequence would otherwise be ungeneratable)
        if accepting[s] and next_state[s, eos_token_id] < 0:
            next_state[s, eos_token_id] = s
    return TokenFSM(next_state, np.asarray(accepting, bool))


# ---------------------------------------------------------------------------
# Regex subset -> char DFA -> token FSM
#
# Supported syntax: literals, '.', escapes (\d \w \s \D \W \S and escaped
# punctuation), classes [a-z0-9] / negated [^...], groups (...), alternation
# '|', quantifiers * + ? {m} {m,} {m,n}. Anchored fullmatch semantics.
# ---------------------------------------------------------------------------

_DIGITS = frozenset("0123456789")
_WORD = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_")
_SPACE = frozenset(" \t\n\r\f\v")


class _Pred(NamedTuple):
    """Character predicate: c matches iff (c in chars) != negated."""
    chars: frozenset
    negated: bool

    def __call__(self, c: str) -> bool:
        return (c in self.chars) != self.negated


class _Nfa:
    def __init__(self):
        self.edges: List[Tuple[int, _Pred, int]] = []
        self.eps: List[Tuple[int, int]] = []
        self.n = 0

    def state(self) -> int:
        self.n += 1
        return self.n - 1


def _parse_regex(pattern: str):
    """Recursive-descent parse to an AST of
    ('pred', _Pred) | ('cat', [..]) | ('alt', [..]) |
    ('star'|'plus'|'opt', node) | ('rep', node, m, n|-1)."""
    pos = [0]

    def peek():
        return pattern[pos[0]] if pos[0] < len(pattern) else None

    def eat():
        c = pattern[pos[0]]
        pos[0] += 1
        return c

    def parse_escape():
        c = eat()
        table = {"d": _Pred(_DIGITS, False), "D": _Pred(_DIGITS, True),
                 "w": _Pred(_WORD, False), "W": _Pred(_WORD, True),
                 "s": _Pred(_SPACE, False), "S": _Pred(_SPACE, True),
                 "n": _Pred(frozenset("\n"), False),
                 "t": _Pred(frozenset("\t"), False),
                 "r": _Pred(frozenset("\r"), False)}
        if c in table:
            return table[c]
        return _Pred(frozenset(c), False)   # escaped literal

    def parse_class():
        negated = peek() == "^"
        if negated:
            eat()
        chars = set()
        while peek() is not None and peek() != "]":
            c = eat()
            if c == "\\":
                p = parse_escape()
                if p.negated:
                    raise ValueError("negated escape inside a class is "
                                     "unsupported")
                chars |= p.chars
                continue
            if peek() == "-" and pos[0] + 1 < len(pattern) \
                    and pattern[pos[0] + 1] != "]":
                eat()
                hi = eat()
                chars |= {chr(x) for x in range(ord(c), ord(hi) + 1)}
            else:
                chars.add(c)
        if peek() != "]":
            raise ValueError("unterminated character class")
        eat()
        return _Pred(frozenset(chars), negated)

    def parse_atom():
        c = peek()
        if c == "(":
            eat()
            node = parse_alt()
            if peek() != ")":
                raise ValueError("unbalanced parenthesis")
            eat()
            return node
        if c == "[":
            eat()
            return ("pred", parse_class())
        if c == ".":
            eat()
            return ("pred", _Pred(frozenset("\n"), True))
        if c == "\\":
            eat()
            return ("pred", parse_escape())
        if c in ")|*+?{":
            raise ValueError(f"unexpected '{c}' at {pos[0]}")
        eat()
        return ("pred", _Pred(frozenset(c), False))

    def parse_quant(node):
        while True:
            c = peek()
            if c == "*":
                eat()
                node = ("star", node)
            elif c == "+":
                eat()
                node = ("plus", node)
            elif c == "?":
                eat()
                node = ("opt", node)
            elif c == "{":
                eat()
                digits = ""
                while peek() is not None and peek().isdigit():
                    digits += eat()
                if not digits:
                    raise ValueError(
                        "'{' must start a {m}/{m,}/{m,n} quantifier "
                        "(escape a literal brace as \\{)")
                m = int(digits)
                if peek() == "}":
                    eat()
                    node = ("rep", node, m, m)
                elif peek() == ",":
                    eat()
                    digits = ""
                    while peek() is not None and peek().isdigit():
                        digits += eat()
                    if peek() != "}":
                        raise ValueError("unterminated {m,n}")
                    eat()
                    node = ("rep", node, m, int(digits) if digits else -1)
                else:
                    raise ValueError("unterminated {m}")
            else:
                return node

    def parse_cat():
        parts = []
        while peek() is not None and peek() not in ")|":
            parts.append(parse_quant(parse_atom()))
        if not parts:
            return ("cat", [])
        return parts[0] if len(parts) == 1 else ("cat", parts)

    def parse_alt():
        parts = [parse_cat()]
        while peek() == "|":
            eat()
            parts.append(parse_cat())
        return parts[0] if len(parts) == 1 else ("alt", parts)

    ast = parse_alt()
    if pos[0] != len(pattern):
        raise ValueError(f"trailing '{pattern[pos[0]:]}'")
    return ast


def _build_nfa(ast) -> Tuple[_Nfa, int, int]:
    """Thompson construction. Returns (nfa, start, accept)."""
    nfa = _Nfa()

    def build(node) -> Tuple[int, int]:
        kind = node[0]
        if kind == "pred":
            a, b = nfa.state(), nfa.state()
            nfa.edges.append((a, node[1], b))
            return a, b
        if kind == "cat":
            if not node[1]:
                a = nfa.state()
                return a, a
            s, e = build(node[1][0])
            for part in node[1][1:]:
                s2, e2 = build(part)
                nfa.eps.append((e, s2))
                e = e2
            return s, e
        if kind == "alt":
            a, b = nfa.state(), nfa.state()
            for part in node[1]:
                s, e = build(part)
                nfa.eps.append((a, s))
                nfa.eps.append((e, b))
            return a, b
        if kind in ("star", "plus", "opt"):
            s, e = build(node[1])
            a, b = nfa.state(), nfa.state()
            nfa.eps.append((a, s))
            nfa.eps.append((e, b))
            if kind != "plus":
                nfa.eps.append((a, b))
            if kind != "opt":
                nfa.eps.append((e, s))
            return a, b
        if kind == "rep":
            _, inner, m, n = node
            parts = [inner] * max(m, 1 if m == 0 else m)
            if m == 0:
                parts = []
            if n == -1:
                parts = parts + [("star", inner)]
            else:
                parts = parts + [("opt", inner)] * (n - m)
            if not parts:
                a = nfa.state()
                return a, a
            return build(("cat", parts) if len(parts) > 1 else parts[0])
        raise AssertionError(kind)

    start, accept = build(ast)
    return nfa, start, accept


def _char_dfa(pattern: str, alphabet: Sequence[str]):
    """Subset construction restricted to ``alphabet`` (the set of chars that
    actually occur in the vocabulary — the only ones a token can emit).
    Returns (trans: list of dict char->state, accepting: list of bool);
    state 0 is the start. Dead-end states (no path to accept) are pruned."""
    nfa, start, accept = _build_nfa(_parse_regex(pattern))
    eps_adj = [[] for _ in range(nfa.n)]
    for a, b in nfa.eps:
        eps_adj[a].append(b)

    def closure(states: frozenset) -> frozenset:
        stack, seen = list(states), set(states)
        while stack:
            s = stack.pop()
            for t in eps_adj[s]:
                if t not in seen:
                    seen.add(t)
                    stack.append(t)
        return frozenset(seen)

    start_set = closure(frozenset([start]))
    index = {start_set: 0}
    order = [start_set]
    trans: List[dict] = [{}]
    i = 0
    while i < len(order):
        cur = order[i]
        for ch in alphabet:
            moved = frozenset(b for a, pred, b in nfa.edges
                              if a in cur and pred(ch))
            if not moved:
                continue
            nxt = closure(moved)
            if nxt not in index:
                index[nxt] = len(order)
                order.append(nxt)
                trans.append({})
            trans[i][ch] = index[nxt]
        i += 1
    accepting = [accept in s for s in order]
    # prune states that cannot reach an accepting state (dead ends): a token
    # must never be allowed if taking it strands the generation
    n = len(order)
    live = set(s for s in range(n) if accepting[s])
    changed = True
    while changed:
        changed = False
        for s in range(n):
            if s not in live and any(t in live for t in trans[s].values()):
                live.add(s)
                changed = True
    if 0 not in live:
        raise ValueError("regex matches nothing expressible in this "
                         "vocabulary's alphabet")
    remap = {s: i for i, s in enumerate(sorted(live))}
    trans = [{c: remap[t] for c, t in trans[s].items() if t in live}
             for s in sorted(live)]
    accepting = [accepting[s] for s in sorted(live)]
    return trans, accepting


def fsm_from_regex(pattern: str, token_strings: Sequence[Optional[str]],
                   eos_token_id: int) -> TokenFSM:
    """Compile ``pattern`` (fullmatch semantics) against a tokenizer.

    token_strings: index = token id, value = the token's decoded string
    (``None`` or ``""`` for special/byte-fallback tokens you want banned —
    empty strings are always banned since they would allow free-spinning).
    The lift walks every (DFA state, token) pair through the char DFA
    (the outlines algorithm), so multi-character tokens may cross several
    char states in one step.
    """
    alphabet = sorted({c for t in token_strings if t for c in t})
    trans, accepting = _char_dfa(pattern, alphabet)
    n_states = len(trans)
    vocab = len(token_strings)
    next_state = np.full((n_states, vocab), -1, dtype=np.int32)
    for tok, text in enumerate(token_strings):
        if not text or tok == eos_token_id:
            continue
        for s in range(n_states):
            cur = s
            ok = True
            for ch in text:
                nxt = trans[cur].get(ch)
                if nxt is None:
                    ok = False
                    break
                cur = nxt
            if ok:
                next_state[s, tok] = cur
    # Prune TOKEN-level dead ends: the char DFA was pruned against the
    # alphabet, but a char-reachable state can still be a dead end after
    # the lift (no TOKEN spells any continuation — e.g. the only token
    # containing '3' is '34' but the grammar needs a lone '3'). Without
    # this, a guided lane can strand in a state where every token is
    # banned (engine crash / wraparound in the jitted loop).
    live = set(np.nonzero(accepting)[0].tolist()) if any(accepting) else set()
    changed = True
    while changed:
        changed = False
        for s in range(n_states):
            if s in live:
                continue
            row = next_state[s]
            if any(int(t) in live for t in row[row >= 0]):
                live.add(s)
                changed = True
    if 0 not in live:
        raise ValueError("regex matches nothing expressible with these "
                         "TOKENS (char-level reachable, but no token "
                         "sequence spells a complete match)")
    remap = {s: i for i, s in enumerate(sorted(live))}
    keep = sorted(live)
    pruned = np.full((len(keep), vocab), -1, dtype=np.int32)
    for new_s, old_s in enumerate(keep):
        for tok in np.nonzero(next_state[old_s] >= 0)[0]:
            dst = int(next_state[old_s, tok])
            if dst in live:
                pruned[new_s, tok] = remap[dst]
    accepting = [accepting[s] for s in keep]
    for s in range(len(keep)):
        if accepting[s]:
            pruned[s, eos_token_id] = s
    return TokenFSM(pruned, np.asarray(accepting, bool))


# ---------------------------------------------------------------------------
# JSON Schema -> regex -> token FSM (structured output)
#
# The production "structured output" feature (vLLM/outlines style): compile
# a JSON Schema to a regex over the COMPACT JSON rendering (no whitespace —
# keeps the DFA small and the output canonical), then lift it to the
# tokenizer with fsm_from_regex. Supported: type string/integer/number/
# boolean/null/object/array, enum, const, anyOf/oneOf, type lists,
# properties+required, items+minItems/maxItems, string pattern/minLength/
# maxLength, $ref into local $defs/definitions. Numeric minimum/maximum
# bounds are NOT enforced (not regular in decimal); recursive $refs and
# allOf are rejected.
# ---------------------------------------------------------------------------

_REGEX_META = set("\\()[]{}|*+?.^$-")

# JSON string body: unescaped chars, two-char escapes, \uXXXX
_STRING_CHAR = r'([^"\\]|\\["\\/bfnrt]|\\u[0-9a-fA-F]{4})'
_STRING_RE = '"' + _STRING_CHAR + '*"'
_INTEGER_RE = r"(-?(0|[1-9][0-9]*))"
_NUMBER_RE = r"(-?(0|[1-9][0-9]*)(\.[0-9]+)?([eE][+-]?[0-9]+)?)"

_MAX_OPTIONAL_PROPS = 8    # subset alternation cap: 2^8 = 256 bodies


def _regex_escape(text: str) -> str:
    return "".join("\\" + c if c in _REGEX_META else c for c in text)


def _json_literal_regex(value) -> str:
    import json
    return _regex_escape(json.dumps(value, separators=(",", ":"),
                                    ensure_ascii=False))


def json_schema_to_regex(schema: dict, *, _defs=None, _depth: int = 0,
                         _seen=None) -> str:
    """Compile a JSON Schema (dict) to a regex over its compact JSON
    rendering — ``json.dumps(x, separators=(',', ':'))`` of any instance
    matching the schema fullmatches the result, and every fullmatch parses
    as a schema-valid instance. See the section comment for the supported
    subset; numeric min/max bounds are ignored (not regular)."""
    if not isinstance(schema, dict):
        raise ValueError(f"unsupported schema node: {schema!r} "
                         "(boolean schemas are not supported)")
    if _depth > 64:
        raise ValueError("schema nesting too deep (>64)")
    if _defs is None:
        _defs = {**schema.get("$defs", {}), **schema.get("definitions", {})}
    if _seen is None:
        _seen = frozenset()
    kw = dict(_defs=_defs, _depth=_depth + 1, _seen=_seen)

    if "$ref" in schema:
        ref = schema["$ref"]
        for prefix in ("#/$defs/", "#/definitions/"):
            if ref.startswith(prefix):
                name = ref[len(prefix):]
                if name in _seen:
                    raise ValueError(f"recursive $ref {ref!r} (regular "
                                     "languages cannot express recursion)")
                if name not in _defs:
                    raise ValueError(f"unresolved $ref {ref!r}")
                return json_schema_to_regex(
                    _defs[name], _defs=_defs, _depth=_depth + 1,
                    _seen=_seen | {name})
        raise ValueError(f"only local #/$defs/ refs supported, got {ref!r}")
    if "const" in schema:
        return _json_literal_regex(schema["const"])
    if "enum" in schema:
        if not schema["enum"]:
            raise ValueError("empty enum matches nothing")
        return "(" + "|".join(_json_literal_regex(v)
                              for v in schema["enum"]) + ")"
    for key in ("anyOf", "oneOf"):
        if key in schema:
            return "(" + "|".join(json_schema_to_regex(s, **kw)
                                  for s in schema[key]) + ")"
    if "allOf" in schema:
        raise ValueError("allOf is not supported (regex intersection)")

    typ = schema.get("type")
    if isinstance(typ, list):
        return "(" + "|".join(
            json_schema_to_regex({**schema, "type": t}, **kw)
            for t in typ) + ")"
    if typ == "null":
        return "null"
    if typ == "boolean":
        return "(true|false)"
    if typ == "integer":
        return _INTEGER_RE
    if typ == "number":
        return _NUMBER_RE
    if typ == "string":
        if "pattern" in schema:
            pat = schema["pattern"]
            pat = pat[1:] if pat.startswith("^") else pat
            pat = pat[:-1] if pat.endswith("$") else pat
            return '"' + pat + '"'
        lo = schema.get("minLength", 0)
        hi = schema.get("maxLength")
        if lo or hi is not None:
            rep = f"{{{lo},{hi}}}" if hi is not None else f"{{{lo},}}"
            return '"' + _STRING_CHAR + rep + '"'
        return _STRING_RE
    if typ == "object":
        props = schema.get("properties", {})
        required = schema.get("required", [])
        unknown = set(required) - set(props)
        if unknown:
            raise ValueError(f"required names missing from properties: "
                             f"{sorted(unknown)}")
        names = list(props)    # declaration order is emission order
        optional = [n for n in names if n not in set(required)]
        if len(optional) > _MAX_OPTIONAL_PROPS:
            raise ValueError(
                f"{len(optional)} optional properties exceeds the "
                f"{_MAX_OPTIONAL_PROPS} cap (subset alternation is "
                "exponential); mark more properties required")
        member = {n: _json_literal_regex(n) + ":"
                  + json_schema_to_regex(props[n], **kw) for n in names}
        bodies = []
        for bits in range(1 << len(optional)):
            drop = {n for i, n in enumerate(optional) if not bits >> i & 1}
            bodies.append(",".join(member[n] for n in names
                                   if n not in drop))
        bodies = sorted(set(bodies), key=len)
        return r"\{(" + "|".join(bodies) + r")\}"
    if typ == "array":
        if "items" not in schema:
            raise ValueError("array schemas need 'items' (any-type arrays "
                             "are not regular over an open vocabulary)")
        item = json_schema_to_regex(schema["items"], **kw)
        lo = schema.get("minItems", 0)
        hi = schema.get("maxItems")
        if hi is not None and hi < lo:
            raise ValueError(f"maxItems {hi} < minItems {lo}")
        if hi == 0:
            return r"\[\]"
        more = "(," + item + ")"
        if hi is None:
            tail = more + "*" if lo <= 1 else more + f"{{{lo - 1},}}"
        else:
            tail = more + f"{{{max(lo - 1, 0)},{hi - 1}}}"
        body = item + tail
        if lo == 0:
            body = "(" + body + ")?"
        return r"\[" + body + r"\]"
    raise ValueError(f"unsupported schema: {schema!r} (no type/enum/const/"
                     "anyOf)")


def token_strings_from_hf(tokenizer, vocab_size: Optional[int] = None):
    """Per-token decoded strings for :func:`fsm_from_regex` /
    :func:`fsm_from_json_schema` from a HuggingFace tokenizer.

    Each id maps to its standalone text: SentencePiece pieces keep their
    leading-space marker (U+2581 -> ' '; ``decode([id])`` would strip it),
    byte pieces become their byte, everything else is decoded alone (the
    byte-level-BPE-safe way). Banned (``None``): special tokens, empty decodes,
    and tokens containing U+FFFD — a lone continuation byte of a multi-byte
    UTF-8 character cannot participate in a character-level DFA walk (the
    grammar operates on text, not bytes; multi-byte characters still work
    through tokens that carry the whole character)."""
    n = vocab_size if vocab_size is not None else len(tokenizer)
    special = set(getattr(tokenizer, "all_special_ids", ()) or ())
    # SentencePiece tokenizers (Gemma/Llama) mark a leading space with
    # U+2581 which decode([id]) STRIPS when the id is decoded alone — the
    # character-level DFA would then disagree with real detokenized text
    # (outlines applies the same restoration). Prefer the raw token piece
    # and restore the marker; byte pieces like <0x0A> become their byte.
    pieces = None
    if hasattr(tokenizer, "convert_ids_to_tokens"):
        try:
            pieces = tokenizer.convert_ids_to_tokens(list(range(n)))
        except Exception:
            pieces = None
    out: List[Optional[str]] = []
    for i in range(n):
        if i in special:
            out.append(None)
            continue
        text = None
        piece = pieces[i] if pieces is not None else None
        if isinstance(piece, str) and "▁" in piece:
            text = piece.replace("▁", " ")
        elif isinstance(piece, str) and len(piece) == 6 and \
                piece.startswith("<0x") and piece.endswith(">"):
            b = int(piece[3:5], 16)
            text = chr(b) if b < 0x80 else None  # lone UTF-8 cont. byte
        else:
            text = tokenizer.decode([i], skip_special_tokens=False,
                                    clean_up_tokenization_spaces=False)
        out.append(text if text and "�" not in text else None)
    return out


def fsm_from_json_schema(schema: dict,
                         token_strings: Sequence[Optional[str]],
                         eos_token_id: int) -> TokenFSM:
    """Structured output: a :class:`TokenFSM` whose every accepted token
    path decodes to compact JSON valid under ``schema`` (see
    :func:`json_schema_to_regex` for the supported subset). Use with
    :func:`constrained_generate` or the serving engine's ``fsms=``."""
    return fsm_from_regex(json_schema_to_regex(schema), token_strings,
                          eos_token_id)


# ---------------------------------------------------------------------------
# Jitted constrained decode loop
# ---------------------------------------------------------------------------

def apply_fsm_mask(logits, next_row):
    """Mask ``logits`` [B, V] to the tokens allowed by ``next_row`` [B, V]
    (a gathered ``next_state`` row; >= 0 means allowed)."""
    return jnp.where(next_row >= 0, logits, _MASKED)


@partial(jax.jit, static_argnums=(0, 3, 4, 6, 7, 8, 9, 11))
def _constrained_generate(model, params, idx, max_new_tokens: int,
                          do_sample: bool, rng, temperature: float,
                          top_k: int, top_p: float, eos_id: int,
                          next_state, pad_token_id: int):
    from .sampling import _top_k_mask, _top_p_mask
    bsz, prompt_len = idx.shape
    total_len = prompt_len + max_new_tokens
    tokens = jnp.full((bsz, total_len), pad_token_id, dtype=jnp.int32)
    tokens = tokens.at[:, :prompt_len].set(idx)
    param_dtype = jax.tree_util.tree_leaves(params)[0].dtype
    cache = model.init_cache(batch_size=bsz, max_len=total_len,
                             dtype=param_dtype)
    out = model.apply(params, idx, cache=cache, start_pos=0)

    def pick(logits, fsm_state, r):
        logits = apply_fsm_mask(logits.astype(jnp.float32),
                                next_state[fsm_state])
        if not do_sample:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        logits = logits / jnp.maximum(temperature, 1e-6)
        if top_k:
            logits = _top_k_mask(logits, top_k)
        if top_p < 1.0:
            logits = _top_p_mask(logits, top_p)
        return jax.random.categorical(r, logits, axis=-1).astype(jnp.int32)

    def emit(toks, alive, fsm_state, logits, cur_len, r):
        nxt = pick(logits, fsm_state, r)
        fsm_state = jnp.where(
            alive, next_state[fsm_state, nxt], fsm_state)
        nxt = jnp.where(alive, nxt, pad_token_id)
        toks = jax.lax.dynamic_update_slice(toks, nxt[:, None], (0, cur_len))
        alive = alive & (nxt != eos_id)
        return toks, alive, fsm_state

    rng, r0 = jax.random.split(rng)
    state0 = jnp.zeros((bsz,), jnp.int32)
    tokens, alive, fsm_state = emit(
        tokens, jnp.ones((bsz,), bool), state0, out.logits[:, -1],
        jnp.asarray(prompt_len, jnp.int32), r0)

    def cond(carry):
        _, _, alive, _, _, i = carry
        return (i < max_new_tokens - 1) & jnp.any(alive)

    def body(carry):
        toks, cch, alive, fsm_state, rr, i = carry
        pos = prompt_len + i
        cur = jax.lax.dynamic_slice(toks, (0, pos), (bsz, 1))
        out = model.apply(params, cur, cache=cch, start_pos=pos)
        rr, r2 = jax.random.split(rr)
        toks, alive, fsm_state = emit(toks, alive, fsm_state,
                                      out.logits[:, -1], pos + 1, r2)
        return (toks, out.kv_cache, alive, fsm_state, rr, i + 1)

    tokens, _, _, fsm_state, _, _ = jax.lax.while_loop(
        cond, body, (tokens, out.kv_cache, alive, fsm_state, rng,
                     jnp.int32(0)))
    return tokens, fsm_state


def constrained_generate(model, params, input_ids, fsm: TokenFSM, *,
                         max_new_tokens: int = 32, do_sample: bool = False,
                         temperature: float = 1.0, top_k: int = 0,
                         top_p: float = 1.0, eos_token_id=None,
                         pad_token_id: int = 0, rng=None):
    """Generate under a :class:`TokenFSM` constraint — ONE jitted program
    (prefill + cached ``while_loop``), greedy or sampled. Every emitted
    token is allowed by the FSM from its current state; EOS is reachable
    only in accepting states, so a finished lane's output is a complete
    match. Returns ``(tokens [B, prompt+max_new], final_states [B])`` —
    check ``fsm.accepting[final_states]`` to see which lanes completed
    (a lane that hits ``max_new_tokens`` mid-grammar is incomplete).
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    from .sampling import normalize_eos
    eos_token_id, _ = normalize_eos(
        eos_token_id if eos_token_id is not None
        else getattr(model.config, "eos_token_id", None))
    if eos_token_id is None:
        raise ValueError("constrained decoding needs eos_token_id (EOS is "
                         "how a completed grammar terminates)")
    cfg = model.config
    vocab = (cfg.vocab_size if hasattr(cfg, "vocab_size")
             else cfg.text_config.vocab_size)   # VLM-style nested config
    if fsm.vocab_size != vocab:
        raise ValueError(f"FSM vocab {fsm.vocab_size} != model vocab {vocab}")
    if int(max_new_tokens) < 1:
        # the jitted loop's first emit would clobber the last prompt token
        # (dynamic_update_slice clamps the out-of-bounds start)
        ids = jnp.asarray(input_ids, jnp.int32)
        return ids, jnp.zeros((ids.shape[0],), jnp.int32)
    toks, states = _constrained_generate(
        model, params, jnp.asarray(input_ids, jnp.int32),
        int(max_new_tokens), bool(do_sample), rng, float(temperature),
        int(top_k), float(top_p), int(eos_token_id),
        jnp.asarray(fsm.next_state), int(pad_token_id))
    return toks, states
