"""Native (C++) KV manager: build, bind, and behavioral equivalence with
the Python reference implementation."""

import random

import pytest

from vyomai_tpu.serving.kv_manager import PagedKVManager, SequenceState

native = pytest.importorskip("vyomai_tpu.serving.native")

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="g++ toolchain unavailable")


def test_native_basic():
    kv = native.NativeKVManager(8, 4)
    s = SequenceState(0, [1, 2, 3, 4, 5])
    assert kv.match_prefix(s) == 0
    assert kv.allocate(s, 5)
    assert len(s.block_table) == 2
    assert kv.num_free() == 6
    s.tokens += [6, 7, 8]
    kv.free(s)
    assert kv.num_free() == 8  # both full blocks cached + reclaimable


def test_native_prefix_match():
    kv = native.NativeKVManager(8, 4)
    s = SequenceState(0, list(range(9)))
    kv.match_prefix(s)
    kv.allocate(s, 9)
    kv.free(s)
    s2 = SequenceState(1, list(range(8)) + [99])
    assert kv.match_prefix(s2) == 8
    assert len(s2.block_table) == 2


def test_native_matches_python_on_random_workload():
    random.seed(7)
    for trial in range(10):
        py = PagedKVManager(16, 4)
        cc = native.NativeKVManager(16, 4)
        live = {}
        for step in range(150):
            op = random.random()
            if op < 0.4 and len(live) < 6:
                sid = trial * 1000 + step
                prompt = [random.randrange(5)
                          for _ in range(random.randrange(3, 14))]
                s1, s2 = SequenceState(sid, prompt), SequenceState(sid, prompt)
                assert py.match_prefix(s1) == cc.match_prefix(s2)
                ok1 = py.allocate(s1, len(prompt) + 1)
                ok2 = cc.allocate(s2, len(prompt) + 1)
                assert ok1 == ok2
                if ok1:
                    live[sid] = (s1, s2)
                else:
                    py.release_sequence(s1)
                    cc.release_sequence(s2)
            elif op < 0.8 and live:
                sid = random.choice(list(live))
                s1, s2 = live[sid]
                tok = random.randrange(5)
                s1.tokens.append(tok)
                s2.tokens.append(tok)
                ok1 = py.allocate(s1, len(s1.tokens))
                ok2 = cc.allocate(s2, len(s2.tokens))
                assert ok1 == ok2
                if not ok1:
                    py.free(s1)
                    cc.free(s2)
                    del live[sid]
            elif live:
                sid = random.choice(list(live))
                s1, s2 = live.pop(sid)
                py.free(s1)
                cc.free(s2)
            assert py.num_free() == cc.num_free(), (trial, step)
            if step % 25 == 0:     # peek + counters agree along the way
                probe = [random.randrange(5)
                         for _ in range(random.randrange(3, 14))]
                assert py.peek_prefix(probe) == cc.peek_prefix(probe)
                assert py.cache_stats() == cc.cache_stats(), (trial, step)
        for sid in list(live):
            s1, s2 = live.pop(sid)
            py.free(s1)
            cc.free(s2)
        assert py.num_free() == cc.num_free() == 16


def test_native_free_never_promotes_unwritten_final_token_block():
    """Mirror of the Python-manager regression: the final token of a
    finished sequence has no written KV, so a block-boundary finish must
    not promote its block into the radix cache."""
    kv = native.NativeKVManager(8, 4)
    s = SequenceState(0, list(range(8)))  # exactly 2 blocks
    kv.match_prefix(s)
    kv.allocate(s, 8)
    kv.free(s)
    probe = SequenceState(1, list(range(8)) + [99])
    assert kv.match_prefix(probe) == 4  # only the fully-written block


def test_native_peek_and_stats():
    """peek_prefix returns the match length WITHOUT acquiring refs (a
    subsequent real match still works, num_free is untouched), and
    kvm_stats mirrors the Python counters."""
    kv = native.NativeKVManager(8, 4)
    s = SequenceState(0, list(range(9)))
    kv.match_prefix(s)
    kv.allocate(s, 9)
    kv.free(s)
    free0 = kv.num_free()
    assert kv.peek_prefix(list(range(8)) + [99]) == 8
    assert kv.peek_prefix(list(range(8))) == 4   # whole-prompt cap
    assert kv.peek_prefix([77, 78, 79, 80]) == 0
    assert kv.num_free() == free0                # no side effects
    st = kv.cache_stats()
    assert st["radix_lookups"] == 1 and st["radix_hits"] == 0
    probe = SequenceState(1, list(range(8)) + [99])
    assert kv.match_prefix(probe) == 8           # peek didn't pin/corrupt
    st = kv.cache_stats()
    assert st["radix_hits"] == 1 and st["radix_hit_blocks"] == 2


def test_native_failed_allocate_preserves_radix_cache():
    kv = native.NativeKVManager(4, 4)
    s = SequenceState(0, list(range(9)))
    kv.match_prefix(s)
    kv.allocate(s, 9)
    kv.free(s)
    big = SequenceState(1, [50 + i for i in range(99)])
    assert not kv.allocate(big, 99)
    probe = SequenceState(2, list(range(8)) + [77])
    assert kv.match_prefix(probe) == 8
