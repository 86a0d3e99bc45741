"""Sequence packing for training — fill fixed-length rows with multiple
examples instead of padding each example to ``seq_len``.

The reference pads every SFT/CLM batch row to the longest example
(``sft_collate``, ``vyom-ai-llm-sft-dpo-training.ipynb`` cell 14; the MLM /
CLM collators in ``pretraining/collators.py``), so short examples waste
most of their row as pad FLOPs. Packing removes that waste; with typical
instruction data (mean length << seq_len) the tokens-per-step gain is the
inverse of the padding fraction (often 2-4x).

TPU-first design: rows are STATIC ``[N, seq_len]`` arrays; per-token
``segment_ids`` (1-based, 0 = pad) and ``positions`` (restart at 0 per
segment) make the packed batch semantically identical to the unpacked
one — attention is blocked across segments (in-kernel on the Pallas flash
path via integer segment-id equality, O(L) operand cost; see
``ops.flash_attention``) and RoPE/absolute positions restart per segment.
``labels`` come NEXT-TOKEN-ALIGNED (label[t] = ids[t+1] within the same
segment, else -100): train with ``cross_entropy(logits, labels)`` — no
shift — so the shift never crosses a segment boundary.

Model entry: ``DecoderModel.apply(params, ids, segment_ids=..,
positions=..)``.
"""

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["pack_sequences", "pack_sft", "packing_efficiency"]

IGNORE = -100


def _pack_rows(items: Sequence[Tuple[List[int], List[bool]]],
               seq_len: int) -> List[List[Tuple[List[int], List[bool]]]]:
    """Greedy first-fit packing of (ids, loss_mask) items into rows of
    capacity ``seq_len``. Preserves item order within a row; first-fit
    over open rows keeps fragmentation low without a global sort (data
    order / shuffling is the caller's concern)."""
    rows: List[List[Tuple[List[int], List[bool]]]] = []
    space: List[int] = []                      # free tokens per open row
    for ids, lm in items:
        if len(ids) > seq_len:                 # truncate oversized examples
            ids, lm = ids[:seq_len], lm[:seq_len]
        placed = False
        for r, free in enumerate(space):
            if free >= len(ids):
                rows[r].append((ids, lm))
                space[r] -= len(ids)
                placed = True
                break
        if not placed:
            rows.append([(ids, lm)])
            space.append(seq_len - len(ids))
    return rows


def _emit(rows, seq_len: int, pad_id: int) -> Dict[str, np.ndarray]:
    n = len(rows)
    ids = np.full((n, seq_len), pad_id, dtype=np.int32)
    seg = np.zeros((n, seq_len), dtype=np.int32)
    pos = np.zeros((n, seq_len), dtype=np.int32)
    labels = np.full((n, seq_len), IGNORE, dtype=np.int32)
    for r, row in enumerate(rows):
        t = 0
        for s, (toks, lm) in enumerate(row, start=1):
            ln = len(toks)
            ids[r, t:t + ln] = toks
            seg[r, t:t + ln] = s
            pos[r, t:t + ln] = np.arange(ln)
            # next-token-aligned labels, never crossing the segment end
            for i in range(ln - 1):
                if lm[i + 1]:                  # loss on predicting tok i+1
                    labels[r, t + i] = toks[i + 1]
            t += ln
    return {"ids": ids, "segment_ids": seg, "positions": pos,
            "labels": labels}


def pack_sequences(seqs: Sequence[Sequence[int]], seq_len: int, *,
                   pad_id: int = 0) -> Dict[str, np.ndarray]:
    """Pack full training sequences (loss on every next-token position).

    Returns ``{"ids", "segment_ids", "positions", "labels"}`` — all
    ``[N, seq_len]`` int32 (N = number of packed rows). Examples longer
    than ``seq_len`` are truncated.
    """
    items = [(list(map(int, s)), [True] * len(s)) for s in seqs]
    return _emit(_pack_rows(items, seq_len), seq_len, pad_id)


def pack_sft(pairs: Sequence[Tuple[Sequence[int], Sequence[int]]],
             seq_len: int, *, pad_id: int = 0,
             eos_id: Optional[int] = None) -> Dict[str, np.ndarray]:
    """Pack (prompt_ids, answer_ids) SFT pairs: loss only on answer tokens
    (plus the EOS appended when ``eos_id`` is given) — the packed
    equivalent of the reference's ``sft_collate`` label masking
    (prompt/pad positions -100, first EOS kept as a label)."""
    items = []
    for prompt, answer in pairs:
        toks = list(map(int, prompt)) + list(map(int, answer))
        lm = [False] * len(prompt) + [True] * len(answer)
        if eos_id is not None:
            toks.append(int(eos_id))
            lm.append(True)
        items.append((toks, lm))
    return _emit(_pack_rows(items, seq_len), seq_len, pad_id)


def packing_efficiency(batch: Dict[str, np.ndarray]) -> float:
    """Fraction of row slots holding real tokens (1.0 = zero waste)."""
    seg = batch["segment_ids"]
    return float((seg > 0).sum()) / seg.size
