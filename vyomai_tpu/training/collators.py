"""Pretraining collators (reference ``VyomAI/pretraining/collators.py``),
rebuilt as pure-JAX RNG-keyed functions so they can run inside jitted input
pipelines or on host numpy equally.

- ``masked_language_modeling`` — 15% Bernoulli selection excluding special
  tokens; 80/10/10 mask/random/keep; labels ``ignore_index`` elsewhere
  (reference ``collators.py:9-62``).
- ``electra_inputs`` — gumbel-sample generator logits at masked positions to
  build discriminator inputs + replaced/original labels
  (reference ``collators.py:65-105``).
- ``sft_collate`` / ``dpo_collate`` — host-side padding collators for the
  SFT/DPO recipes (N5/N6).
"""

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def masked_language_modeling(rng, input_ids, special_tokens_mask,
                             mask_token_id: int, vocab_size: int,
                             fraction: float = 0.15,
                             ignore_index: int = -100):
    """Returns (masked_input_ids, labels, masked_indices)."""
    r_sel, r_repl, r_rand, r_words = jax.random.split(rng, 4)
    prob = jnp.where(special_tokens_mask, 0.0, fraction)
    masked = jax.random.bernoulli(r_sel, prob)
    labels = jnp.where(masked, input_ids, ignore_index)

    replace = jax.random.bernoulli(r_repl, 0.8, input_ids.shape) & masked
    out = jnp.where(replace, mask_token_id, input_ids)

    random_sel = jax.random.bernoulli(r_rand, 0.5, input_ids.shape) \
        & masked & ~replace
    random_words = jax.random.randint(r_words, input_ids.shape, 0, vocab_size)
    out = jnp.where(random_sel, random_words, out)
    # remaining ~10%: keep original
    return out, labels, masked


def gumbel_sample(rng, logits, temperature: float = 1.0):
    """argmax(logits/T + Gumbel noise) (reference ``sample``/``noise``)."""
    g = jax.random.gumbel(rng, logits.shape)
    return jnp.argmax(logits / temperature + g, axis=-1)


def electra_inputs(rng, gen_logits, input_ids, masked_indices,
                   pad_token_id: int, temperature: float = 3.0):
    """Build discriminator inputs from generator logits.

    Returns (discriminator_input, disc_labels, non_pad_mask)."""
    sampled = gumbel_sample(rng, gen_logits, temperature)
    disc_input = jnp.where(masked_indices, sampled, input_ids)
    disc_labels = (input_ids != disc_input).astype(jnp.float32)
    non_pad = (input_ids != pad_token_id)
    return disc_input, disc_labels, non_pad


# ---------------------------------------------------------------------------
# Host-side collators (numpy) for SFT / DPO / LM block datasets
# ---------------------------------------------------------------------------

def sft_collate(sequences: Sequence[Sequence[int]], pad_token_id: int,
                ignore_index: int = -100):
    """Dynamic right-padding to ``max(len) + 1`` (reference nb
    ``sft_collate``, vyom-ai-llm-sft-dpo-training.ipynb).

    Reference quirk preserved EXACTLY: a row with a single pad (the
    batch-longest sequences) keeps that pad as its EOS label, while rows
    with more than one pad get ALL their pads ignored — the notebook's
    ``targets[indices] = ignore_index`` fires on every pad position, not
    "all but the first" as its comment claims. The attention mask covers
    only real tokens (the EOS-label pad is masked out as input)."""
    max_len = max(len(s) for s in sequences) + 1
    batch = np.full((len(sequences), max_len), pad_token_id, dtype=np.int64)
    labels = np.full((len(sequences), max_len), pad_token_id, dtype=np.int64)
    mask = np.zeros((len(sequences), max_len), dtype=np.int64)
    for i, s in enumerate(sequences):
        batch[i, :len(s)] = s
        labels[i, :len(s)] = s
        mask[i, :len(s)] = 1
        if max_len - len(s) > 1:           # >1 pads: every pad is ignored
            labels[i, len(s):] = ignore_index
    return batch, labels, mask


def dpo_collate(prompts: Sequence[Sequence[int]],
                chosen: Sequence[Sequence[int]],
                rejected: Sequence[Sequence[int]], pad_token_id: int):
    """Common-length padding + prompt-token masking. Returns dict of
    (chosen_ids, rejected_ids, chosen_mask, rejected_mask) where masks are 1
    only over answer tokens (reference nb ``dpo_collate``)."""
    n = len(prompts)
    full_c = [list(p) + list(c) for p, c in zip(prompts, chosen)]
    full_r = [list(p) + list(r) for p, r in zip(prompts, rejected)]
    max_len = max(max(len(s) for s in full_c), max(len(s) for s in full_r))
    out = {}
    for name, seqs in (("chosen", full_c), ("rejected", full_r)):
        ids = np.full((n, max_len), pad_token_id, dtype=np.int64)
        mask = np.zeros((n, max_len), dtype=np.int64)
        for i, s in enumerate(seqs):
            ids[i, :len(s)] = s
            mask[i, len(prompts[i]):len(s)] = 1
        out[f"{name}_ids"] = ids
        out[f"{name}_mask"] = mask
    return out


def lm_blocks(token_ids: Sequence[int], block_size: int) -> np.ndarray:
    """Fixed-size LM blocks (reference ``LanguageModeling`` dataset core)."""
    blocks = [token_ids[i:i + block_size]
              for i in range(0, len(token_ids) - block_size + 1, block_size)]
    return np.asarray(blocks, dtype=np.int64)


class LanguageModeling:
    """Fixed-block LM dataset from a text file with an .npz feature cache
    (reference ``pretraining/collators.py:108-165`` ``LanguageModeling``).

    ``tokenize``: callable text -> list[int];
    ``add_special_tokens``: optional callable block -> block."""

    def __init__(self, tokenize, file_path: str, block_size: int,
                 add_special_tokens=None, num_special_tokens: int = 0,
                 cache_dir: Optional[str] = None):
        import os
        if not os.path.isfile(file_path):
            raise ValueError(f"Input file path {file_path} not found")
        block_size = block_size - num_special_tokens
        directory, filename = os.path.split(file_path)
        # the cache key must cover the tokenization scheme, not just the
        # block size — a stale cache built with a different tokenizer would
        # otherwise be silently reused (wrong token ids, no error)
        import hashlib
        tok_id = hashlib.sha1("|".join((
            getattr(tokenize, "__qualname__", repr(type(tokenize))),
            getattr(add_special_tokens, "__qualname__",
                    repr(add_special_tokens)),
            str(num_special_tokens))).encode()).hexdigest()[:8]
        cached = os.path.join(cache_dir or directory,
                              f"cached_lm_{block_size}_{tok_id}_{filename}"
                              ".npz")
        if os.path.exists(cached):
            self.examples = list(np.load(cached)["examples"])
        else:
            with open(file_path, encoding="utf-8") as f:
                text = f.read()
            ids = tokenize(text)
            self.examples = []
            for i in range(0, len(ids) - block_size + 1, block_size):
                block = ids[i:i + block_size]
                if add_special_tokens is not None:
                    block = add_special_tokens(block)
                self.examples.append(np.asarray(block, dtype=np.int64))
            if self.examples:
                np.savez(cached, examples=np.stack(self.examples))

    def __len__(self):
        return len(self.examples)

    def __getitem__(self, i):
        return {"input_ids": self.examples[i]}
