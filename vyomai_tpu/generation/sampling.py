"""Logits processors (reference ``VyomAI/logits_processors.py``).

Pure-JAX, jittable: ``__call__`` returns ``softmax(process(logits)/T)``;
``sample(probs, rng)`` draws a token. Greedy ignores the rng. The top-p
scatter-back uses ``argsort(sorted_indices)`` exactly as the reference does
(``logits_processors.py:80``) — static shapes, TPU-friendly sorts.
"""

import abc

import jax
import jax.numpy as jnp

_MASKED = -1e20  # reference's masked-logit fill value


class LogitsProcessor(abc.ABC):
    def __init__(self, temperature: float = 1.0):
        self.temperature = temperature

    def __call__(self, logits):
        proc = self._process(logits)
        return jax.nn.softmax(proc / self.temperature, axis=-1)

    @abc.abstractmethod
    def _process(self, logits):
        ...

    def sample(self, probs, rng=None):
        if rng is None:
            raise ValueError("sampling processors require an rng key")
        return jax.random.categorical(rng, jnp.log(probs + 1e-20), axis=-1)[..., None]


class GreedyProcessor(LogitsProcessor):
    """Most probable token."""

    def _process(self, logits):
        return logits

    def sample(self, probs, rng=None):
        return jnp.argmax(probs, axis=-1)[..., None]


class MultinomialProcessor(LogitsProcessor):
    """Random sampling from the full distribution."""

    def _process(self, logits):
        return logits


def _top_k_mask(logits, top_k: int):
    k = min(top_k, logits.shape[-1])
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, _MASKED, logits)


def _top_p_mask(logits, top_p: float):
    sorted_idx = jnp.argsort(-logits, axis=-1)
    sorted_logits = jnp.take_along_axis(logits, sorted_idx, axis=-1)
    cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    remove = cum > top_p
    # shift right so the first token above the threshold is kept
    remove = jnp.concatenate(
        [jnp.zeros_like(remove[..., :1]), remove[..., :-1]], axis=-1)
    sorted_logits = jnp.where(remove, _MASKED, sorted_logits)
    # scatter back to the original order
    inv = jnp.argsort(sorted_idx, axis=-1)
    return jnp.take_along_axis(sorted_logits, inv, axis=-1)


class TopKProcessor(MultinomialProcessor):
    def __init__(self, temperature: float, top_k: int):
        super().__init__(temperature)
        self.top_k = top_k

    def _process(self, logits):
        return _top_k_mask(logits, self.top_k)


class NucleusProcessor(MultinomialProcessor):
    def __init__(self, temperature: float, top_p: float):
        super().__init__(temperature)
        self.top_p = top_p

    def _process(self, logits):
        return _top_p_mask(logits, self.top_p)


class TopKNucleusProcessor(MultinomialProcessor):
    def __init__(self, temperature: float, top_k: int, top_p: float):
        super().__init__(temperature)
        self.top_k = top_k
        self.top_p = top_p

    def _process(self, logits):
        return _top_p_mask(_top_k_mask(logits, self.top_k), self.top_p)
