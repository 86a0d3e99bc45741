"""Model output containers (NamedTuples — automatic pytrees).

Mirror the reference's output dataclasses: ``EncoderOutput(logits)``
(``models/encoder.py:19-21``), ``MLMOutput`` (``encoder.py:24-27``),
``CLMOutput`` (``models/decoder.py:29-41``), ``Seq2SeqOutput``
(``models/encoder_decoder.py:27-30``), ``DecoderOutput``
(``models/multimodel.py:21-23``).
"""

from typing import Any, NamedTuple, Optional

import jax.numpy as jnp


class EncoderOutput(NamedTuple):
    logits: jnp.ndarray


class MLMOutput(NamedTuple):
    hidden_state: jnp.ndarray
    logits: jnp.ndarray


class CLMOutput(NamedTuple):
    hidden_state: jnp.ndarray
    logits: jnp.ndarray
    kv_cache: Optional[Any] = None
    # mean router load-balancing loss over MoE layers (None for dense
    # models); add config.router_aux_loss_coef * aux_loss to the objective
    aux_loss: Optional[jnp.ndarray] = None


class Seq2SeqOutput(NamedTuple):
    logits: jnp.ndarray
    key_value_states: jnp.ndarray


class DecoderOutput(NamedTuple):
    logits: jnp.ndarray
