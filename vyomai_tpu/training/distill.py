"""Knowledge-distillation init: build a student by copying alternating
teacher layers (reference ``Knowledge_distilation.ipynb`` cells 2-13, which
copy roberta layers [0, 2, 4, 7, 9, 11] into a 6-layer student).

With stacked-layer params this is a single gather along the layer axis.
"""

from typing import Sequence

import jax
import jax.numpy as jnp


def select_layers(params, layer_indices: Sequence[int]):
    """Return params whose stacked ``layers`` subtree keeps only
    ``layer_indices`` (teacher -> student layer surgery)."""
    idx = jnp.asarray(list(layer_indices))

    def gather(x):
        return jnp.take(x, idx, axis=0)

    out = dict(params)
    out["layers"] = jax.tree_util.tree_map(gather, params["layers"])
    return out


def default_student_indices(num_teacher_layers: int,
                            num_student_layers: int) -> list:
    """Evenly spaced alternating selection; for 12 -> 6 gives
    [0, 2, 4, 7, 9, 11] (the reference's choice)."""
    if (num_teacher_layers, num_student_layers) == (12, 6):
        return [0, 2, 4, 7, 9, 11]
    step = num_teacher_layers / num_student_layers
    return sorted({min(int(round(i * step)), num_teacher_layers - 1)
                   for i in range(num_student_layers)})
