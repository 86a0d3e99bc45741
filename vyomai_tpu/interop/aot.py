"""Ahead-of-time export of jitted programs (``jax.export`` / StableHLO).

Deployment story for the serving side of the framework (the role of
``torch.export`` / TF SavedModel): trace + lower a decode program ONCE,
serialize the portable artifact, and run it later — in a process that
never traces Python model code — via :func:`load`. Artifacts embed the
full XLA program (while_loop decode included) plus the input tree
structure, so ``load(blob)(params, ids)`` is the whole API.

    blob = aot.export_generate(model, params, batch_size=2, prompt_len=8,
                               max_new_tokens=32)
    open("decode.stablehlo", "wb").write(blob)
    # ... later / elsewhere ...
    step = aot.load(open("decode.stablehlo", "rb").read())
    tokens = step(params, ids)

Platform portability follows ``jax.export`` semantics: by default the
artifact targets the platform it was lowered for; pass
``platforms=("tpu", "cpu")`` to emit a multi-platform artifact.
"""

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import export as _jexport

__all__ = ["export_fn", "export_generate", "load"]


def _shapes_of(tree):
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype
                                       if not hasattr(x, "dtype") else x.dtype),
        tree)


def export_fn(fn, *example_args,
              platforms: Optional[Sequence[str]] = None) -> bytes:
    """Serialize ``jit(fn)`` lowered for ``example_args``' shapes/dtypes.

    ``example_args`` may be real arrays or ``ShapeDtypeStruct`` trees —
    only shapes and dtypes are read; no computation runs."""
    exp = _jexport.export(jax.jit(fn),
                          platforms=tuple(platforms) if platforms else None)(
        *jax.tree_util.tree_map(
            lambda x: x if isinstance(x, jax.ShapeDtypeStruct)
            else jax.ShapeDtypeStruct(jnp.shape(x), x.dtype),
            example_args))
    return exp.serialize()


def export_generate(model, params, *, batch_size: int, prompt_len: int,
                    max_new_tokens: int,
                    platforms: Optional[Sequence[str]] = None,
                    **generate_kw) -> bytes:
    """Export the full cached greedy/sampling decode program
    (``generation.generate_hf``) for a fixed ``[batch_size, prompt_len]``
    prompt shape. The artifact's calling convention is
    ``(params, input_ids[int32 B x P]) -> tokens[B x (P + new)]``."""
    from ..generation import generate_hf

    def fn(p, ids):
        return generate_hf(model, p, ids, max_new_tokens=max_new_tokens,
                           **generate_kw)

    ids_spec = jax.ShapeDtypeStruct((batch_size, prompt_len), jnp.int32)
    exp = _jexport.export(jax.jit(fn),
                          platforms=tuple(platforms) if platforms else None)(
        _shapes_of(params), ids_spec)
    return exp.serialize()


def load(blob: bytes):
    """Deserialize an artifact; returns a callable running the compiled
    program (``jax.export.Exported.call``)."""
    return _jexport.deserialize(blob).call
