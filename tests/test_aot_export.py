"""AOT export (jax.export / StableHLO): serialize the whole jitted decode
program, reload it in-place, and get token-exact results without
re-tracing model code — the deployment-artifact story."""

import jax
import jax.numpy as jnp
import numpy as np

import vyomai_tpu as vt
from vyomai_tpu.generation import generate_hf
from vyomai_tpu.interop import aot

QCFG = vt.QwenConfig(vocab_size=256, hidden_size=64, intermediate_size=128,
                     num_hidden_layers=2, num_attention_heads=4,
                     num_key_value_heads=2, head_dim=16,
                     max_position_embeddings=64, qk_norm=False,
                     eos_token_id=9999)


def test_export_generate_roundtrip(tmp_path):
    model = vt.ModelForCausalLM(QCFG)
    params = model.init(jax.random.PRNGKey(0))
    ids = jnp.array([[3, 17, 42, 9], [5, 11, 8, 30]], dtype=jnp.int32)

    blob = aot.export_generate(model, params, batch_size=2, prompt_len=4,
                               max_new_tokens=6)
    path = tmp_path / "decode.stablehlo"
    path.write_bytes(blob)

    step = aot.load(path.read_bytes())
    got = step(params, ids)
    ref = generate_hf(model, params, ids, max_new_tokens=6)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_export_fn_shape_specs_only():
    """export_fn works from ShapeDtypeStructs — no real weights needed at
    export time."""
    def f(x, y):
        return x @ y + 1.0

    spec = jax.ShapeDtypeStruct((4, 8), jnp.float32)
    spec2 = jax.ShapeDtypeStruct((8, 2), jnp.float32)
    blob = aot.export_fn(f, spec, spec2)
    g = aot.load(blob)
    x = jnp.ones((4, 8)), jnp.ones((8, 2))
    np.testing.assert_allclose(np.asarray(g(*x)),
                               np.asarray(f(*x)), atol=1e-6)


def test_export_rejects_wrong_shape():
    model = vt.ModelForCausalLM(QCFG)
    params = model.init(jax.random.PRNGKey(0))
    blob = aot.export_generate(model, params, batch_size=1, prompt_len=4,
                               max_new_tokens=2)
    step = aot.load(blob)
    bad = jnp.zeros((2, 4), jnp.int32)      # batch 2 != exported 1
    try:
        step(params, bad)
        raised = False
    except ValueError:
        raised = True
    assert raised
