"""ViT + VisionLanguageModel tests (patterns from reference
``tests/test_vision_encoder.py`` and ``tests/test_multimodel.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vyomai_tpu as vt
from vyomai_tpu import generate_multimodel

VCFG = vt.VisionConfig(hidden_size=64, num_attention_heads=4,
                       num_hidden_layers=2, intermediate_size=256,
                       image_size=(32, 32), patch_size=(8, 8),
                       hidden_dropout_prob=0.0)
TCFG = vt.EncoderConfig(hidden_size=64, num_attention_heads=4,
                        num_key_value_heads=2, num_hidden_layers=2,
                        vocab_size=128, max_position_embeddings=64,
                        intermediate_size=256, hidden_dropout_prob=0.0)


@pytest.fixture(scope="module")
def images():
    return jax.random.normal(jax.random.PRNGKey(0), (2, 3, 32, 32))


def test_vit_shapes(images):
    vit = vt.Vit(VCFG)
    params = vit.init(jax.random.PRNGKey(1))
    out = vit.apply(params, images)
    # 32/8 * 32/8 = 16 patches + CLS
    assert out.logits.shape == (2, 17, 64)
    assert jnp.all(jnp.isfinite(out.logits))


def test_vit_patchify_matches_manual(images):
    """Conv patchify == unfold + matmul."""
    vit = vt.Vit(VCFG)
    params = vit.init(jax.random.PRNGKey(1))
    patches = vit.patchify(params, images)
    # manual: extract 8x8 patches, flatten, project
    img = np.asarray(images)
    k = np.asarray(params["pixel_seq"]["kernel"])  # [D, C, 8, 8]
    b = np.asarray(params["pixel_seq"]["bias"])
    out = np.zeros((2, 16, 64), dtype=np.float32)
    idx = 0
    for i in range(4):
        for j in range(4):
            patch = img[:, :, i * 8:(i + 1) * 8, j * 8:(j + 1) * 8]
            out[:, i * 4 + j] = np.einsum("bchw,dchw->bd", patch, k) + b
    # TPU MXU default-precision conv vs fp64 numpy einsum: ~1e-3 tolerance
    np.testing.assert_allclose(np.asarray(patches), out, atol=1e-2)


@pytest.mark.parametrize("pe,at", [("absolute", None), ("rope", "gqa")])
def test_vlm_shapes(pe, at, images):
    vit = vt.Vit(VCFG)
    vlm = vt.VisionLanguageModel(TCFG, vit, pos_embedding_type=pe,
                                 attention_type=at)
    params = vlm.init(jax.random.PRNGKey(2))
    dec = jnp.ones((2, 17), dtype=jnp.int32)
    out = vlm.apply(params, pixel_values=images, decoder_input_ids=dec,
                    decoder_attention_mask=jnp.ones_like(dec))
    # 17 text + 1 image CLS = 18 fused positions
    assert out.logits.shape == (2, 18, 128)


@pytest.mark.parametrize("pe,at", [("absolute", None), ("rope", None),
                                   ("absolute", "gqa")])
def test_vlm_generate_cache_parity(pe, at, images):
    vit = vt.Vit(VCFG)
    vlm = vt.VisionLanguageModel(TCFG, vit, pos_embedding_type=pe,
                                 attention_type=at)
    params = vlm.init(jax.random.PRNGKey(3))
    eo = vlm.encode(params, images)
    start = jnp.zeros((2, 1), dtype=jnp.int32)
    g1 = generate_multimodel(vlm, params, eo, decoder_start=start,
                             max_new_tokens=5, use_cache=True)
    g2 = generate_multimodel(vlm, params, eo, decoder_start=start,
                             max_new_tokens=5, use_cache=False)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
