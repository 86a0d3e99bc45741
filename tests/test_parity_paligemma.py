"""PaliGemma logits parity vs the reference notebook implementation.

The reference's PaliGemma is notebook-only (``paligemma.ipynb`` cells 9-17).
The test executes those cells directly from the read-only notebook (nothing
is copied into this repo), instantiates a tiny config, ports the weights,
and compares logits in float64 at atol 1e-4 (BASELINE target for the VLM
family)."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

import vyomai_tpu as vt
from vyomai_tpu.interop import hf_import

NB = "/root/reference/Examples/paligemma.ipynb"
MODEL_CELLS = (9, 11, 12, 13, 15, 16, 17)


@pytest.fixture(scope="module")
def ref_ns():
    nb = json.load(open(NB))
    import dataclasses
    import math
    from dataclasses import dataclass
    from transformers.cache_utils import Cache

    from typing import Any, Dict, List, Optional, Tuple, Union
    from einops import rearrange, repeat
    from transformers import StaticCache

    ns = {"dataclass": dataclass, "dataclasses": dataclasses, "math": math,
          "Cache": Cache, "StaticCache": StaticCache, "Any": Any,
          "Dict": Dict, "List": List, "Optional": Optional, "Tuple": Tuple,
          "Union": Union, "rearrange": rearrange, "repeat": repeat}
    for i in MODEL_CELLS:
        src = "".join(nb["cells"][i]["source"])
        exec(compile(src, f"paligemma_cell_{i}", "exec"), ns)
    return ns


@pytest.fixture(scope="module")
def tiny_cfgs(ref_ns):
    vis_kw = dict(hidden_size=64, intermediate_size=128, num_hidden_layers=2,
                  num_attention_heads=4, num_channels=3, image_size=32,
                  patch_size=8)
    txt_kw = dict(vocab_size=512, hidden_size=64, intermediate_size=128,
                  num_hidden_layers=2, num_attention_heads=4,
                  num_key_value_heads=1, head_dim=32,
                  max_position_embeddings=128)
    ref_cfg = ref_ns["PaliGemmaConfig"](
        vision_config=vis_kw, text_config=txt_kw, projection_dim=64,
        hidden_size=64,  # must equal text hidden (real config: 2048 == 2048)
        image_token_index=500, vocab_size=512, pad_token_id=0)
    ours = vt.PaliGemmaConfig(
        vision_config=vt.SiglipVisionConfig(**vis_kw),
        text_config=vt.GemmaConfig(**txt_kw),
        projection_dim=64, image_token_index=500)
    return ref_cfg, ours


def _port_weights(ref_model, ours_cfg):
    """Map the notebook model's state dict to our param tree via the HF
    importers (the notebook uses HF naming)."""
    sd = {k: v.detach().cpu().numpy()
          for k, v in ref_model.state_dict().items()}
    return {
        "vision_tower": hf_import.import_siglip(
            sd, ours_cfg.vision_config,
            prefix="vision_tower.vision_model"),
        "multi_modal_projector": hf_import._lin(
            sd, "multi_modal_projector.linear"),
        "language_model": hf_import.import_gemma(
            sd, ours_cfg.text_config, prefix="language_model.model"),
    }


def test_paligemma_notebook_parity(ref_ns, tiny_cfgs):
    ref_cfg, ours_cfg = tiny_cfgs
    torch.manual_seed(0)
    ref = ref_ns["PaliGemmaForConditionalGeneration"](ref_cfg).double().eval()
    ref.tie_weights()  # ours uses tied embeddings (the reference ties too)

    model = vt.PaliGemmaForConditionalGeneration(ours_cfg)
    params = _port_weights(ref, ours_cfg)

    n_img = ours_cfg.num_image_tokens
    ids = np.concatenate([np.full((2, n_img), 500, np.int64),
                          np.arange(6, dtype=np.int64)[None].repeat(2, 0) + 3],
                         axis=1)
    px = np.random.default_rng(0).normal(
        size=(2, 3, 32, 32)).astype(np.float64)
    mask = np.ones_like(ids)

    with torch.no_grad():
        ref_out = ref(input_ids=torch.tensor(ids),
                      pixel_values=torch.tensor(px),
                      attention_mask=torch.tensor(mask))
        ref_logits = ref_out.logits.numpy() if hasattr(ref_out, "logits") \
            else ref_out["logits"].numpy()

    with jax.enable_x64(True):
        params64 = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float64)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
        # reference inference mode attends bidirectionally over the whole
        # prompt (is_training=False full-attend) == all-prefix token types
        out = model.apply(params64, jnp.asarray(ids), jnp.asarray(px),
                          attention_mask=jnp.asarray(mask),
                          token_type_ids=jnp.zeros_like(jnp.asarray(ids)))
    np.testing.assert_allclose(np.asarray(out.logits), ref_logits, atol=1e-4)
