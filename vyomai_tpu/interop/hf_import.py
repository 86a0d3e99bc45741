"""HuggingFace checkpoint import (safetensors) for the PaliGemma and
Qwen-style model families (reference ``paligemma.ipynb`` cell 18 and
``simple_vllm.ipynb`` cells 8-9: shard loading + key-by-key assignment,
tied-weight handling).

Works on a ``{name: np.ndarray}`` state dict; use :func:`load_safetensors`
to read local ``*.safetensors`` shards.
"""

import glob
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Load all ``*.safetensors`` shards under ``path`` (file or dir)."""
    from safetensors import safe_open
    files = [path] if path.endswith(".safetensors") else \
        sorted(glob.glob(os.path.join(path, "*.safetensors")))
    sd = {}
    for f in files:
        with safe_open(f, framework="numpy") as fh:
            for k in fh.keys():
                sd[k] = fh.get_tensor(k)
    return sd


def _lin(sd, name, bias=True):
    p = {"kernel": jnp.asarray(sd[f"{name}.weight"].T)}
    if bias and f"{name}.bias" in sd:
        p["bias"] = jnp.asarray(sd[f"{name}.bias"])
    return p


def _rms(sd, name):
    return {"weight": jnp.asarray(sd[f"{name}.weight"])}


def _ln(sd, name):
    return {"weight": jnp.asarray(sd[f"{name}.weight"]),
            "bias": jnp.asarray(sd[f"{name}.bias"])}


def _stack(dicts):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *dicts)


def _modern_layer(sd, pre, qk_norm=False):
    lp = {
        "input_layernorm": _rms(sd, f"{pre}.input_layernorm"),
        "post_attention_layernorm": _rms(sd, f"{pre}.post_attention_layernorm"),
        "self_attn": {
            "q_proj": _lin(sd, f"{pre}.self_attn.q_proj"),
            "k_proj": _lin(sd, f"{pre}.self_attn.k_proj"),
            "v_proj": _lin(sd, f"{pre}.self_attn.v_proj"),
            "o_proj": _lin(sd, f"{pre}.self_attn.o_proj"),
        },
        "mlp": {
            "gate_proj": _lin(sd, f"{pre}.mlp.gate_proj"),
            "up_proj": _lin(sd, f"{pre}.mlp.up_proj"),
            "down_proj": _lin(sd, f"{pre}.mlp.down_proj"),
        },
    }
    if qk_norm:
        lp["self_attn"]["q_norm"] = _rms(sd, f"{pre}.self_attn.q_norm")
        lp["self_attn"]["k_norm"] = _rms(sd, f"{pre}.self_attn.k_norm")
    return lp


def import_gemma(sd, config, prefix: str = "language_model.model") -> dict:
    layers = [_modern_layer(sd, f"{prefix}.layers.{i}")
              for i in range(config.num_hidden_layers)]
    return {
        "embed_tokens": {"weight": jnp.asarray(
            sd[f"{prefix}.embed_tokens.weight"])},
        "layers": _stack(layers),
        "norm": _rms(sd, f"{prefix}.norm"),
    }


def import_siglip(sd, config,
                  prefix: str = "vision_tower.vision_model") -> dict:
    layers = []
    for i in range(config.num_hidden_layers):
        pre = f"{prefix}.encoder.layers.{i}"
        layers.append({
            "layer_norm1": _ln(sd, f"{pre}.layer_norm1"),
            "layer_norm2": _ln(sd, f"{pre}.layer_norm2"),
            "self_attn": {
                "q_proj": _lin(sd, f"{pre}.self_attn.q_proj"),
                "k_proj": _lin(sd, f"{pre}.self_attn.k_proj"),
                "v_proj": _lin(sd, f"{pre}.self_attn.v_proj"),
                "out_proj": _lin(sd, f"{pre}.self_attn.out_proj"),
            },
            "mlp": {
                "fc1": _lin(sd, f"{pre}.mlp.fc1"),
                "fc2": _lin(sd, f"{pre}.mlp.fc2"),
            },
        })
    return {
        "patch_embedding": {
            "kernel": jnp.asarray(
                sd[f"{prefix}.embeddings.patch_embedding.weight"]),
            "bias": jnp.asarray(
                sd[f"{prefix}.embeddings.patch_embedding.bias"]),
        },
        "position_embedding": {"weight": jnp.asarray(
            sd[f"{prefix}.embeddings.position_embedding.weight"])},
        "layers": _stack(layers),
        "post_layernorm": _ln(sd, f"{prefix}.post_layernorm"),
    }


def import_paligemma(sd, config) -> dict:
    proj_name = "multi_modal_projector.linear"
    return {
        "vision_tower": import_siglip(sd, config.vision_config),
        "multi_modal_projector": _lin(sd, proj_name),
        "language_model": import_gemma(sd, config.text_config),
    }


def _conv(sd, name):
    p = {"kernel": jnp.asarray(sd[f"{name}.weight"])}   # OIHW, direct
    if f"{name}.bias" in sd:
        p["bias"] = jnp.asarray(sd[f"{name}.bias"])
    return p


def import_sam(sd, config, prefix: str = "") -> dict:
    """SAM ``ImageEncoderViT`` state dict -> ``models.sam_vit`` params.

    Key layout follows the reference notebook's from-scratch encoder
    (``ciphar-gocr2-0.ipynb`` cell 2: ``ImageEncoderViT``/
    ``build_GOT_vit_b``), which matches both the original SAM release and
    the GOT-OCR2 checkpoint's ``model.vision_tower_high.*`` subtree
    (pass that as ``prefix``). The ``net_2``/``net_3`` GOT downsampling
    convs live OUTSIDE this mapping (see :func:`import_got_ocr2`)."""
    p = f"{prefix}." if prefix else ""
    params = {
        "patch_embed": _conv(sd, f"{p}patch_embed.proj"),
        "pos_embed": jnp.asarray(sd[f"{p}pos_embed"]),
        "neck": {
            "conv1": _conv(sd, f"{p}neck.0"),
            "ln1": _ln(sd, f"{p}neck.1"),
            "conv2": _conv(sd, f"{p}neck.2"),
            "ln2": _ln(sd, f"{p}neck.3"),
        },
    }
    blocks = []
    for i in range(config.depth):
        pre = f"{p}blocks.{i}"
        blk = {
            "norm1": _ln(sd, f"{pre}.norm1"),
            "attn": {"qkv": _lin(sd, f"{pre}.attn.qkv"),
                     "proj": _lin(sd, f"{pre}.attn.proj")},
            "norm2": _ln(sd, f"{pre}.norm2"),
            "mlp": {"lin1": _lin(sd, f"{pre}.mlp.lin1"),
                    "lin2": _lin(sd, f"{pre}.mlp.lin2")},
        }
        if config.use_rel_pos:
            blk["attn"]["rel_pos_h"] = jnp.asarray(
                sd[f"{pre}.attn.rel_pos_h"])
            blk["attn"]["rel_pos_w"] = jnp.asarray(
                sd[f"{pre}.attn.rel_pos_w"])
        blocks.append(blk)
    params["blocks"] = blocks
    return params


def import_got_ocr2(sd, config) -> dict:
    """GOT-OCR2 (``GOTQwenForCausalLM``) state dict ->
    ``models.got_ocr2.GOTOCR2Model`` params.

    Reference ``ciphar-gocr2-0.ipynb`` cells 2/4/5: the checkpoint nests
    the SAM tower (incl. its ``net_2``/``net_3`` stride-2 convs) under
    ``model.vision_tower_high``, the 1024->1024 projector under
    ``model.mm_projector_vary``, and a Qwen2 LM under ``model.*``."""
    return {
        "vision": import_sam(sd, config.vision_config,
                             prefix="model.vision_tower_high"),
        "net_2": _conv(sd, "model.vision_tower_high.net_2"),
        "net_3": _conv(sd, "model.vision_tower_high.net_3"),
        "mm_projector": _lin(sd, "model.mm_projector_vary"),
        "language_model": import_qwen(sd, config.text_config,
                                      prefix="model"),
    }


def _eos(v):
    """HF ``eos_token_id`` may be an int OR a list (Llama-3 ships
    ``[128001, 128008, 128009]``): keep every id — downstream consumers
    normalize via ``generation.sampling.normalize_eos`` (the engine stops
    on any of them; single-eos paths take the first)."""
    return tuple(int(t) for t in v) if isinstance(v, (list, tuple)) else v


def qwen_config_from_hf(hf: dict):
    """Map a HF ``config.json`` dict (Qwen2/Qwen3 architectures) to
    :class:`vyomai_tpu.QwenConfig` — including the long-context fields:
    ``rope_scaling`` passes through verbatim (linear/dynamic/yarn, see
    ``layers.positional.rope_freqs``) and ``sliding_window`` engages only
    when HF's ``use_sliding_window`` gate is on (HF ships the field set
    but inactive on many checkpoints)."""
    from ..config import QwenConfig
    head_dim = hf.get("head_dim") or (
        hf["hidden_size"] // hf["num_attention_heads"])
    window = hf.get("sliding_window") if hf.get("use_sliding_window") \
        else None
    return QwenConfig(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=hf["num_attention_heads"],
        num_key_value_heads=hf.get("num_key_value_heads",
                                   hf["num_attention_heads"]),
        head_dim=head_dim,
        max_position_embeddings=hf.get("max_position_embeddings", 32768),
        rms_norm_eps=hf.get("rms_norm_eps", 1e-6),
        rope_theta=hf.get("rope_theta", 1e6),
        rope_scaling=hf.get("rope_scaling"),
        sliding_window=window,
        attention_bias=hf.get("attention_bias", False),
        qk_norm="qwen3" in str(hf.get("model_type", "")).lower(),
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
        pad_token_id=hf.get("pad_token_id") or 0,
        eos_token_id=_eos(hf.get("eos_token_id", -1)),
    )


def llama_config_from_hf(hf: dict):
    """Map a HF Llama/Mistral ``config.json`` to :class:`QwenConfig`.

    The modern decoder stack covers both families: Llama is the Qwen2
    recipe without qkv biases or QK-norm; Mistral additionally runs
    sliding-window attention (its config carries ``sliding_window`` with no
    ``use_sliding_window`` gate — active whenever set)."""
    from ..config import QwenConfig
    head_dim = hf.get("head_dim") or (
        hf["hidden_size"] // hf["num_attention_heads"])
    mt = str(hf.get("model_type", "llama")).lower()
    window = hf.get("sliding_window") if (
        mt == "mistral" or hf.get("use_sliding_window")) else None
    return QwenConfig(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=hf["num_attention_heads"],
        num_key_value_heads=hf.get("num_key_value_heads",
                                   hf["num_attention_heads"]),
        head_dim=head_dim,
        max_position_embeddings=hf.get("max_position_embeddings", 4096),
        rms_norm_eps=hf.get("rms_norm_eps", 1e-6),
        rope_theta=hf.get("rope_theta", 10000.0),
        rope_scaling=hf.get("rope_scaling"),
        sliding_window=window,
        attention_bias=hf.get("attention_bias", False),
        qk_norm=False,
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
        pad_token_id=hf.get("pad_token_id") or 0,
        eos_token_id=_eos(hf.get("eos_token_id", -1)),
    )


def import_qwen(sd, config, prefix: str = "model") -> dict:
    layers = [_modern_layer(sd, f"{prefix}.layers.{i}",
                            qk_norm=getattr(config, "qk_norm", False)
                            and f"{prefix}.layers.{i}.self_attn.q_norm.weight" in sd)
              for i in range(config.num_hidden_layers)]
    params = {
        "embed_tokens": {"weight": jnp.asarray(
            sd[f"{prefix}.embed_tokens.weight"])},
        "layers": _stack(layers),
        "norm": _rms(sd, f"{prefix}.norm"),
    }
    if not config.tie_word_embeddings:
        if "lm_head.weight" not in sd:
            # fail at import time with a hint, not as a KeyError deep in
            # the first jitted forward
            raise ValueError(
                "config says tie_word_embeddings=False but the checkpoint "
                "has no lm_head.weight — the weights are tied; set "
                "tie_word_embeddings=True on the config")
        params["lm_head"] = {"kernel": jnp.asarray(sd["lm_head.weight"].T)}
    return params


# Llama/Mistral checkpoints use the identical ``model.layers.N.*`` key
# layout (q/k/v/o_proj, gate/up/down_proj, RMSNorms) — the Qwen importer is
# the importer; pair it with :func:`llama_config_from_hf`.
import_llama = import_qwen
import_mistral = import_qwen
