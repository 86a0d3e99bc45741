"""HF checkpoint EXPORT: the inverse of ``hf_import`` for the modern
decoder families (Qwen2/3, Llama, Mistral) — write params trained or
fine-tuned here back into the HF ``model.layers.N.*`` state-dict layout so
they load into ``transformers`` (or any other consumer of the format).

The reference only ever imports HF weights (``paligemma.ipynb`` cell 18,
``simple_vllm.ipynb`` cells 8-9); round-tripping completes the interop
story: import -> fine-tune on TPU -> export.

Works on plain ``{name: np.ndarray}`` dicts; use :func:`save_safetensors`
to write shards.
"""

from typing import Dict

import jax
import numpy as np

__all__ = ["export_qwen", "export_llama", "export_mistral",
           "save_safetensors"]


def _np(x):
    return np.asarray(jax.device_get(x))


def _lin(out: dict, name: str, p: dict):
    out[f"{name}.weight"] = _np(p["kernel"]).T.copy()
    if "bias" in p:
        out[f"{name}.bias"] = _np(p["bias"])


def _rms(out: dict, name: str, p: dict):
    out[f"{name}.weight"] = _np(p["weight"])


def export_qwen(params: dict, config, prefix: str = "model"
                ) -> Dict[str, np.ndarray]:
    """``models.qwen.ModelForCausalLM`` params -> HF state dict.

    Handles the stacked ``[L, ...]`` layer layout (un-stacks along the
    leading layer axis), optional QK-norms, and the tied/untied lm_head.
    Quantized trees are rejected — dequantize before exporting."""
    # quantized markers live on LEAF dicts (layers.self_attn.q_proj.kernel_q,
    # mlp.w_in_q — see quant.py), so check every path, not the top level
    leaf_keys = {p[-1].key for p, _ in jax.tree_util.tree_flatten_with_path(
        params.get("layers", {}))[0] if p}
    if any(str(k).endswith(("_q", "_scale")) for k in leaf_keys):
        raise ValueError("params are int8/int4-quantized; export the "
                         "original fp tree (quantization is lossy and HF "
                         "loaders expect fp weights)")
    sd: Dict[str, np.ndarray] = {}
    sd[f"{prefix}.embed_tokens.weight"] = _np(
        params["embed_tokens"]["weight"])
    _rms(sd, f"{prefix}.norm", params["norm"])
    stacked = params["layers"]
    n_layers = config.num_hidden_layers
    for i in range(n_layers):
        lp = jax.tree_util.tree_map(lambda x: x[i], stacked)
        pre = f"{prefix}.layers.{i}"
        _rms(sd, f"{pre}.input_layernorm", lp["input_layernorm"])
        _rms(sd, f"{pre}.post_attention_layernorm",
             lp["post_attention_layernorm"])
        attn = lp["self_attn"]
        for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
            _lin(sd, f"{pre}.self_attn.{proj}", attn[proj])
        if "q_norm" in attn:
            _rms(sd, f"{pre}.self_attn.q_norm", attn["q_norm"])
            _rms(sd, f"{pre}.self_attn.k_norm", attn["k_norm"])
        mlp = lp["mlp"]
        if "router" in mlp:
            raise ValueError("MoE expert banks have no standard HF layout "
                             "here — export dense models only")
        for proj in ("gate_proj", "up_proj", "down_proj"):
            _lin(sd, f"{pre}.mlp.{proj}", mlp[proj])
    if "lm_head" in params:
        sd["lm_head.weight"] = _np(params["lm_head"]["kernel"]).T.copy()
    return sd


# Llama/Mistral share the key layout (see hf_import.import_llama).
export_llama = export_qwen
export_mistral = export_qwen


def save_safetensors(sd: Dict[str, np.ndarray], path: str):
    """Write a state dict as one ``.safetensors`` file."""
    from safetensors.numpy import save_file
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()}, path)
