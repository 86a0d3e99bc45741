"""Import weights from reference (PyTorch) checkpoints into vyomai_tpu
param pytrees.

Works on a plain ``{name: np.ndarray}`` state dict so that torch is an
optional dependency (use :func:`state_dict_to_numpy` to convert). Linear
kernels are transposed from torch's ``[out, in]`` to JAX's ``[in, out]``.

Covers the reference model families:
- ``EncoderModel`` / ``EncoderForMaskedLM`` (``VyomAI/models/encoder.py``)
- ``DecoderModel`` (``models/decoder.py``)
- ``EncoderDecoderModel`` / ``Seq2SeqDecoderModel`` (``models/encoder_decoder.py``)
- ``Vit`` (``models/vision_encoder.py``)
- ``VisionLanguageModel`` (``models/multimodel.py``)
"""

from typing import Dict

import numpy as np
import jax.numpy as jnp


def state_dict_to_numpy(torch_module) -> Dict[str, np.ndarray]:
    return {k: v.detach().cpu().numpy()
            for k, v in torch_module.state_dict().items()}


def _lin(sd, prefix):
    p = {"kernel": jnp.asarray(sd[f"{prefix}.weight"].T)}
    if f"{prefix}.bias" in sd:
        p["bias"] = jnp.asarray(sd[f"{prefix}.bias"])
    return p


def _ln(sd, prefix):
    return {"weight": jnp.asarray(sd[f"{prefix}.weight"]),
            "bias": jnp.asarray(sd[f"{prefix}.bias"])}


def _emb(sd, prefix):
    return {"weight": jnp.asarray(sd[f"{prefix}.weight"])}


def _stack(dicts):
    """Stack a list of identical param dicts along a new leading layer axis."""
    import jax
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *dicts)


def _attention_block(sd, prefix, vision: bool = False):
    if vision:
        p = {"qkv": _lin(sd, f"{prefix}.qkv")}
    else:
        p = {
            "query": _lin(sd, f"{prefix}.query"),
            "key": _lin(sd, f"{prefix}.key"),
            "value": _lin(sd, f"{prefix}.value"),
        }
    p["out"] = {
        "dense": _lin(sd, f"{prefix}.out.dense"),
        "layernorm": _ln(sd, f"{prefix}.out.layernorm"),
    }
    return p


def _ffn_block(sd, prefix):
    return {
        "intermediate": _lin(sd, f"{prefix}.intermediate"),
        "out": _lin(sd, f"{prefix}.out"),
        "layernorm": _ln(sd, f"{prefix}.layernorm"),
    }


def _lm_head(sd, prefix, vocab_linear: str = "decoder"):
    # reference LMHead: dense -> GELU -> layer_norm -> decoder (+ tied bias)
    return {
        "dense": _lin(sd, f"{prefix}.dense"),
        "layer_norm": _ln(sd, f"{prefix}.layer_norm"),
        "decoder": _lin(sd, f"{prefix}.{vocab_linear}"),
    }


def _layer_stack(sd, base, n_layers, attn_key="attention", vision=False,
                 cross=False):
    layers = []
    for i in range(n_layers):
        lp = {
            "attention": _attention_block(sd, f"{base}.{i}.{attn_key}",
                                          vision=vision),
            "ffn": _ffn_block(sd, f"{base}.{i}.feed_forward"),
        }
        if cross:
            lp["cross_attention"] = _attention_block(
                sd, f"{base}.{i}.cross_attention")
        layers.append(lp)
    return _stack(layers)


def import_encoder(sd, config, pos_embedding_type="absolute",
                   prefix: str = "") -> dict:
    pre = prefix
    params = {
        "word_embeddings": _emb(sd, f"{pre}word_embeddings"),
        "layers": _layer_stack(sd, f"{pre}all_layer",
                               config.num_hidden_layers),
    }
    if pos_embedding_type == "absolute":
        params["position_embeddings"] = _emb(
            sd, f"{pre}position_embeddings.pos_embeddings")
    return params


def import_encoder_for_mlm(sd, config, pos_embedding_type="absolute") -> dict:
    return {
        "encoder": import_encoder(sd, config, pos_embedding_type,
                                  prefix="encoder."),
        "lm_head": _lm_head(sd, "lm_head"),
    }


def import_decoder(sd, config, pos_embedding_type="absolute",
                   prefix: str = "") -> dict:
    pre = prefix
    params = {
        "word_embeddings": _emb(sd, f"{pre}word_embeddings"),
        "layers": _layer_stack(sd, f"{pre}all_layer",
                               config.num_hidden_layers),
        "lm_head": _lm_head(sd, f"{pre}lm_head"),
    }
    if pos_embedding_type == "absolute":
        params["position_embeddings"] = _emb(
            sd, f"{pre}position_embeddings.pos_embeddings")
    return params


def import_seq2seq_decoder(sd, config, pos_embedding_type="absolute",
                           prefix: str = "") -> dict:
    pre = prefix
    params = {
        "word_embeddings": _emb(sd, f"{pre}word_embeddings"),
        "layers": _layer_stack(sd, f"{pre}all_layer",
                               config.num_hidden_layers, cross=True),
    }
    if pos_embedding_type == "absolute":
        params["position_embeddings"] = _emb(
            sd, f"{pre}position_embeddings.pos_embeddings")
    return params


def import_encoder_decoder(sd, encoder_config, decoder_config,
                           encoder_pos="absolute", decoder_pos="absolute") -> dict:
    return {
        "encoder": import_encoder(sd, encoder_config, encoder_pos,
                                  prefix="encoder."),
        "decoder": import_seq2seq_decoder(sd, decoder_config, decoder_pos,
                                          prefix="decoder."),
        "lm_head": _lm_head(sd, "lm_head", vocab_linear="vocab"),
    }


def import_vit(sd, config) -> dict:
    n = config.num_hidden_layers
    return {
        "pixel_seq": {
            # torch conv2d weight [out, in, kh, kw]
            "kernel": jnp.asarray(sd["pixel_seq.weight"]),
            "bias": jnp.asarray(sd["pixel_seq.bias"]),
        },
        "cls_token": jnp.asarray(sd["cls_token"]),
        "position_embeddings": {
            "pos_embeddings": jnp.asarray(
                sd["position_embeddings.pos_embeddings"]),
        },
        "layers": _layer_stack(sd, "all_layer", n, vision=True),
    }


def import_vision_language(sd, config, pos_embedding_type="absolute") -> dict:
    """Decoder part of VisionLanguageModel (the vision encoder is imported
    separately with :func:`import_vit`)."""
    return import_decoder(sd, config, pos_embedding_type, prefix="decoder.")
