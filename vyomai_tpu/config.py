"""Configuration dataclasses for vyomai_tpu.

Mirrors the reference's duck-typed config surface (``EncoderConfig`` at
reference ``VyomAI/utils.py:89-100``) with the extra fields the reference
reads via ``getattr`` (``num_key_value_heads``, ``attention_bias``,
``pad_token_id``, ``eos_token_id``) plus the vision fields used by ``Vit``
(reference ``VyomAI/models/vision_encoder.py:56-100``).

All configs are frozen dataclasses so they can be closed over by jitted
functions as static structure.
"""

from dataclasses import dataclass, field, fields, replace
from typing import Optional, Tuple, Union


def config_key(cfg) -> tuple:
    """Hashable canonical key for a (frozen-dataclass) config.

    Configs may carry dict/list fields (``rope_scaling``, HF-style
    ``eos_token_id`` lists) that break ``hash(cfg)``; this flattens them
    to sorted tuples. Used by the models' structural ``__hash__`` so that
    two instances built from equal configs are interchangeable as jit
    static arguments (see ``models/qwen.py``)."""

    def canon(v):
        if isinstance(v, dict):
            return tuple(sorted((k, canon(x)) for k, x in v.items()))
        if isinstance(v, (list, tuple)):
            return tuple(canon(x) for x in v)
        if hasattr(v, "__dataclass_fields__"):
            return _key(v)
        return v

    def _key(c):
        return (type(c).__name__,) + tuple(
            (f.name, canon(getattr(c, f.name))) for f in fields(c))

    return _key(cfg)


class StructuralIdentity:
    """Structural jit-static identity for the functional model classes.

    Everything a model instance holds (RoPE/sinusoidal tables, sub-models)
    is a pure function of its config plus the constructor options named in
    ``_identity_fields``, so two instances built from equal arguments are
    interchangeable as ``jax.jit`` static arguments. Without this, models
    hash by object identity and a REBUILT model (fresh serving engine,
    re-created wrapper) retraces every jitted program that takes it as a
    static arg — ~10 min of remote compilation for a 1B-param serving
    engine on this rig; with it, both the in-process jit cache and the
    persistent compile cache hit.

    Subclasses whose constructors take options beyond ``config`` list the
    *attributes* that capture them in ``_identity_fields``; values must be
    hashable or themselves structural (sub-models using this mixin compare
    structurally). Classes composed purely of sub-models override
    ``_identity()`` instead.
    """

    _identity_fields: tuple = ()

    def _identity(self) -> tuple:
        return (type(self).__name__, config_key(self.config),
                tuple(getattr(self, f) for f in self._identity_fields))

    def __hash__(self):
        return hash(self._identity())

    def __eq__(self, other):
        return (type(other) is type(self)
                and other._identity() == self._identity())


@dataclass(frozen=True)
class EncoderConfig:
    """Default text-model config (RoBERTa-base flavored, 4 layers).

    Field names and defaults match reference ``VyomAI/utils.py:89-100``.
    """

    hidden_size: int = 768
    num_attention_heads: int = 12
    max_position_embeddings: int = 514
    num_hidden_layers: int = 4
    vocab_size: int = 50265
    hidden_dropout_prob: float = 0.1
    initializer_range: float = 0.02
    intermediate_size: int = 3072
    layer_norm_eps: float = 1e-05
    hidden_act: str = "gelu"
    # Extras the reference reads via getattr(config, ..., default):
    num_key_value_heads: int = 4          # attention.py:150 (default 4)
    attention_bias: bool = True           # attention.py:84
    pad_token_id: int = 1                 # decoder.py:453 (default 1)
    eos_token_id: int = 2                 # decoder.py:476 (default 2)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    def replace(self, **kw) -> "EncoderConfig":
        return replace(self, **kw)


# The decoder/seq2seq/VLM families share the same config surface.
DecoderConfig = EncoderConfig


@dataclass(frozen=True)
class VisionConfig:
    """ViT config (reference ``models/vision_encoder.py:56-100``)."""

    image_size: Tuple[int, int] = (224, 224)
    patch_size: Tuple[int, int] = (16, 16)
    num_channels: int = 3
    hidden_size: int = 768
    num_attention_heads: int = 12
    num_hidden_layers: int = 4
    hidden_dropout_prob: float = 0.1
    intermediate_size: int = 3072
    layer_norm_eps: float = 1e-05
    hidden_act: str = "gelu"
    attention_bias: bool = True
    initializer_range: float = 0.02

    @property
    def num_patches(self) -> int:
        return (self.image_size[0] // self.patch_size[0]) * (
            self.image_size[1] // self.patch_size[1]
        )

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    def replace(self, **kw) -> "VisionConfig":
        return replace(self, **kw)


@dataclass(frozen=True)
class CLIPConfig:
    """Dual-encoder contrastive config (reference README.md:20-27 CLIP workload)."""

    text_config: EncoderConfig = field(default_factory=EncoderConfig)
    vision_config: VisionConfig = field(default_factory=VisionConfig)
    projection_dim: int = 512
    logit_scale_init: float = 2.6592  # log(1/0.07), standard CLIP init


@dataclass(frozen=True)
class SiglipVisionConfig:
    """SigLIP vision tower config (reference ``paligemma.ipynb`` cell 9)."""

    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    num_channels: int = 3
    image_size: int = 224
    patch_size: int = 16
    layer_norm_eps: float = 1e-06
    attention_dropout: float = 0.0

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


@dataclass(frozen=True)
class GemmaConfig:
    """Gemma decoder config (reference ``paligemma.ipynb`` cells 9-20).

    Notable: head_dim is independent of hidden_size/num_heads; RMSNorm uses
    the (1 + w) form; inputs are scaled by sqrt(hidden_size); embeddings tied.
    """

    vocab_size: int = 257216
    hidden_size: int = 2048
    intermediate_size: int = 16384
    num_hidden_layers: int = 18
    num_attention_heads: int = 8
    num_key_value_heads: int = 1
    head_dim: int = 256
    max_position_embeddings: int = 8192
    rms_norm_eps: float = 1e-06
    rope_theta: float = 10000.0
    attention_bias: bool = False
    pad_token_id: int = 0
    eos_token_id: int = 1
    bos_token_id: int = 2


@dataclass(frozen=True)
class PaliGemmaConfig:
    """Composite VLM config (reference ``paligemma.ipynb`` cell 9)."""

    vision_config: SiglipVisionConfig = field(default_factory=SiglipVisionConfig)
    text_config: GemmaConfig = field(default_factory=GemmaConfig)
    projection_dim: int = 2048
    image_token_index: int = 257152

    @property
    def num_image_tokens(self) -> int:
        return self.vision_config.num_patches


@dataclass(frozen=True)
class QwenConfig:
    """Qwen2-flavored HF-compatible CLM config.

    Mirrors reference ``models/custom_transformer.py:17-74`` (RMSNorm, SwiGLU
    MLP, GQA, RoPE, tied lm_head) and the Qwen3 serving config in
    ``simple_vllm.ipynb`` (QK-norm).
    """

    vocab_size: int = 151936
    hidden_size: int = 1024
    intermediate_size: int = 3072
    num_hidden_layers: int = 28
    num_attention_heads: int = 16
    num_key_value_heads: int = 8
    head_dim: int = 128
    max_position_embeddings: int = 40960
    rms_norm_eps: float = 1e-06
    rope_theta: float = 1000000.0
    # long-context RoPE scaling (HF ``rope_scaling`` dict: rope_type
    # linear | dynamic | yarn + factor, see layers.positional.rope_freqs);
    # None = vanilla RoPE
    rope_scaling: Optional[dict] = None
    # Mistral-style sliding-window attention: each query attends only the
    # last ``sliding_window`` positions (banded causal mask; None = full
    # causal). Applies to the dense, cached and paged-serving paths.
    sliding_window: Optional[int] = None
    # StreamingLLM attention sinks: with a sliding window, the FIRST
    # ``attention_sinks`` positions stay attendable from everywhere
    # (Xiao et al. 2023 — initial tokens soak up outsized attention mass;
    # dropping them degrades windowed generation). 0 = plain window.
    attention_sinks: int = 0
    attention_bias: bool = False
    qk_norm: bool = True
    tie_word_embeddings: bool = True
    pad_token_id: int = 151643
    # int, or a tuple of ids (HF Llama-3 ships eos_token_id as a LIST;
    # generation.sampling.normalize_eos is the one normalizer)
    eos_token_id: Union[int, Tuple[int, ...]] = 151645
    # Mixture-of-Experts MLP (TPU-native scaling extension; the reference
    # has no MoE — SURVEY.md §2.4 EP row). num_experts=0 keeps the dense
    # SwiGLU MLP. With experts, each layer's MLP becomes a top-k-routed
    # GShard dispatch over SwiGLU experts (layers/moe.py); capacity-based
    # token dropping applies only under ``apply(..., train=True)`` —
    # inference is dropless so cached decode stays token-exact.
    num_experts: int = 0
    num_experts_per_tok: int = 2
    moe_capacity_factor: float = 1.25
    router_aux_loss_coef: float = 0.01
    # Dropless dispatch implementation: "einsum" = GShard dense dispatch
    # (GSPMD/EP-friendly), "ragged" = sort tokens by expert and run
    # grouped matmuls via lax.ragged_dot (megablocks-style — exactly the
    # expert FLOPs, no [T,E,C] dispatch tensors; single-device fast path).
    # Capacity-dropping training always uses the einsum form.
    moe_impl: str = "einsum"

    def replace(self, **kw) -> "QwenConfig":
        return replace(self, **kw)
