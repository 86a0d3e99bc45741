"""vyomai_tpu — TPU-native JAX/XLA/Pallas rebuild of VyomAI's capabilities.

Public API mirrors the reference ``VyomAI/__init__.py:1-13`` surface.
"""

from .config import (  # noqa: F401
    EncoderConfig, DecoderConfig, VisionConfig, CLIPConfig,
    SiglipVisionConfig, GemmaConfig, PaliGemmaConfig, QwenConfig)
from .models import (  # noqa: F401
    EncoderModel, EncoderForMaskedLM, DecoderModel, EncoderDecoderModel,
    Seq2SeqDecoderModel, Vit, VisionLanguageModel, VisionLanguageDecoderModel,
    CLIPModel, GemmaModel, SiglipVisionModel,
    PaliGemmaForConditionalGeneration, ModelForCausalLM, OCRModel,
    ImageEncoderViT, SamVitConfig, GOTOCR2Model, GOTOCR2Config,
    DETRModel, DETRConfig, RPADVisionLanguageModel)
from .layers.kv_cache import (  # noqa: F401
    DynamicCache, StaticCache, StaticCacheOne, DynamicCacheOne, init_cache)
from .layers.adapters import (  # noqa: F401
    LoraLinear, DoraLinear, trainable_mask, masked_optimizer,
    inject_lora, inject_dora, merge_adapters, embed_multi_lora)
from .layers.medusa import (  # noqa: F401
    medusa_init, medusa_propose)
from .generation import (  # noqa: F401
    generate, generate_seq2seq, generate_multimodel, speculative_generate,
    speculative_generate_onchip, speculative_generate_multimodel,
    beam_search_generate, beam_sample_generate,
    group_beam_search_generate, generate_hf,
    GreedyProcessor, MultinomialProcessor, TopKProcessor, NucleusProcessor,
    TopKNucleusProcessor, MinPProcessor, TokenFSM, fsm_from_token_sequences,
    fsm_from_regex, fsm_from_json_schema, json_schema_to_regex,
    constrained_generate)

from .quant import (  # noqa: F401
    quantize_params, dequantize_params, quantization_error)

__version__ = "0.1.0"
from . import utils  # noqa: F401
from . import serving  # noqa: F401
from . import training  # noqa: F401
from . import parallel  # noqa: F401
from . import interop  # noqa: F401
