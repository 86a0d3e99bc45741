from .encoder import EncoderModel, EncoderForMaskedLM  # noqa: F401
from .decoder import DecoderModel  # noqa: F401
from .encoder_decoder import EncoderDecoderModel, Seq2SeqDecoderModel  # noqa: F401
from .vision import Vit  # noqa: F401
from .multimodel import VisionLanguageModel, VisionLanguageDecoderModel  # noqa: F401
from .clip import CLIPModel  # noqa: F401
from .gemma import GemmaModel  # noqa: F401
from .siglip import SiglipVisionModel  # noqa: F401
from .paligemma import (  # noqa: F401
    PaliGemmaForConditionalGeneration, parse_detection_boxes)
from .qwen import ModelForCausalLM  # noqa: F401
from .ocr import OCRModel, DeepResNetEncoder  # noqa: F401
from .sam_vit import ImageEncoderViT, SamVitConfig  # noqa: F401
from .got_ocr2 import GOTOCR2Model, GOTOCR2Config  # noqa: F401
from .detr import DETRModel, DETRConfig  # noqa: F401
from .rpad_vlm import RPADVisionLanguageModel  # noqa: F401
from .outputs import (  # noqa: F401
    EncoderOutput, MLMOutput, CLMOutput, Seq2SeqOutput, DecoderOutput)
