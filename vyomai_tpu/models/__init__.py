from .encoder import EncoderModel, EncoderForMaskedLM  # noqa: F401
from .decoder import DecoderModel  # noqa: F401
from .outputs import (  # noqa: F401
    EncoderOutput, MLMOutput, CLMOutput, Seq2SeqOutput, DecoderOutput)
