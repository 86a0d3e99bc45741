from .trainer import (  # noqa: F401
    Trainer, TrainState, make_optimizer, make_train_step, create_train_state,
    MetricLogger)
from .losses import (  # noqa: F401
    sft_loss, dpo_loss, compute_logprobs, electra_loss, clip_loss,
    distillation_loss, grpo_loss, group_advantages, token_logprobs,
    medusa_loss)
from .collators import (  # noqa: F401
    masked_language_modeling, electra_inputs, gumbel_sample, sft_collate,
    dpo_collate, lm_blocks, LanguageModeling)
from .distill import select_layers, default_student_indices  # noqa: F401
from .muon import (  # noqa: F401
    muon, scale_by_muon, newton_schulz_orthogonalize)
from .quant_opt import adamw8bit, optimizer_state_bytes  # noqa: F401
from .packing import (  # noqa: F401
    pack_sequences, pack_sft, packing_efficiency)
from . import checkpoint  # noqa: F401
from .detection import detr_loss, hungarian_match, generalized_iou  # noqa: F401
from .native_data import BlockBatchLoader  # noqa: F401
from . import native_data  # noqa: F401
