from .engine import ContinuousBatchEngine  # noqa: F401
from .kv_manager import PagedKVManager, SequenceState, RadixNode  # noqa: F401
from .async_engine import AsyncEngine, RequestAborted, RequestHandle  # noqa: F401
from . import paged_model  # noqa: F401
from .llm import LLM, SamplingParams, RequestOutput, CompletionOutput  # noqa: F401
from .embedding import embed_batch  # noqa: F401
