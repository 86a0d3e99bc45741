from .generate import generate, generate_seq2seq, generate_multimodel  # noqa: F401
from .sampling import (  # noqa: F401
    LogitsProcessor, GreedyProcessor, MultinomialProcessor, TopKProcessor,
    NucleusProcessor, TopKNucleusProcessor)
from .speculative import (  # noqa: F401
    speculative_generate, speculative_generate_onchip,
    speculative_generate_multimodel, norm_fn)
from .beam import beam_search_generate, reorder_cache  # noqa: F401
from .stopping import (  # noqa: F401
    KeywordsStoppingCriteria, generate_until)
