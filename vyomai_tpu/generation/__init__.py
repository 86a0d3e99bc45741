from .generate import (  # noqa: F401
    generate, generate_hf, generate_seq2seq, generate_multimodel)
from .sampling import (  # noqa: F401
    LogitsProcessor, GreedyProcessor, MultinomialProcessor, TopKProcessor,
    NucleusProcessor, TopKNucleusProcessor, MinPProcessor,
    apply_repetition_penalty,
    apply_no_repeat_ngram, apply_min_new_tokens,
    apply_suppress_tokens, apply_forced_token)
from .speculative import (  # noqa: F401
    speculative_generate, speculative_generate_onchip,
    speculative_generate_multimodel, norm_fn)
from .beam import (  # noqa: F401
    beam_search_generate, beam_sample_generate,
    group_beam_search_generate, reorder_cache)
from .stopping import (  # noqa: F401
    KeywordsStoppingCriteria, generate_until)
from .constrained import (  # noqa: F401
    TokenFSM, fsm_from_token_sequences, fsm_from_regex,
    fsm_from_json_schema, json_schema_to_regex, token_strings_from_hf,
    constrained_generate, apply_fsm_mask)
