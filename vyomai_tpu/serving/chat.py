"""Minimal chat templating for the serving engine (reference
``simple_vllm.ipynb``'s from-scratch chat-template tokenizer glue).

Token-id level: callers provide a ``tokenize`` callable (e.g. an HF
tokenizer's ``encode``) plus the special-token ids; this module only builds
the Qwen-style turn structure."""

from typing import Callable, List, Sequence, Tuple


def build_chat_prompt(messages: Sequence[Tuple[str, str]],
                      tokenize: Callable[[str], List[int]],
                      *, im_start_id: int, im_end_id: int,
                      newline_id: int, add_generation_prompt: bool = True,
                      assistant_role_ids: Sequence[int] = ()) -> List[int]:
    """messages: [(role, content), ...] -> token ids in the
    ``<|im_start|>role\\ncontent<|im_end|>\\n`` layout."""
    ids: List[int] = []
    for role, content in messages:
        ids.append(im_start_id)
        ids.extend(tokenize(role))
        ids.append(newline_id)
        ids.extend(tokenize(content))
        ids.append(im_end_id)
        ids.append(newline_id)
    if add_generation_prompt:
        ids.append(im_start_id)
        ids.extend(list(assistant_role_ids) or tokenize("assistant"))
        ids.append(newline_id)
    return ids
