from . import attention, ffn, positional, kv_cache  # noqa: F401
