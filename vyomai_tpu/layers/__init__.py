from . import attention, ffn, positional, kv_cache, adapters, modern, moe  # noqa: F401
