from . import attention, ffn, positional, kv_cache, adapters  # noqa: F401
