from . import (attention, ffn, positional, kv_cache, adapters, modern,  # noqa: F401
               moe, medusa)
