from . import (flash_attention, fused, paged_attention,  # noqa: F401
               paged_decode_pallas, ring_attention)
