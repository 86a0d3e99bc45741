from . import flash_attention, fused, paged_attention, paged_decode_pallas  # noqa: F401
