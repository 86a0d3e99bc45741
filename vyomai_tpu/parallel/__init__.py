from .mesh import (  # noqa: F401
    create_mesh, create_hybrid_mesh, param_pspec, shard_params, data_sharding, replicated,
    fsdp_pspec, shard_params_fsdp)
from .tp_attention import sharded_sdpa  # noqa: F401
from .pipeline import pipeline_apply, stage_params_sharding  # noqa: F401
