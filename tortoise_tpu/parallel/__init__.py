from tortoise_tpu.parallel.mesh import make_mesh  # noqa: F401
from tortoise_tpu.parallel.sharding import (  # noqa: F401
    ar_param_specs,
    batch_spec,
    diffusion_param_specs,
    place_batch,
    replicated,
    shard_tree,
    vocoder_param_specs,
)
