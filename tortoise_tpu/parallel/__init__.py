from tortoise_tpu.parallel.mesh import make_mesh  # noqa: F401
from tortoise_tpu.parallel.sharding import (  # noqa: F401
    ar_param_specs,
    batch_spec,
    replicated,
    shard_tree,
)
