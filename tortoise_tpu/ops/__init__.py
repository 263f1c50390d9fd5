from tortoise_tpu.ops.basic import (  # noqa: F401
    layer_norm,
    group_norm,
    gelu,
    silu,
    leaky_relu,
    pdot,
)
