from tortoise_tpu.ops.pallas.flash_attention import flash_attention  # noqa: F401
