from tortoise_tpu.pipeline.ar_stage import (  # noqa: F401
    apply_padding,
    autoregressive,
    trim_latents,
)
