from tortoise_tpu.io.ggml import read_ggml, write_ggml, GGML_MAGIC  # noqa: F401
from tortoise_tpu.io.voice import load_voice_latent  # noqa: F401
from tortoise_tpu.io.wav import write_wav, read_wav  # noqa: F401
