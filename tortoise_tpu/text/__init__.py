from tortoise_tpu.text.tokenizer import Tokenizer, load_vocab  # noqa: F401
