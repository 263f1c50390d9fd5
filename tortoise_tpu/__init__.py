"""tortoise-tpu: a TPU-native JAX TTS engine with the capabilities of
balisujohn/tortoise.cpp (GPT-2 speech-token AR decoder + conditioned DDPM
mel diffusion + UnivNet-style LVC vocoder).

See ARCHITECTURE.md for the layer map and SURVEY.md for the reference
blueprint this was built against.
"""

__version__ = "0.1.0"
