"""ExLlamaV2-TPU: a TPU-native quantized LLM inference framework.

JAX/XLA/Pallas re-design of the capabilities of turboderp-org/exllamav2:
EXL2 (2-8 bpw mixed) and GPTQ weight formats, paged attention with quantized
KV cache, continuous-batching dynamic generator, speculative decoding, and
tensor sharding over TPU meshes.
"""

__version__ = "0.1.0"
