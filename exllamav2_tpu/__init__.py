"""exllamav2_tpu: TPU-native quantized LLM inference framework.

EXL2/GPTQ weight formats decoded by fused Pallas kernels, paged +
quantized KV cache, continuous-batching generator with on-device
sampling, speculative decoding, constrained decoding, CFG, LoRA, and an
offline GPTQ conversion pipeline — a ground-up JAX/XLA/Pallas re-design
with the capabilities of turboderp-org/exllamav2.
"""

from exllamav2_tpu.config import ModelConfig                     # noqa: F401
from exllamav2_tpu.models.model import Model                     # noqa: F401
from exllamav2_tpu.cache import KVCache                          # noqa: F401
from exllamav2_tpu.cache_paged import PagedKVCache, PAGE_SIZE    # noqa: F401
from exllamav2_tpu.tokenizer import (                            # noqa: F401
    Tokenizer, ByteTokenizer, load_tokenizer)
from exllamav2_tpu.lora import Lora, apply_lora, remove_lora     # noqa: F401
from exllamav2_tpu.generator.dynamic import (                    # noqa: F401
    DynamicGenerator, DynamicJob)
from exllamav2_tpu.generator.sampler import Settings             # noqa: F401

__version__ = "0.1.0"
