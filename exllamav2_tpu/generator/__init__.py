from exllamav2_tpu.generator.dynamic import (          # noqa: F401
    DynamicGenerator, DynamicJob)
from exllamav2_tpu.generator.sampler import Settings   # noqa: F401
from exllamav2_tpu.generator.base import BaseGenerator  # noqa: F401
from exllamav2_tpu.generator.streaming import StreamingGenerator  # noqa: F401
