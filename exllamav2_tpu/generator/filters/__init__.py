from exllamav2_tpu.generator.filters.base import Filter      # noqa: F401
from exllamav2_tpu.generator.filters.prefix import PrefixFilter  # noqa: F401
from exllamav2_tpu.generator.filters.select import SelectFilter  # noqa: F401
