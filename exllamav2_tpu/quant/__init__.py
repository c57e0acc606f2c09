from exllamav2_tpu.quant import formats
