"""Legacy streaming-generator API example (reference inference_stream)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exllamav2_tpu.model_init import init, add_args  # noqa: E402
from exllamav2_tpu.generator.streaming import StreamingGenerator  # noqa: E402
from exllamav2_tpu.generator.sampler import Settings  # noqa: E402

ap = argparse.ArgumentParser()
add_args(ap)
args = ap.parse_args()

model, tokenizer, generator = init(args)
stream = StreamingGenerator(model, generator.cache, tokenizer)
stream.begin_stream_ex(tokenizer.encode("The old lighthouse keeper"),
                       Settings(temperature=0.8))
for _ in range(200):
    chunk, eos, _ = stream.stream()
    print(chunk, end="", flush=True)
    if eos:
        break
print()
