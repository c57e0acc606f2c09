"""Minimal generation example (reference examples/inference.py analog)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exllamav2_tpu.model_init import init, add_args  # noqa: E402
import argparse  # noqa: E402

ap = argparse.ArgumentParser()
add_args(ap)
args = ap.parse_args()

model, tokenizer, generator = init(args)

from exllamav2_tpu.generator.sampler import Settings  # noqa: E402

prompt = "Once upon a time,"
output = generator.generate(prompt, max_new_tokens=150,
                            settings=Settings(temperature=0.8, top_p=0.9),
                            completion_only=False)
print(output)
