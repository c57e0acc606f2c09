"""Constrained generation with filters
(reference examples/inference_json.py / lmfe examples analog)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exllamav2_tpu import model_init  # noqa: E402
from exllamav2_tpu.generator.dynamic import DynamicJob  # noqa: E402
from exllamav2_tpu.generator.filters.select import SelectFilter  # noqa: E402
from exllamav2_tpu.generator.sampler import Settings  # noqa: E402

ap = argparse.ArgumentParser()
model_init.add_args(ap)
args = ap.parse_args()

model, tokenizer, generator = model_init.init(args)

prompt = "Is the sky blue? Answer:"
job = generator.enqueue(DynamicJob(
    tokenizer.encode(prompt), max_new_tokens=10,
    settings=Settings.greedy(),
    filters=[SelectFilter(tokenizer, [" yes", " no", " maybe"])]))
while job.status != "done":
    generator.iterate()
print(prompt + job.emitted_text)
