"""Banned strings + stop conditions (reference inference_banned_strings)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exllamav2_tpu.model_init import init, add_args  # noqa: E402
from exllamav2_tpu.generator.dynamic import DynamicJob  # noqa: E402
from exllamav2_tpu.generator.sampler import Settings  # noqa: E402

ap = argparse.ArgumentParser()
add_args(ap)
args = ap.parse_args()

model, tokenizer, generator = init(args)
job = DynamicJob(
    tokenizer.encode("Here is a story about dragons:"),
    max_new_tokens=200,
    settings=Settings(temperature=0.8),
    banned_strings=["however", "as an ai"],
    stop_conditions=["\n\n"])
generator.enqueue(job)
while job.status != "done":
    for r in generator.iterate():
        if r["stage"] == "streaming":
            print(r.get("text", ""), end="", flush=True)
print()
