"""Prompt-cache / dedup demo (reference examples/inference_dedup.py analog):
many jobs sharing a long common prefix reuse the same cache pages."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exllamav2_tpu import model_init  # noqa: E402
from exllamav2_tpu.generator.dynamic import DynamicJob  # noqa: E402
from exllamav2_tpu.generator.sampler import Settings  # noqa: E402

ap = argparse.ArgumentParser()
model_init.add_args(ap)
args = ap.parse_args()

model, tokenizer, generator = model_init.init(args, max_batch_size=8)

common = "The following is a long shared context. " * 80
questions = ["What color is the sky?", "Name three fruits.",
             "What is 2+2?", "Describe water."]

jobs = []
for q in questions:
    jobs.append(generator.enqueue(DynamicJob(
        tokenizer.encode(common + "\nQ: " + q + "\nA:"),
        max_new_tokens=32, settings=Settings.greedy())))

while any(j.status != "done" for j in jobs):
    generator.iterate()

for q, j in zip(questions, jobs):
    print(f"Q: {q}\nA: {j.emitted_text.strip()}")
    print(f"   (reused {j.reused_tokens} cached prompt tokens)\n")
