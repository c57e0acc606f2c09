"""Bulk batched inference (reference examples/bulk_inference.py analog):
queue many prompts at once and let continuous batching fill the device."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exllamav2_tpu import model_init  # noqa: E402
from exllamav2_tpu.generator.sampler import Settings  # noqa: E402

ap = argparse.ArgumentParser()
model_init.add_args(ap)
ap.add_argument("-n", type=int, default=32, help="number of prompts")
args = ap.parse_args()

model, tokenizer, generator = model_init.init(args, max_batch_size=32)

prompts = [f"Question {i}: what comes after {i}? Answer:"
           for i in range(args.n)]
t0 = time.perf_counter()
outs = generator.generate(prompts, max_new_tokens=32,
                          settings=Settings.greedy())
dt = time.perf_counter() - t0
total = 32 * len(prompts)
print(f" -- {len(prompts)} prompts, {total} tokens in {dt:.1f}s "
      f"({total / dt:.1f} t/s aggregate)")
for p, o in list(zip(prompts, outs))[:3]:
    print(f"{p!r} -> {o!r}")
