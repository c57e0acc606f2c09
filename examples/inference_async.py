"""Async generator demo (reference examples/inference_async.py analog):
drive several jobs concurrently with asyncio and stream each one.

    python examples/inference_async.py -m <model_dir>
"""

import argparse
import asyncio
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exllamav2_tpu import model_init  # noqa: E402
from exllamav2_tpu.generator.dynamic_async import (  # noqa: E402
    DynamicGeneratorAsync, DynamicJobAsync)
from exllamav2_tpu.generator.sampler import Settings  # noqa: E402


async def run_one(agen, tokenizer, prompt, tag):
    job = DynamicJobAsync(agen, tokenizer.encode(prompt, add_bos=True),
                          max_new_tokens=32, settings=Settings.greedy())
    await agen.enqueue(job)
    text = ""
    async for r in job:
        text += r.get("text", "")
    print(f"[{tag}] {prompt!r} -> {text!r}")
    return text


async def amain(args):
    model, tokenizer, generator = model_init.init(args, max_batch_size=4)
    agen = DynamicGeneratorAsync(generator)
    prompts = ["Once upon a time", "The capital of France is",
               "def fibonacci(n):", "Roses are red"]
    await asyncio.gather(*(run_one(agen, tokenizer, p, i)
                           for i, p in enumerate(prompts)))
    await agen.close()


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    model_init.add_args(ap)
    asyncio.run(amain(ap.parse_args()))
