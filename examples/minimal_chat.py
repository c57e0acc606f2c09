"""Smallest possible chat loop (reference examples/minimal_chat.py
analog): load, ask, stream, repeat — no prompt formatting frills.

    python examples/minimal_chat.py -m <model_dir>
"""

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
model, tokenizer, generator = model_init.init(args)
settings = Settings(temperature=0.8, top_p=0.9)

while True:
    try:
        q = input("\nYou: ")
    except (KeyboardInterrupt, EOFError):
        break
    job = generator.enqueue(DynamicJob(
        tokenizer.encode(f"User: {q}\nAssistant:", add_bos=True),
        max_new_tokens=256, settings=settings, stop_conditions=["User:"]))
    print("Bot:", end="", flush=True)
    while job.status != "done":
        for r in generator.iterate():
            print(r.get("text", ""), end="", flush=True)
    print()
