"""Classifier-free guidance example (reference inference_cfg.py)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exllamav2_tpu.model_init import init, add_args  # noqa: E402
from exllamav2_tpu.generator.dynamic import DynamicJob  # noqa: E402
from exllamav2_tpu.generator.sampler import Settings  # noqa: E402

ap = argparse.ArgumentParser()
add_args(ap)
ap.add_argument("--cfg-scale", type=float, default=1.5)
args = ap.parse_args()

model, tokenizer, generator = init(args)

positive = "You are an enthusiastic pirate. User: Tell me about maps. You:"
negative = "You are a bored clerk. User: Tell me about maps. You:"

sett = Settings(temperature=0.8, cfg_scale=args.cfg_scale)
job = DynamicJob(tokenizer.encode(positive), max_new_tokens=120,
                 settings=sett,
                 negative_prompt_ids=tokenizer.encode(negative))
generator.enqueue(job)
text = ""
while job.status != "done":
    for r in generator.iterate():
        if r["stage"] == "streaming":
            text += r.get("text", "")
print(positive + text)
