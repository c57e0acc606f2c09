"""LoRA adapter example (reference examples/inference_lora.py)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exllamav2_tpu.model_init import init, add_args  # noqa: E402
from exllamav2_tpu.generator.sampler import Settings  # noqa: E402
from exllamav2_tpu.lora import Lora, apply_lora  # noqa: E402

ap = argparse.ArgumentParser()
add_args(ap)
ap.add_argument("--lora_dir", required=True,
                help="PEFT adapter directory (adapter_config.json)")
args = ap.parse_args()

model, tokenizer, generator = init(args)
lora = Lora(args.lora_dir)
model.weights = apply_lora(model.weights, lora)

print(generator.generate("Our story begins in the Scottish town of",
                         max_new_tokens=120,
                         settings=Settings(temperature=0.8),
                         completion_only=False))
