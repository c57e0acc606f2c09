"""Vision-language example (reference examples/multimodal.py).

Loads a VLM checkpoint (Pixtral / Qwen2-VL / Gemma3 family), embeds an
image through the vision tower, and generates grounded text.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exllamav2_tpu.model_init import init, add_args  # noqa: E402
from exllamav2_tpu.generator.sampler import Settings  # noqa: E402
from exllamav2_tpu.vlm import VisionTower  # noqa: E402

ap = argparse.ArgumentParser()
add_args(ap)
ap.add_argument("--image", required=True, help="image file path")
ap.add_argument("--prompt", default="Describe this image: <img>")
args = ap.parse_args()

model, tokenizer, generator = init(args)
tower = VisionTower(model.config)

from PIL import Image  # noqa: E402
image = Image.open(args.image)
emb = tower.get_image_embeddings(model, tokenizer, image,
                                 text_alias="<img>")

print(generator.generate(args.prompt, max_new_tokens=200,
                         settings=Settings(temperature=0.6),
                         embeddings=[emb]))
