"""Video input demo (reference examples/multimodal_video.py analog):
a Qwen2-VL-family model consumes a stack of frames as one MMEmbedding;
frames pair up through the temporal patch size and MRoPE advances the
temporal axis per frame pair.

    python examples/multimodal_video.py -m <qwen2vl_dir> -v frames_dir
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exllamav2_tpu.model_init import init, add_args  # noqa: E402
from exllamav2_tpu.generator.sampler import Settings  # noqa: E402
from exllamav2_tpu.vlm import VisionTower  # noqa: E402


def load_frames(path, limit=16):
    """Directory of frame images (sorted by name) -> list of arrays.
    Without a directory, synthesizes a 4-frame moving-gradient clip."""
    if path:
        from PIL import Image
        names = sorted(os.listdir(path))[:limit]
        return [np.asarray(Image.open(os.path.join(path, n)).convert("RGB"))
                for n in names]
    xs = np.linspace(0, 1, 224)
    frames = []
    for t in range(4):
        g = (np.add.outer(xs, xs) / 2 + t * 0.1) % 1.0
        frames.append((np.stack([g, g * 0.5, 1 - g], -1)
                       * 255).astype(np.uint8))
    return frames


def main():
    ap = argparse.ArgumentParser()
    add_args(ap)
    ap.add_argument("-v", "--video_dir", default=None,
                    help="directory of frame images (default: synthetic)")
    ap.add_argument("--prompt",
                    default="<|im_start|>user\n<vid>\nDescribe the clip."
                            "<|im_end|>\n<|im_start|>assistant\n")
    args = ap.parse_args()
    model, tokenizer, generator = init(args)

    tower = VisionTower(model.config)
    frames = load_frames(args.video_dir)
    video = tower.get_video_embeddings(model, tokenizer, frames,
                                       text_alias="<vid>")
    print(f" -- video: {len(frames)} frames -> "
          f"{video.thw_grid} (t, h, w) grid")
    print(generator.generate(args.prompt, max_new_tokens=128,
                             settings=Settings.greedy(),
                             embeddings=[video],
                             stop_conditions=["<|im_end|>"]))


if __name__ == "__main__":
    main()
