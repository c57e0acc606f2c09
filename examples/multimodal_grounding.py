"""Visual grounding with Qwen2-VL/2.5-VL: ask for bounding boxes.

Console analog of the reference's multimodal_grounding_qwen example
(there a PyQt app): prompt the model to locate an object, parse the
grounding tokens from the completion, and print pixel-space boxes.

Qwen2-VL emits  <|object_ref_start|>label<|object_ref_end|>
                <|box_start|>(x1,y1),(x2,y2)<|box_end|>
with coordinates normalized to 0-1000; Qwen2.5-VL emits raw JSON boxes
in absolute pixels.

    python examples/multimodal_grounding.py -m <qwen2vl_dir> \
        -i image.png -q "the red car"
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BOX_RE = re.compile(
    r"<\|object_ref_start\|>(.*?)<\|object_ref_end\|>.*?"
    r"<\|box_start\|>\((\d+),(\d+)\),\((\d+),(\d+)\)<\|box_end\|>",
    re.S)


def parse_boxes(text: str, width: int, height: int):
    """-> [(label, (x1, y1, x2, y2) in pixels)] from grounding tokens
    (0-1000-normalized coordinates) or Qwen2.5-style JSON."""
    out = []
    for m in BOX_RE.finditer(text):
        label = m.group(1).strip()
        x1, y1, x2, y2 = (int(v) for v in m.groups()[1:])
        out.append((label, (x1 * width // 1000, y1 * height // 1000,
                            x2 * width // 1000, y2 * height // 1000)))
    if not out:
        import json
        try:
            for obj in json.loads(text[text.index("["):
                                       text.rindex("]") + 1]):
                box = obj.get("bbox_2d") or obj.get("bbox")
                if box and len(box) == 4:
                    out.append((obj.get("label", "?"), tuple(box)))
        except (ValueError, KeyError):
            pass
    return out


def main():
    ap = argparse.ArgumentParser()
    from exllamav2_tpu import model_init
    model_init.add_args(ap)
    ap.add_argument("-i", "--image", required=True)
    ap.add_argument("-q", "--query", default="every visible object")
    ap.add_argument("-maxr", type=int, default=256)
    args = ap.parse_args()

    import numpy as np
    from exllamav2_tpu.generator.sampler import Settings
    from exllamav2_tpu.vlm import VisionTower

    model, tokenizer, generator = model_init.init(args)
    tower = VisionTower(model.config)

    try:
        from PIL import Image
        img = np.asarray(Image.open(args.image).convert("RGB"))
    except ImportError:
        import json
        img = np.asarray(json.load(open(args.image)), np.uint8)
    h, w = img.shape[:2]

    emb = tower.get_image_embeddings(model, tokenizer, img,
                                     text_alias="<img>")
    prompt = (
        "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
        "<|im_start|>user\n<img>\nLocate "
        f"{args.query} and output bounding boxes.<|im_end|>\n"
        "<|im_start|>assistant\n")
    out = generator.generate(
        prompt, max_new_tokens=args.maxr, settings=Settings.greedy(),
        embeddings=[emb], encode_special_tokens=True,
        stop_conditions=["<|im_end|>"])
    print(out)
    boxes = parse_boxes(out, w, h)
    for label, (x1, y1, x2, y2) in boxes:
        print(f" -- {label}: ({x1},{y1})-({x2},{y2})")
    if not boxes:
        print(" -- no grounding tokens found in the completion")


if __name__ == "__main__":
    main()
