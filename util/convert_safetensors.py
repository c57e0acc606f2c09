"""Convert a torch pickle checkpoint (.bin/.pt) to safetensors
(reference util/convert_safetensors.py analog).

    python util/convert_safetensors.py <in.bin> [out.safetensors]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from exllamav2_tpu.stloader import write_safetensors  # noqa: E402


def main():
    src = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else \
        os.path.splitext(src)[0] + ".safetensors"
    import torch
    sd = torch.load(src, map_location="cpu", weights_only=True)
    tensors = {}
    dtypes = {}
    for name, t in sd.items():
        if t.dtype == torch.bfloat16:
            tensors[name] = t.view(torch.uint16).numpy()
            dtypes[name] = "BF16"
        else:
            tensors[name] = t.numpy()
    write_safetensors(out, tensors, dtypes=dtypes)
    print(f" -- wrote {out} ({len(tensors)} tensors)")


if __name__ == "__main__":
    main()
