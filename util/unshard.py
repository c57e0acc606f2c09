"""Merge sharded .safetensors into one file (reference util/unshard.py).

    python util/unshard.py <model_dir_or_first_shard> [out.safetensors]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exllamav2_tpu.stloader import TensorFileMap, write_safetensors  # noqa: E402


def main():
    src = sys.argv[1]
    if os.path.isfile(src):
        src = os.path.dirname(src) or "."
    out = sys.argv[2] if len(sys.argv) > 2 else \
        os.path.join(src, "model-merged.safetensors")
    tfm = TensorFileMap(src)
    tensors = {}
    dtypes = {}
    for name in tfm.keys():
        tensors[name] = tfm.get_tensor(name)
        if tfm.get_dtype(name) == "BF16":
            dtypes[name] = "BF16"
    write_safetensors(out, tensors, dtypes=dtypes)
    print(f" -- wrote {out} ({sum(t.nbytes for t in tensors.values())/1e6:.1f} MB)")
    tfm.close()


if __name__ == "__main__":
    main()
