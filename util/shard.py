"""Shard a single .safetensors file by size (reference util/shard.py analog).

    python util/shard.py <model.safetensors> <max_shard_MB>
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exllamav2_tpu.stloader import STFile, write_safetensors  # noqa: E402


def main():
    path, size_mb = sys.argv[1], int(sys.argv[2])
    limit = size_mb * 1024 * 1024
    st = STFile(path)
    shards: list[dict] = [{}]
    sizes = [0]
    dtypes: list[dict] = [{}]
    for name in st.keys():
        t = st.get_tensor(name)
        if sizes[-1] + t.nbytes > limit and shards[-1]:
            shards.append({})
            sizes.append(0)
            dtypes.append({})
        shards[-1][name] = t
        if st.get_dtype(name) == "BF16":
            dtypes[-1][name] = "BF16"
        sizes[-1] += t.nbytes

    base = path[:-len(".safetensors")]
    n = len(shards)
    index = {"metadata": {"total_size": sum(sizes)}, "weight_map": {}}
    for i, (shard, dt) in enumerate(zip(shards, dtypes)):
        fn = f"{base}-{i + 1:05d}-of-{n:05d}.safetensors"
        write_safetensors(fn, shard, dtypes=dt)
        for name in shard:
            index["weight_map"][name] = os.path.basename(fn)
        print(f" -- wrote {fn} ({sizes[i] / 1e6:.1f} MB)")
    with open(base + ".safetensors.index.json", "w") as f:
        json.dump(index, f, indent=2)
    st.close()


if __name__ == "__main__":
    main()
