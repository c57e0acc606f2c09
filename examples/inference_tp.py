"""Tensor-parallel serving example (reference examples/inference_tp.py).

Shards the model + paged KV cache over a (dp=1, tp=N) mesh; the
generator automatically uses the fused shard_map path when the
checkpoint layout allows it, else GSPMD. On a single-chip box, pass
--virtual to demo with N virtual CPU devices.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ap = argparse.ArgumentParser()
ap.add_argument("-m", "--model_dir", required=True)
ap.add_argument("--tp", type=int, default=0, help="0 = all devices")
ap.add_argument("--virtual", action="store_true",
                help="use virtual CPU devices (demo on one chip)")
args = ap.parse_args()

if args.virtual:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402
from exllamav2_tpu.cache_paged import PagedKVCache  # noqa: E402
from exllamav2_tpu.generator.dynamic import DynamicGenerator  # noqa: E402
from exllamav2_tpu.generator.sampler import Settings  # noqa: E402
from exllamav2_tpu.models.model import Model  # noqa: E402
from exllamav2_tpu.parallel.sharding import make_mesh  # noqa: E402
from exllamav2_tpu.tokenizer import load_tokenizer  # noqa: E402

devices = jax.devices("cpu") if args.virtual else jax.devices()
tp = args.tp or len(devices)
mesh = make_mesh(tp, dp=1, devices=devices[:tp])

model = Model.from_dir(args.model_dir)
tokenizer = load_tokenizer(args.model_dir)
cache = PagedKVCache.alloc(model.static.num_layers, 64,
                           model.static.num_kv_heads,
                           model.static.head_dim, "bf16")
gen = DynamicGenerator(model, cache, tokenizer, mesh=mesh)
print(f"TP={tp} fused={gen._tp_fused}")
print(gen.generate("The tensor-parallel answer is", max_new_tokens=80,
                   settings=Settings(temperature=0.7),
                   completion_only=False))
