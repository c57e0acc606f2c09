"""Data-parallel serving: dp independent fused-TP replicas over submeshes.

Each replica runs the fused shard_map TP program on its own slice of
the device grid; a host dispatcher balances jobs (see
docs/DESIGN.md "dp is replicas, not a batch axis").

    python examples/inference_dp.py -m <model_dir> -dp 2 [-tp 2]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    from exllamav2_tpu import model_init
    model_init.add_args(ap)
    ap.add_argument("-dp", type=int, default=2)
    ap.add_argument("-tp", type=int, default=None)
    args = ap.parse_args()

    import jax
    from exllamav2_tpu.models.model import Model
    from exllamav2_tpu.tokenizer import load_tokenizer
    from exllamav2_tpu.parallel.dp_server import DataParallelGenerator
    from exllamav2_tpu.generator.sampler import Settings

    model = Model.from_dir(args.model_dir)
    tokenizer = load_tokenizer(args.model_dir)
    devices = jax.devices()
    if len(devices) < args.dp * (args.tp or 1):
        devices = jax.devices("cpu")     # virtual mesh fallback
    gen = DataParallelGenerator(
        model, tokenizer, num_pages=64, dp=args.dp, tp=args.tp,
        devices=devices, cache_kind=model_init.cache_kind(args))
    print(f" -- {args.dp} replicas, fused={gen.tp_fused}")

    prompts = [
        "Once upon a time",
        "The capital of France is",
        "def fibonacci(n):",
        "In a shocking turn of events,",
    ]
    outs = gen.generate(prompts, max_new_tokens=64,
                        settings=Settings(temperature=0.7))
    for p, o in zip(prompts, outs):
        print(f"\n>> {p}\n{o}")


if __name__ == "__main__":
    main()
