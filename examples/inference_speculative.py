"""Speculative decoding examples: n-gram and draft-model
(reference examples/inference_speculative.py analog)."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exllamav2_tpu import model_init  # noqa: E402
from exllamav2_tpu.cache_paged import PagedKVCache  # noqa: E402
from exllamav2_tpu.generator.dynamic import DynamicGenerator  # noqa: E402
from exllamav2_tpu.generator.sampler import Settings  # noqa: E402
from exllamav2_tpu.models.model import Model  # noqa: E402
from exllamav2_tpu.tokenizer import load_tokenizer  # noqa: E402

ap = argparse.ArgumentParser()
model_init.add_args(ap)
ap.add_argument("-dm", "--draft_model_dir", default=None,
                help="optional small draft model; omit for n-gram drafting")
args = ap.parse_args()

model = Model.from_dir(args.model_dir)
tokenizer = load_tokenizer(args.model_dir)
pages = 64

cache = PagedKVCache.alloc(model.static.num_layers, pages,
                           model.static.num_kv_heads,
                           model.static.head_dim, "bf16")
if args.draft_model_dir:
    draft = Model.from_dir(args.draft_model_dir)
    dcache = PagedKVCache.alloc(draft.static.num_layers, pages,
                                draft.static.num_kv_heads,
                                draft.static.head_dim, "bf16")
    gen = DynamicGenerator(model, cache, tokenizer, draft_model=draft,
                           draft_cache=dcache, num_draft_tokens=4)
else:
    gen = DynamicGenerator(model, cache, tokenizer, use_ngram_draft=True)

prompt = "Here is a list of the first 20 prime numbers: 2, 3, 5,"
t0 = time.perf_counter()
out = gen.generate(prompt, max_new_tokens=200, settings=Settings.greedy())
dt = time.perf_counter() - t0
print(prompt + out)
print(f"\n -- {200 / dt:.1f} t/s with speculative decoding")
