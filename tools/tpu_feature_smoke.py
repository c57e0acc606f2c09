"""Real-TPU smokes: ngram + draft-model speculative decoding, CFG,
quantized-cache serving — features whose only prior evidence was
CPU/interpret mode."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
from exllamav2_tpu.utils.testing import random_model_weights
from exllamav2_tpu.cache_paged import PagedKVCache
from exllamav2_tpu.generator.dynamic import DynamicGenerator, DynamicJob
from exllamav2_tpu.generator.sampler import Settings
from exllamav2_tpu.models.model import Model
from exllamav2_tpu.tokenizer import ByteTokenizer

w, st = random_model_weights(vocab=512, hidden=256, layers=2, heads=4,
                             kv_heads=4, inter=512, max_seq=2048, seed=0,
                             bits=4)
model = Model(w, st)
dw, dst = random_model_weights(vocab=512, hidden=128, layers=1, heads=4,
                               kv_heads=4, inter=256, max_seq=2048, seed=1,
                               bits=4)
draft = Model(dw, dst)
tk = ByteTokenizer(512)


def cache(kind="bf16"):
    return PagedKVCache.alloc(st.num_layers, 16, st.num_kv_heads,
                              st.head_dim, kind)


def dcache():
    return PagedKVCache.alloc(dst.num_layers, 16, dst.num_kv_heads,
                              dst.head_dim, "bf16")


t0 = time.perf_counter()
base = DynamicGenerator(model, cache(), tk).generate(
    "the speculative check", max_new_tokens=16, settings=Settings.greedy())
print(f"plain ok ({time.perf_counter()-t0:.0f}s)", flush=True)

g = DynamicGenerator(model, cache(), tk, use_ngram_draft=True)
out = g.generate("the speculative check", max_new_tokens=16,
                 settings=Settings.greedy())
assert out == base, (out, base)
print("ngram spec ok (greedy-equal)", flush=True)

g = DynamicGenerator(model, cache(), tk, draft_model=draft,
                     draft_cache=dcache(), num_draft_tokens=3)
out = g.generate("the speculative check", max_new_tokens=16,
                 settings=Settings.greedy())
assert out == base, (out, base)
print("draft-model spec ok (greedy-equal)", flush=True)

s = Settings.greedy()
s.cfg_scale = 1.5
g = DynamicGenerator(model, cache(), tk)
job = g.enqueue(DynamicJob(tk.encode("cfg check"), max_new_tokens=8,
                           settings=s,
                           negative_prompt_ids=tk.encode("negative")))
while job.status != "done":
    g.iterate()
assert job.new_tokens == 8
print("cfg ok", flush=True)

for kind in ("q4", "q8", "q6", "fp8"):
    out = DynamicGenerator(model, cache(kind), tk).generate(
        "quant cache", max_new_tokens=8, settings=Settings.greedy())
    assert len(out) > 0
    print(f"{kind} cache serving ok", flush=True)
print("ALL TPU FEATURE SMOKES PASSED", flush=True)
