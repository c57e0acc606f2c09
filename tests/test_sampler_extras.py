"""Sampler completeness: token_bias, top-prob returns, post-sampling
hooks, prefix-dict healing, defrag relocation."""

import pytest as _pytest

pytestmark = _pytest.mark.slow

import numpy as np
import pytest

from exllamav2_tpu.cache_paged import PagedKVCache
from exllamav2_tpu.generator.dynamic import DynamicGenerator, DynamicJob
from exllamav2_tpu.generator.sampler import Settings
from exllamav2_tpu.models.model import Model
from exllamav2_tpu.tokenizer import ByteTokenizer
from exllamav2_tpu.utils.testing import make_tiny_llama


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    d = tmp_path_factory.mktemp("sx_model")
    make_tiny_llama(str(d), quant=None, seed=15, vocab=384, max_pos=4096)
    return Model.from_dir(str(d))


def _gen(model, pages=32):
    cache = PagedKVCache.alloc(
        model.static.num_layers, pages, model.static.num_kv_heads,
        model.static.head_dim, "bf16")
    return DynamicGenerator(model, cache, ByteTokenizer(384),
                            max_batch_size=4)


def test_token_bias_forces_token(model):
    """A +inf-ish bias on one token must make greedy pick it
    (ref sampler.py:471-477 token_bias)."""
    gen = _gen(model)
    bias = np.zeros(384, np.float32)
    bias[65] = 1e4                       # 'A'
    sett = Settings.greedy()
    sett.token_bias = bias
    job = DynamicJob(np.array([3, 7, 11], np.int32), max_new_tokens=4,
                     settings=sett)
    gen.enqueue(job)
    toks = []
    while job.status != "done":
        for r in gen.iterate():
            if r["stage"] == "streaming":
                toks += list(r["token_ids"])
    assert all(int(t) == 65 for t in toks), toks


def test_return_probs_and_top_tokens(model):
    gen = _gen(model)
    job = DynamicJob(np.array([3, 7, 11], np.int32), max_new_tokens=3,
                     settings=Settings.greedy(), return_probs=True,
                     return_top_tokens=4)
    gen.enqueue(job)
    got_probs = got_top = False
    while job.status != "done":
        for r in gen.iterate():
            if r["stage"] != "streaming":
                continue
            if "token_probs" in r:
                got_probs = True
                assert 0.0 <= float(r["token_probs"][0]) <= 1.0
            if "top_k_tokens" in r:
                got_top = True
                assert r["top_k_tokens"].shape[-1] == 4
                # greedy: sampled token must be the top candidate
                assert int(r["top_k_tokens"][0, 0]) == int(r["token_ids"][0])
    assert got_probs and got_top


def test_post_sampling_hook(model):
    gen = _gen(model)
    seen = []

    def hook(res):
        seen.append(res.sampled_token)

    job = DynamicJob(np.array([3, 7, 11], np.int32), max_new_tokens=3,
                     settings=Settings.greedy(),
                     post_sampling_hooks=[hook])
    gen.enqueue(job)
    while job.status != "done":
        gen.iterate()
    assert len(seen) == 3 and all(isinstance(t, int) for t in seen)


def test_prefix_ids_binary_search():
    tok = ByteTokenizer(384)
    ids = tok.prefix_ids("a")
    assert set(ids.tolist()) == {ord("a")}
    # char trie agrees
    trie = tok.get_char_trie()
    node = trie[0]["a"]
    assert ord("a") in node[1]


def test_defrag_relocates_chain(model):
    """After fragmentation, defrag must rotate pages so a cached chain
    stays reusable (cache_rotate analog, ref dynamic.py:1350-1478)."""
    gen = _gen(model, pages=16)
    sett = Settings.greedy()
    # long prompt -> multi-page chain that stays in the unreferenced pool
    base = np.arange(300, dtype=np.int32) % 200
    out1 = gen.generate(base, max_new_tokens=4, settings=sett)
    # churn with different prompts to fragment the pool
    for s in range(3):
        gen.generate(np.arange(80, dtype=np.int32) + 10 * s,
                     max_new_tokens=4, settings=sett)
    if hasattr(gen, "defrag"):
        gen.defrag()
    # the original chain must still dedup-hit (cached tokens > 0)
    job = DynamicJob(base, max_new_tokens=4, settings=sett)
    gen.enqueue(job)
    done = None
    while job.status != "done":
        for r in gen.iterate():
            if r["stage"] == "streaming" and r["eos"]:
                done = r
    assert done is not None and done["cached_tokens"] >= gen.page_size
