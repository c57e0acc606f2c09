"""Paged flash-decode kernel path (head_dim=128) vs linear-cache greedy."""

import numpy as np
import pytest

from exllamav2_tpu.cache_paged import PagedKVCache
from exllamav2_tpu.generator.dynamic import DynamicGenerator
from exllamav2_tpu.generator.sampler import Settings
from exllamav2_tpu.models.model import Model
from exllamav2_tpu.tokenizer import ByteTokenizer
from exllamav2_tpu.utils.testing import make_tiny_llama


@pytest.fixture(scope="module")
def model128(tmp_path_factory):
    d = tmp_path_factory.mktemp("hd128")
    # hidden 256 / 2 heads -> head_dim 128 (kernel-eligible), GQA 2:1
    make_tiny_llama(str(d), quant="exl2", seed=9, vocab=384, hidden=256,
                    heads=2, kv_heads=1, inter=512, max_pos=4096,
                    head_scale=6.0)
    return Model.from_dir(str(d))


def test_kernel_path_matches_model(model128):
    model = model128
    assert model.static.head_dim == 128
    tk = ByteTokenizer(384)
    cache = PagedKVCache.alloc(model.static.num_layers, 16,
                               model.static.num_kv_heads,
                               model.static.head_dim, "bf16")
    gen = DynamicGenerator(model, cache, tk)
    out = gen.generate("hello there friend", max_new_tokens=12,
                       settings=Settings.greedy())
    ids = tk.encode("hello there friend")
    ref = model.generate_greedy(ids[None], 12, max_seq=256)
    ref_text = tk.decode(ref[0, len(ids):])
    assert out == ref_text


def test_kernel_path_batch(model128):
    model = model128
    tk = ByteTokenizer(384)
    cache = PagedKVCache.alloc(model.static.num_layers, 32,
                               model.static.num_kv_heads,
                               model.static.head_dim, "bf16")
    gen = DynamicGenerator(model, cache, tk, max_batch_size=4)
    prompts = ["abc", "defdefdef", "xy"]
    outs = gen.generate(prompts, max_new_tokens=8,
                        settings=Settings.greedy())
    for p, o in zip(prompts, outs):
        g2 = DynamicGenerator(model, PagedKVCache.alloc(
            model.static.num_layers, 16, model.static.num_kv_heads,
            model.static.head_dim, "bf16"), tk)
        assert g2.generate(p, max_new_tokens=8,
                           settings=Settings.greedy()) == o, p
