"""Filters, token healing, banned strings, DRY, async wrapper tests."""

import pytest as _pytest

pytestmark = _pytest.mark.slow

import asyncio

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from exllamav2_tpu.cache_paged import PagedKVCache
from exllamav2_tpu.generator.dynamic import DynamicGenerator, DynamicJob
from exllamav2_tpu.generator.filters.prefix import PrefixFilter
from exllamav2_tpu.generator.filters.select import SelectFilter
from exllamav2_tpu.generator.sampler import Settings
from exllamav2_tpu.models.model import Model
from exllamav2_tpu.tokenizer import ByteTokenizer
from exllamav2_tpu.utils.testing import make_tiny_llama


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    d = tmp_path_factory.mktemp("cons_model")
    make_tiny_llama(str(d), quant="exl2", seed=5, vocab=384, max_pos=4096)
    return Model.from_dir(str(d))


TK = ByteTokenizer(384)


def _gen(model, **kw):
    cache = PagedKVCache.alloc(model.static.num_layers, 32,
                               model.static.num_kv_heads,
                               model.static.head_dim, "bf16")
    return DynamicGenerator(model, cache, TK, max_batch_size=8, **kw)


def _run(gen, job):
    gen.enqueue(job)
    while job.status != "done":
        gen.iterate()
    return job


def test_select_filter(model):
    gen = _gen(model)
    job = _run(gen, DynamicJob(
        TK.encode("pick: "), max_new_tokens=20,
        settings=Settings.greedy(),
        filters=[SelectFilter(TK, ["apple", "banana", "cherry"])]))
    assert job.emitted_text in ("apple", "banana", "cherry")
    assert job.eos_reason == "end_filter"


def test_prefix_filter(model):
    gen = _gen(model)
    job = _run(gen, DynamicJob(
        TK.encode("x"), max_new_tokens=12,
        settings=Settings.greedy(),
        filters=[PrefixFilter(TK, "hello")]))
    assert job.emitted_text.startswith("hello")


def test_token_healing(model):
    gen = _gen(model)
    job = _run(gen, DynamicJob(
        TK.encode("abcq"), max_new_tokens=4,
        settings=Settings.greedy(), token_healing=True))
    # healed first token must extend the removed last prompt token 'q' —
    # for a byte tokenizer the only such token is 'q' itself
    assert job.sequence[3] == ord("q")


def test_banned_strings(model):
    gen = _gen(model)
    free = _run(gen, DynamicJob(TK.encode("abc"), max_new_tokens=10,
                                settings=Settings.greedy()))
    if len(free.emitted_text) >= 2:
        banned = free.emitted_text[:2]
        gen2 = _gen(model)
        job = _run(gen2, DynamicJob(
            TK.encode("abc"), max_new_tokens=10,
            settings=Settings.greedy(), banned_strings=[banned]))
        assert banned.lower() not in job.emitted_text.lower()


def test_banned_tokens_setting(model):
    gen = _gen(model)
    free = _run(gen, DynamicJob(TK.encode("hi"), max_new_tokens=6,
                                settings=Settings.greedy()))
    first = int(free.sequence[2])
    gen2 = _gen(model)
    s = Settings.greedy()
    s.banned_tokens = [first]
    job = _run(gen2, DynamicJob(TK.encode("hi"), max_new_tokens=6,
                                settings=s))
    assert int(job.sequence[2]) != first


def test_dry_penalty_device():
    from exllamav2_tpu.ops.sampling import apply_dry
    v = 64
    # sequence with a repeated bigram: ... 5 6 ... 5 6, next-after was 7
    seq = np.array([[1, 5, 6, 7, 2, 3, 5, 6]], np.int32)
    logits = jnp.zeros((1, v), jnp.float32)
    out = apply_dry(
        logits, jnp.asarray(seq), jnp.asarray([8]),
        multiplier=jnp.asarray([2.0]), base=jnp.asarray([1.75]),
        allowed_length=jnp.asarray([2]), dry_range=jnp.asarray([0]),
        breakers=jnp.full((1, 4), -1, jnp.int32))
    out = np.asarray(out)[0]
    assert out[7] < 0.0          # token 7 extended the repeat before
    assert out[9] == 0.0         # unrelated token untouched


def test_dry_in_generator(model):
    gen = _gen(model)
    s = Settings.greedy()
    s.dry_multiplier = 1.5
    job = _run(gen, DynamicJob(TK.encode("ababababab"), max_new_tokens=8,
                               settings=s))
    assert job.new_tokens == 8   # runs without error


def test_async_wrapper(model):
    from exllamav2_tpu.generator.dynamic_async import (
        DynamicGeneratorAsync, DynamicJobAsync)

    async def main():
        gen = DynamicGeneratorAsync(_gen(model))
        job = DynamicJobAsync(gen, TK.encode("async test"),
                              max_new_tokens=5, settings=Settings.greedy())
        await gen.enqueue(job)
        texts = []
        async for r in job:
            texts.append(r.get("text", ""))
        await gen.close()
        return "".join(texts)

    out = asyncio.run(main())
    assert isinstance(out, str)
