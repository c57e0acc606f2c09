"""Perplexity eval + websocket server tests."""

import pytest as _pytest

pytestmark = _pytest.mark.slow

import asyncio
import json

import numpy as np
import pytest

from exllamav2_tpu.cache_paged import PagedKVCache
from exllamav2_tpu.evals import perplexity
from exllamav2_tpu.generator.dynamic import DynamicGenerator
from exllamav2_tpu.models.model import Model
from exllamav2_tpu.server.websocket import WebSocketServer
from exllamav2_tpu.tokenizer import ByteTokenizer
from exllamav2_tpu.utils.testing import make_tiny_llama


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    d = tmp_path_factory.mktemp("eval_model")
    make_tiny_llama(str(d), quant="exl2", seed=5, vocab=384, max_pos=4096)
    return Model.from_dir(str(d))


def test_perplexity_sane(model):
    rng = np.random.default_rng(0)
    rows = rng.integers(0, 256, (3, 128)).astype(np.int32)
    ppl = perplexity(model, rows, cache_kind="bf16")
    assert 1.0 < ppl < 10000.0
    # quantized cache should land close-ish (qcache_eval property)
    ppl_q8 = perplexity(model, rows, cache_kind="q8")
    assert abs(ppl_q8 - ppl) / ppl < 0.1, (ppl, ppl_q8)


def test_perplexity_batched_matches(model):
    rng = np.random.default_rng(1)
    rows = rng.integers(0, 256, (4, 64)).astype(np.int32)
    p1 = perplexity(model, rows, batch=1)
    p2 = perplexity(model, rows, batch=2)
    assert abs(p1 - p2) / p1 < 0.02


def test_websocket_roundtrip(model):
    tk = ByteTokenizer(384)
    cache = PagedKVCache.alloc(model.static.num_layers, 16,
                               model.static.num_kv_heads,
                               model.static.head_dim, "bf16")
    gen = DynamicGenerator(model, cache, tk)
    server = WebSocketServer(gen, ip="127.0.0.1", port=7912)

    async def run():
        import websockets
        async with websockets.serve(server.handler, "127.0.0.1", 7912):
            async with websockets.connect("ws://127.0.0.1:7912") as ws:
                await ws.send(json.dumps({"action": "estimate_token",
                                          "text": "hello"}))
                r = json.loads(await ws.recv())
                assert r["num_tokens"] == 5
                await ws.send(json.dumps({"action": "infer", "text": "ab",
                                          "max_new_tokens": 4}))
                chunks = []
                while True:
                    r = json.loads(await ws.recv())
                    if r.get("response_type") == "chunk":
                        chunks.append(r["chunk"])
                    if r.get("response_type") == "full":
                        return r["response"], "".join(chunks)

    full, streamed = asyncio.run(run())
    assert isinstance(full, str)
    assert streamed == full or full.startswith(streamed)
