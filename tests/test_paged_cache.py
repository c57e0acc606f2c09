"""KV quantization + paged cache/attention tests."""

import pytest as _pytest

pytestmark = _pytest.mark.slow

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from exllamav2_tpu.ops import kvquant as KQ
from exllamav2_tpu.cache_paged import PagedKVCache


def test_hadamard_involution():
    h = np.asarray(KQ.hadamard32())
    assert np.allclose(h @ h, 32 * np.eye(32))


@pytest.mark.parametrize("kind,tol", [("fp8", 0.15), ("q8", 0.02),
                                      ("q4", 0.25), ("bf16", 0.01)])
def test_kvquant_roundtrip(kind, tol):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 8, 128)) * 0.3, jnp.float32)
    data, scales = KQ.kv_quant(x, kind)
    y = KQ.kv_dequant(data, scales, kind, jnp.float32)
    err = np.abs(np.asarray(y) - np.asarray(x))
    rel = err.max() / np.abs(np.asarray(x)).max()
    assert rel < tol, (kind, rel)


def test_kvquant_q4_outlier_protection():
    """Hadamard rotation spreads a single outlier across the group."""
    x = np.zeros((1, 1, 128), np.float32)
    x[0, 0, 5] = 10.0
    x[0, 0, :32] += np.random.default_rng(1).standard_normal(32) * 0.01
    xj = jnp.asarray(x)
    data, scales = KQ.kv_quant(xj, "q4")
    y = np.asarray(KQ.kv_dequant(data, scales, "q4", jnp.float32))
    assert abs(y[0, 0, 5] - 10.0) < 0.6


def _mk_cache(kind, pages=8, layers=2, heads=2, hd=128):
    return PagedKVCache.alloc(layers, pages, heads, hd, kind)


@pytest.mark.parametrize("kind", ["bf16", "q4", "q8", "q6", "fp8"])
def test_paged_append_gather(kind):
    rng = np.random.default_rng(2)
    cache = _mk_cache(kind)
    k = jnp.asarray(rng.standard_normal((2, 3, 2, 128)) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((2, 3, 2, 128)) * 0.3, jnp.bfloat16)
    bt = jnp.asarray([[0, 1], [2, 3]], jnp.int32)     # 2 seqs, 2 pages each
    seqlens = jnp.asarray([0, 5], jnp.int32)
    cache = cache.append(0, bt, seqlens, k, v)
    gk, gv = cache.gather_layer(0, bt)                 # [B, H, S, D]
    gk = np.asarray(gk, np.float32).transpose(0, 2, 1, 3)   # [B, S, H, D]
    tol = {"bf16": 0.02, "q8": 0.02, "q6": 0.02, "q4": 0.2, "fp8": 0.1}[kind]
    ref = np.asarray(k, np.float32)
    assert np.abs(gk[0, 0:3] - ref[0]).max() < tol
    assert np.abs(gk[1, 5:8] - ref[1]).max() < tol
    # untouched rows stay zero
    assert np.abs(gk[0, 3:]).max() == 0.0


def test_copy_pages():
    rng = np.random.default_rng(3)
    cache = _mk_cache("bf16")
    k = jnp.asarray(rng.standard_normal((1, 4, 2, 128)), jnp.bfloat16)
    bt = jnp.asarray([[0, 1]], jnp.int32)
    cache = cache.append(0, bt, jnp.asarray([0]), k, k)
    cache = cache.copy_pages(jnp.asarray([0]), jnp.asarray([5]))
    bt2 = jnp.asarray([[5, 1]], jnp.int32)
    gk, _ = cache.gather_layer(0, bt2)                 # [B, H, S, D]
    got = np.asarray(gk, np.float32).transpose(0, 2, 1, 3)[0, :4]
    assert np.abs(got - np.asarray(k[0], np.float32)).max() < 0.02


def test_paged_forward_matches_linear():
    """Full paged forward (bf16 cache) == linear-cache forward."""
    from exllamav2_tpu.utils.testing import make_tiny_llama
    from exllamav2_tpu.models.model import Model
    from exllamav2_tpu.models.forward import model_forward_paged
    import tempfile

    d = make_tiny_llama(tempfile.mkdtemp(), quant=None, seed=31)
    m = Model.from_dir(d)
    ids = np.array([[3, 17, 200, 9, 55]], np.int32)

    lin_cache = m.new_cache(batch=1, max_seq=512)
    ref_logits, _ = m.forward(ids, lin_cache, 0)

    cache = PagedKVCache.alloc(m.static.num_layers, 4,
                               m.static.num_kv_heads, m.static.head_dim,
                               "bf16")
    bt = jnp.asarray([[0, 1]], jnp.int32)
    logits, cache = model_forward_paged(
        m.weights, m.static, jnp.asarray(ids), cache, bt,
        jnp.asarray([0], jnp.int32))
    err = np.abs(np.asarray(logits) - np.asarray(ref_logits)).max()
    assert err < 0.05, err

    # decode one token on top, compare against linear-cache decode
    lin_cache2 = m.new_cache(batch=1, max_seq=512)
    _, lin_cache2 = m.forward(ids, lin_cache2, 0)
    nxt = np.array([[42]], np.int32)
    ref2, _ = m.forward(nxt, lin_cache2, 5)
    log2, cache = model_forward_paged(
        m.weights, m.static, jnp.asarray(nxt), cache, bt,
        jnp.asarray([5], jnp.int32))
    err2 = np.abs(np.asarray(log2) - np.asarray(ref2)).max()
    assert err2 < 0.05, err2


def test_paged_forward_q4_close():
    from exllamav2_tpu.utils.testing import make_tiny_llama
    from exllamav2_tpu.models.model import Model
    from exllamav2_tpu.models.forward import model_forward_paged
    import tempfile

    d = make_tiny_llama(tempfile.mkdtemp(), quant=None, seed=32)
    m = Model.from_dir(d)
    ids = np.array([[3, 17, 200, 9, 55, 123, 42, 7]], np.int32)
    lin_cache = m.new_cache(batch=1, max_seq=512)
    ref_logits, _ = m.forward(ids, lin_cache, 0)

    cache = PagedKVCache.alloc(m.static.num_layers, 4,
                               m.static.num_kv_heads, m.static.head_dim,
                               "q4")
    bt = jnp.asarray([[0, 1]], jnp.int32)
    logits, _ = model_forward_paged(
        m.weights, m.static, jnp.asarray(ids), cache, bt,
        jnp.asarray([0], jnp.int32))
    ref = np.asarray(ref_logits)
    rel = np.abs(np.asarray(logits) - ref).max() / np.abs(ref).max()
    assert rel < 0.2, rel


def test_kvquant_odd_head_dims():
    """head_dims not divisible by 32 use a smaller Hadamard group
    (Paley-I 20/24 or Sylvester 16) — quant/dequant must roundtrip
    (the reference ships stored Paley tables for this, hadamard.py)."""
    rng = np.random.default_rng(7)
    for d, g in ((80, 20), (112, 16), (100, 20), (72, 24)):
        assert KQ.group_for(d) == g
        x = jnp.asarray(rng.standard_normal((3, 5, d)), jnp.float32)
        for kind, tol in (("q4", 0.25), ("q8", 0.02)):
            data, sc = KQ.kv_quant(x, kind)
            assert sc.shape[-1] == d // g
            y = np.asarray(KQ.kv_dequant(data, sc, kind, jnp.float32))
            err = (np.abs(y - np.asarray(x)).max()
                   / np.abs(np.asarray(x)).max())
            assert err < tol, (d, kind, err)


def test_paged_cache_odd_head_dim_append():
    """Paged Q4 cache at head_dim 80 (fallback attention path)."""
    rng = np.random.default_rng(8)
    cache = PagedKVCache.alloc(1, 4, 2, 80, "q4", page_size=16)
    k = jnp.asarray(rng.standard_normal((1, 3, 2, 80)) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, 3, 2, 80)) * 0.3, jnp.bfloat16)
    bt = jnp.asarray([[0, 1]], jnp.int32)
    cache = cache.append(0, bt, jnp.asarray([0], jnp.int32), k, v)
    gk, _ = cache.gather_layer(0, bt)
    gk = np.asarray(gk, np.float32).transpose(0, 2, 1, 3)
    assert np.abs(gk[0, 0:3] - np.asarray(k, np.float32)[0]).max() < 0.2
