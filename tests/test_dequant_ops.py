"""TPU plane layout + jnp dequant ops vs the numpy golden codecs."""

import numpy as np
import pytest

from exllamav2_tpu.quant import formats as F
from exllamav2_tpu.quant import qtensor as Q
from exllamav2_tpu.ops import dequant as D

import jax.numpy as jnp


@pytest.mark.parametrize("bits", [1, 2, 3, 4, 5, 6, 8])
def test_plane_pack_roundtrip_numpy(bits):
    rng = np.random.default_rng(bits)
    rows, n = 512, 128
    v = rng.integers(0, 2 ** bits, size=(rows, n)).astype(np.uint16)
    planes = Q.pack_planes(v, bits)
    assert [p.shape[0] for p in planes] == \
        [rows * bp // 32 for bp in Q.plane_split(bits)]
    out = Q.unpack_planes_np(planes, bits, n)
    np.testing.assert_array_equal(out, v)


@pytest.mark.parametrize("bits", [2, 3, 4, 5, 6, 8])
def test_unpack_planes_jnp(bits):
    rng = np.random.default_rng(bits + 50)
    rows, n = 256, 128
    v = rng.integers(0, 2 ** bits, size=(rows, n)).astype(np.uint16)
    planes = Q.pack_planes(v, bits)
    out = D.unpack_planes([jnp.asarray(p) for p in planes],
                          Q.plane_split(bits))
    np.testing.assert_array_equal(np.asarray(out), v)


def test_fp16_round_matches_numpy():
    rng = np.random.default_rng(0)
    x = np.concatenate([
        rng.random(512).astype(np.float32) * 0.1,
        rng.random(512).astype(np.float32) * 1e-5,   # fp16 subnormal range
        rng.random(512).astype(np.float32) * 100,
    ]).reshape(12, 128)
    got = np.asarray(D.fp16_round(jnp.asarray(x)))
    expect = x.astype(np.float16).astype(np.float32)
    np.testing.assert_array_equal(got, expect)


@pytest.mark.parametrize("bits", [2, 3, 4, 5, 6, 8])
def test_exl2_segment_dequant(bits):
    rng = np.random.default_rng(bits + 10)
    k, n, gs = 224, 128, 32
    w = rng.standard_normal((k, n)).astype(np.float32)
    t = F.exl2_pack(w, [bits] * (-(-k // gs)), group_rows=gs)
    golden = F.exl2_dequantize(t)

    ql = Q.from_exl2(t)
    assert len(ql.segments) == 1
    got = np.asarray(D.dequant_linear(ql, dtype=jnp.float32))
    np.testing.assert_allclose(got[:, :n], golden, rtol=1e-3, atol=1e-6)


def test_exl2_mixed_segments_dequant():
    rng = np.random.default_rng(42)
    k, n = 10 * 32, 64
    w = rng.standard_normal((k, n)).astype(np.float32)
    bits_per_group = [8, 8, 6, 6, 5, 4, 4, 3, 2, 2]
    t = F.exl2_pack(w, bits_per_group, group_rows=32)
    golden = F.exl2_dequantize(t)
    ql = Q.from_exl2(t)
    assert ql.n == 128  # padded to lanes
    got = np.asarray(D.dequant_linear(ql, dtype=jnp.float32))
    np.testing.assert_allclose(got[:, :n], golden, rtol=1e-3, atol=1e-6)
    # padded columns dequantize to exactly zero
    np.testing.assert_array_equal(got[:, n:], 0.0)


def test_exl2_act_order_dequant():
    rng = np.random.default_rng(1)
    k, n = 128, 128
    w = rng.standard_normal((k, n)).astype(np.float32)
    perm = rng.permutation(k)
    invperm = np.argsort(perm)
    t = F.exl2_pack(w[perm], [4] * 4, group_rows=32, invperm=invperm)
    golden = F.exl2_dequantize(t, original_order=True)
    ql = Q.from_exl2(t)
    got = np.asarray(D.dequant_linear(ql, dtype=jnp.float32, original_order=True))
    np.testing.assert_allclose(got, golden, rtol=1e-3, atol=1e-6)


@pytest.mark.parametrize("bits", [2, 3, 4, 8])
def test_gptq_dequant(bits):
    rng = np.random.default_rng(bits)
    k, n, gs = 256, 128, 128
    g = k // gs
    maxq = 2 ** bits - 1
    q = rng.integers(0, maxq + 1, size=(k, n)).astype(np.uint16)
    zeros = np.full((g, n), (maxq + 1) // 2, dtype=np.uint16)
    scales = rng.random((g, n)).astype(np.float32) * 0.1 + 0.01
    t = F.gptq_pack(q, zeros, scales, bits=bits)
    golden = F.gptq_dequantize(t)
    ql = Q.from_gptq(t)
    got = np.asarray(D.dequant_linear(ql, dtype=jnp.float32))
    np.testing.assert_allclose(got[:, :n], golden, rtol=1e-3, atol=1e-7)


def test_gptq_act_order_dequant():
    """g_idx reordering + activation perm reproduces the original matrix."""
    rng = np.random.default_rng(9)
    k, n, gs = 128, 128, 32
    g = k // gs
    q = rng.integers(0, 16, size=(k, n)).astype(np.uint16)
    zeros = np.full((g, n), 8, dtype=np.uint16)
    scales = rng.random((g, n)).astype(np.float32) * 0.1 + 0.01
    perm = rng.permutation(k)
    g_idx = (np.argsort(perm) // gs).astype(np.int32)
    t = F.gptq_pack(q, zeros, scales, bits=4, g_idx=g_idx)
    golden = F.gptq_dequantize(t)
    ql = Q.from_gptq(t)
    got = np.asarray(D.dequant_linear(ql, dtype=jnp.float32, original_order=True))
    np.testing.assert_allclose(got[:, :n], golden, rtol=1e-3, atol=1e-7)
