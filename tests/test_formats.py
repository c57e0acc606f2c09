"""Golden tests for the EXL2 / GPTQ numpy codecs.

These validate round-trip consistency and the exact dequant math (zero points,
fp16 scale rounding, act-order permutation semantics) that every accelerated
kernel is later tested against.
"""

import numpy as np
import pytest

from exllamav2_tpu.quant import formats as F


@pytest.mark.parametrize("bits", [2, 3, 4, 5, 6, 8])
def test_bitstream_roundtrip(bits):
    rng = np.random.default_rng(bits)
    rows, n = 96, 64
    v = rng.integers(0, 2 ** bits, size=(rows, n)).astype(np.uint16)
    packed = F.pack_bitstream(v, bits)
    assert packed.dtype == np.int32
    assert packed.shape == (-(-(rows * bits) // 32), n)
    out = F.unpack_bitstream(packed, bits, rows)
    np.testing.assert_array_equal(out, v)


def test_pack_rows_4_roundtrip():
    rng = np.random.default_rng(0)
    g, n = 7, 128
    v = rng.integers(1, 17, size=(g, n)).astype(np.uint16)
    packed = F.pack_rows_4(v)
    assert packed.shape == (g, n // 2 // 4)
    np.testing.assert_array_equal(F.unpack_rows_4(packed, n), v)


@pytest.mark.parametrize("bits", [2, 3, 4, 5, 6, 8])
def test_exl2_uniform_roundtrip(bits):
    """RTN quantize -> pack -> dequantize reproduces the quantized values."""
    rng = np.random.default_rng(bits)
    k, n = 256, 64
    gs = 32
    w = rng.standard_normal((k, n)).astype(np.float32)
    t = F.exl2_pack(w, [bits] * (k // gs), group_rows=gs)

    # segments should merge into one run
    segs = t.segments()
    assert len(segs) == 1
    assert segs[0].bits == bits and segs[0].rows == k

    deq = F.exl2_dequantize(t)
    # RTN error is bounded by ~scale/2 per element, plus clamping loss at the
    # range edges when the sqrt-encoded 4-bit scale rounds below base_scale
    # (up to ~13% relative on the largest elements).
    scales = F.exl2_decode_scales(t.q_scale, t.q_scale_max, n)
    gi = np.arange(k) // gs
    bound = scales[gi] * 0.51 + 0.15 * np.abs(w) + 1e-6
    assert np.all(np.abs(deq - w) <= bound)
    assert np.abs(deq - w).mean() < scales.mean()


def test_exl2_mixed_bitwidths():
    """A matrix mixing 8/4/3/2-bit groups parses into correct segments."""
    rng = np.random.default_rng(7)
    k, n = 8 * 32, 32
    w = rng.standard_normal((k, n)).astype(np.float32)
    bits_per_group = [8, 8, 4, 4, 4, 3, 2, 2]
    t = F.exl2_pack(w, bits_per_group, group_rows=32)
    segs = t.segments()
    assert [s.bits for s in segs] == [8, 4, 3, 2]
    assert [s.rows for s in segs] == [64, 96, 32, 64]
    assert [s.groups for s in segs] == [2, 3, 1, 2]
    assert sum(s.qrows for s in segs) == t.q_weight.shape[0]

    deq = F.exl2_dequantize(t)
    assert deq.shape == (k, n)
    # 8-bit rows should be much more accurate than 2-bit rows
    err8 = np.abs(deq[:64] - w[:64]).mean()
    err2 = np.abs(deq[-64:] - w[-64:]).mean()
    assert err8 < err2 / 4


def test_exl2_short_trailing_group():
    """K not divisible by the group size: trailing short group is handled."""
    rng = np.random.default_rng(3)
    k, n = 32 * 3 + 16, 32
    w = rng.standard_normal((k, n)).astype(np.float32)
    t = F.exl2_pack(w, [4, 4, 4, 4], group_rows=32)
    deq = F.exl2_dequantize(t)
    assert deq.shape == (k, n)
    assert np.abs(deq - w).mean() < 0.2


def test_exl2_act_order():
    """Stored rows are permuted; dequantize restores original order."""
    rng = np.random.default_rng(11)
    k, n = 128, 32
    w = rng.standard_normal((k, n)).astype(np.float32)
    perm = rng.permutation(k)
    invperm = np.argsort(perm)
    t = F.exl2_pack(w[perm], [4] * 4, group_rows=32, invperm=invperm)
    deq = F.exl2_dequantize(t, original_order=True)
    deq_stored = F.exl2_dequantize(t, original_order=False)
    # stored row j holds original row perm[j]  =>  deq == deq_stored[invperm]
    np.testing.assert_array_equal(deq, deq_stored[invperm])
    # original-order dequant approximates the original-order weight
    assert np.abs(deq - w).mean() < 0.2
    # stored-order dequant approximates the permuted weight
    assert np.abs(deq_stored - w[perm]).mean() < 0.2


def test_exl2_scale_decode_fp16_semantics():
    """Scale = fp16((qs+1)^2 * max/256) exactly (qdq_util.cuh:24-31)."""
    qs = np.arange(1, 17, dtype=np.uint16)[None, :].repeat(2, 0)
    smax = np.array([0.037, 1.5], dtype=np.float16)
    scales = F.exl2_decode_scales(F.pack_rows_4(qs), smax, 16)
    expect = (np.float16(qs.astype(np.float32) ** 2)
              * (smax.astype(np.float16) / np.float16(256))[:, None])
    np.testing.assert_array_equal(scales, expect.astype(np.float32))


@pytest.mark.parametrize("bits", [2, 3, 4, 8])
def test_gptq_roundtrip(bits):
    rng = np.random.default_rng(bits)
    k, n, gs = 256, 64, 128
    g = k // gs
    maxq = 2 ** bits - 1
    q = rng.integers(0, maxq + 1, size=(k, n)).astype(np.uint16)
    zeros = np.full((g, n), (maxq + 1) // 2, dtype=np.uint16)
    scales = (rng.random((g, n)).astype(np.float32) * 0.1 + 0.01)
    t = F.gptq_pack(q, zeros, scales, bits=bits)
    q2, z2 = F.gptq_unpack(t)
    np.testing.assert_array_equal(q2, q)
    np.testing.assert_array_equal(z2, zeros)
    deq = F.gptq_dequantize(t)
    expect = (q.astype(np.float32) - zeros[np.arange(k) // gs]) \
        * t.scales.astype(np.float32)[np.arange(k) // gs]
    np.testing.assert_allclose(deq, expect, rtol=1e-6)


def test_gptq_act_order_g_idx():
    rng = np.random.default_rng(5)
    k, n, gs = 128, 32, 32
    g = k // gs
    q = rng.integers(0, 16, size=(k, n)).astype(np.uint16)
    zeros = np.full((g, n), 8, dtype=np.uint16)
    scales = rng.random((g, n)).astype(np.float32) * 0.1
    g_idx = rng.integers(0, g, size=(k,)).astype(np.int32)
    t = F.gptq_pack(q, zeros, scales, bits=4, g_idx=g_idx)
    deq = F.gptq_dequantize(t)
    expect = (q.astype(np.float32) - 8.0) * t.scales.astype(np.float32)[g_idx]
    np.testing.assert_allclose(deq, expect, rtol=1e-6)
