"""Fused quantized matmul vs golden dequant + matmul."""

import numpy as np
import pytest
import jax.numpy as jnp

from exllamav2_tpu.quant import formats as F
from exllamav2_tpu.quant import qtensor as Q
from exllamav2_tpu.ops import qmm as M
from exllamav2_tpu.ops import dequant as D


def _exl2_layer(rng, k, n, bits_per_group, gs=32, act_order=False):
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.02
    if act_order:
        perm = rng.permutation(k)
        t = F.exl2_pack(w[perm], bits_per_group, group_rows=gs,
                        invperm=np.argsort(perm))
    else:
        t = F.exl2_pack(w, bits_per_group, group_rows=gs)
    return F.exl2_dequantize(t), Q.from_exl2(t)


@pytest.mark.parametrize("m", [1, 4, 17])
@pytest.mark.parametrize("bits", [2, 4, 5])
def test_qmm_fused_matches_golden(m, bits):
    rng = np.random.default_rng(bits * 100 + m)
    k, n = 256, 128
    golden_w, ql = _exl2_layer(rng, k, n, [bits] * (k // 32))
    x = rng.standard_normal((m, k)).astype(np.float32) * 0.1
    expect = x.astype(np.float32) @ golden_w

    got = np.asarray(M.qmm(jnp.asarray(x), ql, fused=True))[:, :n]
    # bf16 matmul tolerance
    np.testing.assert_allclose(got, expect, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("fused", [True, False])
def test_qmm_mixed_segments(fused):
    rng = np.random.default_rng(0)
    k, n = 256, 128
    golden_w, ql = _exl2_layer(rng, k, n, [8, 8, 4, 4, 3, 3, 2, 2])
    assert len(ql.segments) == 4
    x = rng.standard_normal((3, k)).astype(np.float32) * 0.1
    expect = x @ golden_w
    got = np.asarray(M.qmm(jnp.asarray(x), ql, fused=fused))[:, :n]
    np.testing.assert_allclose(got, expect, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("fused", [True, False])
def test_qmm_act_order(fused):
    rng = np.random.default_rng(1)
    k, n = 256, 128
    golden_w, ql = _exl2_layer(rng, k, n, [4] * 8, act_order=True)
    x = rng.standard_normal((2, k)).astype(np.float32) * 0.1
    expect = x @ golden_w
    got = np.asarray(M.qmm(jnp.asarray(x), ql, fused=fused))[:, :n]
    np.testing.assert_allclose(got, expect, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("fused", [True, False])
def test_qmm_gptq(fused):
    rng = np.random.default_rng(2)
    k, n, gs = 256, 128, 64
    g = k // gs
    maxq = 15
    qv = rng.integers(0, maxq + 1, size=(k, n)).astype(np.uint16)
    zeros = np.full((g, n), 8, dtype=np.uint16)
    scales = rng.random((g, n)).astype(np.float32) * 0.02 + 0.001
    t = F.gptq_pack(qv, zeros, scales, bits=4)
    golden_w = F.gptq_dequantize(t)
    ql = Q.from_gptq(t)
    x = rng.standard_normal((2, k)).astype(np.float32) * 0.1
    expect = x @ golden_w
    got = np.asarray(M.qmm(jnp.asarray(x), ql, fused=fused))[:, :n]
    np.testing.assert_allclose(got, expect, rtol=2e-2, atol=2e-2)


def test_qmm_gptq_partials_gs128(monkeypatch):
    """QMM_PARTIALS=1 scales-on-partials kernel (gs>=128 decode
    experiment, ops/qmm._partials_gptq_matmul): exact reformulation
    y = sum_g s_g * (x_g @ v_g - z_g * sum(x_g)) matches the golden
    dequant matmul."""
    monkeypatch.setenv("QMM_PARTIALS", "1")
    rng = np.random.default_rng(5)
    k, n, gs = 512, 256, 128
    g = k // gs
    qv = rng.integers(0, 16, size=(k, n)).astype(np.uint16)
    zeros = rng.integers(0, 16, size=(g, n)).astype(np.uint16)
    scales = rng.random((g, n)).astype(np.float32) * 0.02 + 0.001
    t = F.gptq_pack(qv, zeros, scales, bits=4)
    golden_w = F.gptq_dequantize(t)
    ql = Q.from_gptq(t)
    assert M._use_partials(ql.segments[0])
    x = rng.standard_normal((2, k)).astype(np.float32) * 0.1
    expect = x @ golden_w
    got = np.asarray(M.qmm(jnp.asarray(x), ql, fused=True))[:, :n]
    np.testing.assert_allclose(got, expect, rtol=2e-2, atol=2e-2)


def test_qmm_nonpadded_k():
    """Segment rows not a multiple of SEG_K_PAD exercise the zero padding."""
    rng = np.random.default_rng(3)
    k, n = 160, 128   # 5 groups of 32
    golden_w, ql = _exl2_layer(rng, k, n, [4] * 5)
    x = rng.standard_normal((2, k)).astype(np.float32) * 0.1
    expect = x @ golden_w
    got = np.asarray(M.qmm(jnp.asarray(x), ql, fused=True))[:, :n]
    np.testing.assert_allclose(got, expect, rtol=2e-2, atol=2e-2)


def test_linear_apply_dense():
    rng = np.random.default_rng(4)
    w = rng.standard_normal((64, 32)).astype(np.float32) * 0.1
    b = rng.standard_normal((32,)).astype(np.float32)
    lin = Q.from_dense(w, b)
    x = rng.standard_normal((5, 64)).astype(np.float32)
    got = np.asarray(M.linear_apply(jnp.asarray(x), lin))
    np.testing.assert_allclose(got, x @ w + b, rtol=2e-2, atol=2e-2)
