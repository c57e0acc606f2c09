"""Device-side layout of quantized linear weights.

TPU-first re-design of the reference's QMatrix (cuda/q_matrix.cu): instead of a
register-level bit-shuffle, the stored packed stream is kept as-is (it is
already a dense per-column little-endian stream along K, which unpacks with a
static pattern of vector shifts), and the metadata is restructured at load:

  * mixed-bit-width matrices are split into per-bit-width *segments* of K-rows;
    each segment carries its own packed words and scale rows, so every kernel
    instance works on one uniform bit width with uniform group size;
  * per-group scales are pre-decoded from the 4-bit sqrt encoding into
    uint8 qs in [1,16] plus a per-group f32 max (pre-divided by 256 with the
    reference's fp16 rounding, ext.py:335), so kernels reconstruct the exact
    fp16 scale with two cheap VPU ops;
  * act-order is handled by gathering activation columns through `perm`
    (x_perm[j] = x[perm[j]]) before the matmul, instead of scattering
    dequantized rows (q_matrix.cu:306-313).

All arrays live in pytree dataclasses so whole models jit/shard cleanly.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from exllamav2_tpu.quant import formats as F

__all__ = ["QuantSegment", "QuantLinear", "DenseLinear", "from_exl2",
           "from_gptq", "from_dense"]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# K-rows of every segment are padded to a multiple of this at load time, with
# zeroed packed words and zero smax (so padded rows dequantize to exactly 0).
# Lets the fused matmul kernel tile K without in-kernel masking.
SEG_K_PAD = 256


@partial(jax.tree_util.register_dataclass,
         data_fields=["qweight", "qscale", "smax"],
         meta_fields=["bits", "rows", "group_rows"])
@dataclasses.dataclass
class QuantSegment:
    """One uniform-bit-width run of K-rows of a quantized matrix."""
    qweight: jax.Array      # uint32 [qrows, N]   packed bit-stream
    qscale: jax.Array       # uint8  [groups, N]  qs in [1, 16]
    smax: jax.Array         # f32    [groups, 1]  q_scale_max * (1/256), fp16-rounded
    bits: int
    rows: int               # K-rows covered
    group_rows: int         # rows per group (last group may be short)

    @property
    def groups(self) -> int:
        return self.qscale.shape[0]


@partial(jax.tree_util.register_dataclass,
         data_fields=["segments", "perm", "bias"],
         meta_fields=["k", "n", "n_orig"])
@dataclasses.dataclass
class QuantLinear:
    """A quantized linear layer: y = x[:, perm] @ dequant(segments) + bias.

    `n` is the padded (lane-aligned) output width; `n_orig` the logical one.
    """
    segments: tuple[QuantSegment, ...]
    perm: jax.Array | None   # int32 [k] activation gather (act-order), or None
    bias: jax.Array | None   # [n_orig]
    k: int
    n: int
    n_orig: int


@partial(jax.tree_util.register_dataclass,
         data_fields=["weight", "bias"],
         meta_fields=[])
@dataclasses.dataclass
class DenseLinear:
    """Unquantized linear: y = x @ weight + bias. weight [K, N] bf16."""
    weight: jax.Array
    bias: jax.Array | None


Linear = QuantLinear | DenseLinear


def _pad_packed_columns(packed: np.ndarray, bits: int, n_pad: int) -> np.ndarray:
    """Pad packed words along N with zero-point-valued weights (dequant to 0)."""
    qrows, n = packed.shape
    if n == n_pad:
        return packed
    zp = 2 ** (bits - 1)
    # build one packed column of zero-points: pack enough rows to fill qrows words
    rows_for_words = qrows * 32 // bits
    col = F.pack_bitstream(
        np.full((rows_for_words, 1), zp, dtype=np.uint16), bits)[:qrows]
    pad = np.repeat(col, n_pad - n, axis=1)
    return np.concatenate([packed, pad], axis=1)


def from_exl2(t: F.Exl2Tensor, lane_pad: int = 128) -> QuantLinear:
    """Build the device layout from a parsed EXL2 tensor set."""
    n_pad = _round_up(t.n, lane_pad)
    qs_all = F.unpack_rows_4(t.q_scale, t.n)               # [G, N] in [1,16]
    smax_all = (t.q_scale_max.astype(np.float16)
                / np.float16(256)).astype(np.float32)       # fp16-rounded /256
    segs = []
    for seg in t.segments():
        packed = t.q_weight.view(np.uint32)[
            seg.qrow_start:seg.qrow_start + seg.qrows]
        packed = _pad_packed_columns(packed, seg.bits, n_pad)
        qs = qs_all[seg.group_start:seg.group_start + seg.groups]
        if n_pad != t.n:
            qs = np.concatenate(
                [qs, np.ones((qs.shape[0], n_pad - t.n), np.uint16)], axis=1)
        smax = smax_all[seg.group_start:seg.group_start + seg.groups]
        # pad K-rows to SEG_K_PAD: zero words + zero smax; the matmul pads the
        # matching activation columns with zeros, so padded rows contribute 0
        rows_pad = _round_up(seg.rows, SEG_K_PAD)
        qrows_pad = rows_pad * seg.bits // 32
        groups_pad = rows_pad // seg.group_rows
        if qrows_pad > packed.shape[0]:
            packed = np.concatenate([packed, np.zeros(
                (qrows_pad - packed.shape[0], n_pad), np.uint32)], axis=0)
        if groups_pad > qs.shape[0]:
            qs = np.concatenate([qs, np.ones(
                (groups_pad - qs.shape[0], n_pad), np.uint16)], axis=0)
            smax = np.concatenate(
                [smax, np.zeros((groups_pad - smax.shape[0],), np.float32)])
        segs.append(QuantSegment(
            qweight=jnp.asarray(packed, dtype=jnp.uint32),
            qscale=jnp.asarray(qs.astype(np.uint8)),
            smax=jnp.asarray(smax[:, None]),
            bits=seg.bits, rows=seg.rows, group_rows=seg.group_rows))
    perm = None
    if t.q_invperm is not None:
        perm = jnp.asarray(np.argsort(t.q_invperm).astype(np.int32))
    bias = None if t.bias is None else jnp.asarray(t.bias, dtype=jnp.bfloat16)
    return QuantLinear(segments=tuple(segs), perm=perm, bias=bias,
                       k=t.k, n=n_pad, n_orig=t.n)


def from_gptq(t: F.GptqTensor, lane_pad: int = 128) -> QuantLinear:
    """Build the device layout from a parsed GPTQ tensor set.

    GPTQ uses explicit fp16 scales and per-group zeros rather than the EXL2
    sqrt-encoded scales; it is converted to the same segment layout by folding
    (q - z) * s into q * s - z * s ... — instead we keep exactness by storing
    an effective qs/smax pair only when possible. To stay bit-exact with the
    reference ((q - z) * s in fp16, q_matrix.cu:306-313), GPTQ matrices get a
    dedicated segment encoding: qscale row holds the zero point and smax
    becomes a full [groups, N] scale. Rather than complicate QuantSegment, we
    re-pack GPTQ into EXL2-equivalent values when zeros are symmetric, and
    otherwise keep a GptqSegment.

    Act-order (g_idx) is handled like the reference's make_sequential
    (q_matrix.cu:555-650): rows are reordered so groups are contiguous and the
    activation gather through `perm` compensates.
    """
    q, zeros = F.gptq_unpack(t)
    gs = t.group_size
    if t.g_idx is not None and not np.all(
            t.g_idx == np.arange(t.k) // gs):
        # act-order checkpoints assign exactly group_size rows per group
        # (g_idx = invperm // gs); reorder rows so groups are contiguous, like
        # make_sequential (q_matrix.cu:555-650), and gather activations instead
        counts = np.bincount(t.g_idx, minlength=t.groups)
        assert np.all(counts == gs), "non-uniform g_idx groups unsupported"
        order = np.argsort(t.g_idx, kind="stable")
        q = q[order]
        perm = jnp.asarray(order.astype(np.int32))
    else:
        perm = None
    scales = t.scales.astype(np.float32)
    n_pad = _round_up(t.n, lane_pad)
    seg = _gptq_segment(q, zeros, scales, t.bits, gs, n_pad)
    bias = None if t.bias is None else jnp.asarray(t.bias, dtype=jnp.bfloat16)
    return QuantLinear(segments=(seg,), perm=perm, bias=bias,
                       k=t.k, n=n_pad, n_orig=t.n)


@partial(jax.tree_util.register_dataclass,
         data_fields=["qweight", "scale", "zero"],
         meta_fields=["bits", "rows", "group_rows"])
@dataclasses.dataclass
class GptqSegment:
    """GPTQ layout: explicit per-group scales and integer zeros.

    Scales are the checkpoint's fp16 values stored as f32 (Mosaic kernels
    cannot cast f16 in-register); zeros carry the GPTQ +1 offset.
    """
    qweight: jax.Array      # uint32 [qrows, N]
    scale: jax.Array        # f32    [groups, N]
    zero: jax.Array         # int32  [groups, N]  (with the +1 applied)
    bits: int
    rows: int
    group_rows: int

    @property
    def groups(self) -> int:
        return self.scale.shape[0]


def _gptq_segment(q: np.ndarray, zeros: np.ndarray, scales: np.ndarray,
                  bits: int, gs: int, n_pad: int) -> GptqSegment:
    k, n = q.shape
    if n_pad != n:
        zp = np.broadcast_to(zeros[np.arange(k) // gs, :1], (k, n_pad - n))
        q = np.concatenate([q, zp], axis=1)
        zeros = np.concatenate(
            [zeros, np.broadcast_to(zeros[:, :1], (zeros.shape[0], n_pad - n))],
            axis=1)
        scales = np.concatenate(
            [scales, np.zeros((scales.shape[0], n_pad - n), np.float32)], axis=1)
    packed = F.pack_bitstream(q, bits).view(np.uint32)
    # pad K-rows to SEG_K_PAD with zero words / zero scales (see from_exl2)
    rows_pad = _round_up(k, SEG_K_PAD)
    qrows_pad = rows_pad * bits // 32
    groups_pad = max(rows_pad // gs, scales.shape[0])
    if qrows_pad > packed.shape[0]:
        packed = np.concatenate([packed, np.zeros(
            (qrows_pad - packed.shape[0], n_pad), np.uint32)], axis=0)
    if groups_pad > scales.shape[0]:
        pad_g = groups_pad - scales.shape[0]
        scales = np.concatenate(
            [scales, np.zeros((pad_g, n_pad), np.float32)], axis=0)
        zeros = np.concatenate(
            [zeros, np.zeros((pad_g, n_pad), np.uint16)], axis=0)
    return GptqSegment(
        qweight=jnp.asarray(packed),
        scale=jnp.asarray(scales.astype(np.float16).astype(np.float32)),
        zero=jnp.asarray(zeros.astype(np.int32)),
        bits=bits, rows=k, group_rows=gs)


def from_dense(weight: np.ndarray, bias: np.ndarray | None = None) -> DenseLinear:
    """FP16/BF16 fallback layer ([K, N] input layout)."""
    return DenseLinear(
        weight=jnp.asarray(weight, dtype=jnp.bfloat16),
        bias=None if bias is None else jnp.asarray(bias, dtype=jnp.bfloat16))
