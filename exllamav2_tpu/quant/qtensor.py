"""Device-side layout of quantized linear weights.

TPU-first re-design of the reference's QMatrix (cuda/q_matrix.cu). The stored
checkpoint format (quant/formats.py) is parsed on host and re-packed into a
layout chosen for the Pallas fused-matmul kernel — the TPU analog of the
reference's on-load register shuffle (q_matrix.cu:21-44, shuffle_kernel):

  * mixed-bit-width matrices split into per-bit-width *segments* of K-rows;
  * odd widths decompose into power-of-two **bit planes** (3 = 2+1, 5 = 4+1,
    6 = 4+2) so no value ever crosses a 32-bit word boundary;
  * within every 256-row sub-block, values are packed **strided**: natural row
    r lives in word (r mod Qsb) at bit slot (r div Qsb), so the kernel's
    unpack — concat_j((words >> j*bp) & mask) — yields rows in natural order
    with full-block concats only (no interleaving relayouts on the VPU);
  * EXL2 per-group scales are pre-decoded to uint8 qs in [1,16] plus per-group
    f32 q_scale_max/256 (fp16-rounded, ext.py:335) and reconstructed exactly
    in-kernel; GPTQ keeps explicit f32 scales / int32 zeros;
  * act-order is an activation gather through `perm` (x[:, perm]) instead of
    scattering dequantized rows (q_matrix.cu:306-313).

All arrays live in pytree dataclasses so whole models jit/shard cleanly.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from exllamav2_tpu.quant import formats as F

__all__ = ["QuantSegment", "GptqSegment", "QuantLinear", "DenseLinear",
           "from_exl2", "from_gptq", "from_dense", "slice_columns",
           "gather_columns",
           "SUB_BLOCK", "plane_split", "pack_planes", "unpack_planes_np"]

# K-rows of every segment are padded to a multiple of this at load time, with
# zero values and zero smax (padded rows dequantize to exactly 0, and the
# matmul zero-pads the matching activation columns).
SUB_BLOCK = 256


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _lcm(a: int, b: int) -> int:
    import math
    return a * b // math.gcd(a, b)


def plane_split(bits: int) -> tuple[int, ...]:
    """Decompose a bit width into power-of-two planes (low plane first)."""
    return {1: (1,), 2: (2,), 3: (2, 1), 4: (4,), 5: (4, 1),
            6: (4, 2), 8: (8,)}[bits]


def pack_planes(values: np.ndarray, bits: int) -> list[np.ndarray]:
    """Pack uint values [rows, N] (rows % SUB_BLOCK == 0) into plane arrays.

    Plane p of width bp is uint32 [rows*bp/32, N]; within each 256-row
    sub-block, natural row r maps to word (r mod Qsb), slot (r div Qsb) where
    Qsb = 256*bp/32.
    """
    rows, n = values.shape
    assert rows % SUB_BLOCK == 0, rows
    out = []
    shift = 0
    for bp in plane_split(bits):
        v = (values.astype(np.uint32) >> shift) & ((1 << bp) - 1)
        qsb = SUB_BLOCK * bp // 32
        per = 32 // bp
        # [sb, j, w, n] where natural row = sb*256 + j*qsb + w
        v4 = v.reshape(rows // SUB_BLOCK, per, qsb, n)
        shifts = (np.arange(per, dtype=np.uint32) * bp)[None, :, None, None]
        words = (v4 << shifts).sum(axis=1, dtype=np.uint64) & 0xFFFFFFFF
        out.append(words.reshape(rows * bp // 32, n).astype(np.uint32))
        shift += bp
    return out


def unpack_planes_np(planes: list[np.ndarray], bits: int, n: int) -> np.ndarray:
    """Numpy inverse of pack_planes -> uint16 [rows, N] (for tests)."""
    total = None
    shift = 0
    for bp, words in zip(plane_split(bits), planes):
        qsb = SUB_BLOCK * bp // 32
        per = 32 // bp
        rows = words.shape[0] * 32 // bp
        w4 = words.reshape(rows // SUB_BLOCK, qsb, n)
        vals = np.empty((rows // SUB_BLOCK, per, qsb, n), dtype=np.uint32)
        for j in range(per):
            vals[:, j] = (w4 >> (j * bp)) & ((1 << bp) - 1)
        v = vals.reshape(rows, n)
        total = v << shift if total is None else total | (v << shift)
        shift += bp
    return total.astype(np.uint16)


@partial(jax.tree_util.register_dataclass,
         data_fields=["planes", "qscale", "smax", "scale_f"],
         meta_fields=["bits", "plane_bits", "rows", "group_rows",
                      "src_cols", "act8"])
@dataclasses.dataclass
class QuantSegment:
    """One uniform-bit-width run of K-rows of an EXL2 matrix (TPU layout)."""
    planes: tuple[jax.Array, ...]   # uint32 [rows_pad*bp/32, N] per plane
    qscale: jax.Array               # uint8  [groups_pad, N]  qs in [1, 16]
    smax: jax.Array                 # f32    [groups_pad, 1]  q_scale_max/256
    bits: int
    plane_bits: tuple[int, ...]
    rows: int                       # logical K-rows covered
    group_rows: int                 # rows per group
    # optional load-time-decoded bf16 scale rows [groups_pad, N]: trades
    # ~+6% weight-stream bytes for dropping the in-kernel sqrt decode of
    # qscale/smax (ops/dequant.precompute_scales_linear)
    scale_f: jax.Array | None = None
    # column-merged segments (ops/dequant.merge_linears): start column of
    # each source matrix; smax is then [groups_pad, n_sources] and the
    # kernel selects the source's column per n-tile — bitwise-exact
    src_cols: tuple = ()
    # W4A8 opt-in (ops/dequant.enable_w4a8): route the fused decode path
    # through the int8-MXU scales-on-partials kernel with per-token
    # per-group absmax activation quantization — ~1.6x the exact
    # kernel's HBM rate (601 vs 376 GB/s probed, docs/DESIGN.md), NOT
    # exact EXL2 semantics. Requires scale_f (prescaled bf16 scales).
    act8: bool = False

    @property
    def rows_pad(self) -> int:
        return self.planes[0].shape[0] * 32 // self.plane_bits[0]


@partial(jax.tree_util.register_dataclass,
         data_fields=["planes", "scale", "zero", "scale_bf", "zs_bf"],
         meta_fields=["bits", "plane_bits", "rows", "group_rows", "act8"])
@dataclasses.dataclass
class GptqSegment:
    """GPTQ layout: explicit per-group f32 scales and int32 zeros (+1 applied)."""
    planes: tuple[jax.Array, ...]
    scale: jax.Array                # f32   [groups_pad, N]
    zero: jax.Array                 # int32 [groups_pad, N]
    bits: int
    plane_bits: tuple[int, ...]
    rows: int
    group_rows: int
    # W4A8 opt-in decode path (see QuantSegment.act8)
    act8: bool = False
    # W4A8 compressed meta (enable_w4a8_linear): bf16 scales + bf16
    # (zero - off) * scale product — halves the per-group meta stream
    # (8 -> 4 bytes per group-column; at gs128 that is 12.5% -> 6.3% of
    # the weight bytes). bf16 rounding is below the int8 act-quant noise.
    scale_bf: jax.Array | None = None   # bf16 [groups_pad, N]
    zs_bf: jax.Array | None = None      # bf16 [groups_pad, N]

    @property
    def rows_pad(self) -> int:
        return self.planes[0].shape[0] * 32 // self.plane_bits[0]


@partial(jax.tree_util.register_dataclass,
         data_fields=["segments", "perm", "bias"],
         meta_fields=["k", "n", "n_orig"])
@dataclasses.dataclass
class QuantLinear:
    """A quantized linear layer: y = x[:, perm] @ dequant(segments) + bias.

    `n` is the padded (lane-aligned) output width; `n_orig` the logical one.
    """
    segments: tuple
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


def _pad2d(a: np.ndarray, rows: int, cols: int, fill=0) -> np.ndarray:
    out = np.full((rows, cols), fill, dtype=a.dtype)
    out[:a.shape[0], :a.shape[1]] = a
    return out


def from_exl2(t: F.Exl2Tensor, lane_pad: int = 128) -> QuantLinear:
    """Build the device layout from a parsed EXL2 tensor set."""
    n_pad = _round_up(t.n, lane_pad)
    q_all = F.exl2_unpack(t)                               # [K, N] ints, stored order
    qs_all = F.unpack_rows_4(t.q_scale, t.n)               # [G, N] in [1,16]
    smax_all = (t.q_scale_max.astype(np.float16)
                / np.float16(256)).astype(np.float32)      # fp16-rounded /256
    segs = []
    for seg in t.segments():
        rows_pad = _round_up(seg.rows, _lcm(SUB_BLOCK, seg.group_rows))
        groups_pad = rows_pad // seg.group_rows
        q = _pad2d(q_all[seg.row_start:seg.row_start + seg.rows],
                   rows_pad, n_pad, fill=2 ** (seg.bits - 1))
        qs = _pad2d(qs_all[seg.group_start:seg.group_start + seg.groups],
                    max(groups_pad, seg.groups), n_pad, fill=1)
        smax = np.zeros((max(groups_pad, seg.groups), 1), np.float32)
        smax[:seg.groups, 0] = smax_all[
            seg.group_start:seg.group_start + seg.groups]
        planes = pack_planes(q, seg.bits)
        segs.append(QuantSegment(
            planes=tuple(jnp.asarray(p) for p in planes),
            qscale=jnp.asarray(qs.astype(np.uint8)),
            smax=jnp.asarray(smax),
            bits=seg.bits, plane_bits=plane_split(seg.bits),
            rows=seg.rows, group_rows=seg.group_rows))
    perm = None
    if t.q_invperm is not None:
        perm = jnp.asarray(np.argsort(t.q_invperm).astype(np.int32))
    bias = None if t.bias is None else jnp.asarray(t.bias, dtype=jnp.bfloat16)
    return QuantLinear(segments=tuple(segs), perm=perm, bias=bias,
                       k=t.k, n=n_pad, n_orig=t.n)


def from_gptq(t: F.GptqTensor, lane_pad: int = 128) -> QuantLinear:
    """Build the device layout from a parsed GPTQ tensor set.

    Act-order (g_idx) is handled like the reference's make_sequential
    (q_matrix.cu:555-650): rows are reordered so groups are contiguous and the
    activation gather through `perm` compensates.
    """
    q, zeros = F.gptq_unpack(t)
    gs = t.group_size
    perm = None
    if t.g_idx is not None and not np.all(t.g_idx == np.arange(t.k) // gs):
        # act-order checkpoints assign exactly group_size rows per group
        counts = np.bincount(t.g_idx, minlength=t.groups)
        assert np.all(counts == gs), "non-uniform g_idx groups unsupported"
        order = np.argsort(t.g_idx, kind="stable")
        q = q[order]
        perm = jnp.asarray(order.astype(np.int32))
    n_pad = _round_up(t.n, lane_pad)
    rows_pad = _round_up(t.k, _lcm(SUB_BLOCK, gs))
    groups_pad = max(rows_pad // gs, t.groups) if gs <= rows_pad \
        else t.groups
    qp = _pad2d(q, rows_pad, n_pad, fill=0)
    # pad columns of q with the group zero so padded cols dequantize to 0
    if n_pad != t.n:
        gi = np.minimum(np.arange(rows_pad) // gs, t.groups - 1)
        qp[:, t.n:] = zeros[gi, :1]
    zp = _pad2d(zeros.astype(np.int32), groups_pad, n_pad, fill=0)
    if n_pad != t.n:
        zp[:zeros.shape[0], t.n:] = zeros[:, :1]
    sp = _pad2d(t.scales.astype(np.float16).astype(np.float32),
                groups_pad, n_pad, fill=0.0)
    seg = GptqSegment(
        planes=tuple(jnp.asarray(p) for p in pack_planes(qp, t.bits)),
        scale=jnp.asarray(sp),
        zero=jnp.asarray(zp),
        bits=t.bits, plane_bits=plane_split(t.bits),
        rows=t.k, group_rows=gs)
    bias = None if t.bias is None else jnp.asarray(t.bias, dtype=jnp.bfloat16)
    return QuantLinear(segments=(seg,), perm=perm, bias=bias,
                       k=t.k, n=n_pad, n_orig=t.n)


def slice_columns(lin, beg: int, end: int):
    """Slice out-features [beg, end) of a linear (fused-QKV / gate_up
    splitting, module.py:154-199 f_beg/f_end analog).

    For quantized layers every per-segment array has N as its last axis,
    so a column slice is a clean slice of planes + scales; rows/perm are
    unchanged. beg/end should be lane-aligned (multiples of 128) for the
    fused kernel's tiling to stay efficient.
    """
    if isinstance(lin, DenseLinear):
        return DenseLinear(
            weight=lin.weight[:, beg:end],
            bias=None if lin.bias is None else lin.bias[beg:end])
    assert isinstance(lin, QuantLinear)
    segs = []
    for seg in lin.segments:
        repl = {"planes": tuple(p[:, beg:end] for p in seg.planes)}
        if isinstance(seg, GptqSegment):
            repl["scale"] = seg.scale[:, beg:end]
            repl["zero"] = seg.zero[:, beg:end]
            if seg.scale_bf is not None:
                repl["scale_bf"] = seg.scale_bf[:, beg:end]
                repl["zs_bf"] = seg.zs_bf[:, beg:end]
        else:
            repl["qscale"] = seg.qscale[:, beg:end]
            if seg.scale_f is not None:
                repl["scale_f"] = seg.scale_f[:, beg:end]
        segs.append(dataclasses.replace(seg, **repl))
    bias = None if lin.bias is None else lin.bias[beg:end]
    return QuantLinear(segments=tuple(segs), perm=lin.perm, bias=bias,
                       k=lin.k, n=end - beg, n_orig=end - beg)


def gather_columns(lin, idx):
    """Gather out-features by index array (InternLM2 altpack fused-qkv
    unpacking, module.py:154-199). idx must be a 1-D int array; the result
    keeps the source k/perm."""
    idx = jnp.asarray(np.asarray(idx, dtype=np.int32))
    if isinstance(lin, DenseLinear):
        return DenseLinear(
            weight=jnp.take(lin.weight, idx, axis=1),
            bias=None if lin.bias is None else jnp.take(lin.bias, idx))
    assert isinstance(lin, QuantLinear)
    segs = []
    for seg in lin.segments:
        repl = {"planes": tuple(jnp.take(p, idx, axis=1)
                                for p in seg.planes)}
        if isinstance(seg, GptqSegment):
            repl["scale"] = jnp.take(seg.scale, idx, axis=1)
            repl["zero"] = jnp.take(seg.zero, idx, axis=1)
            if seg.scale_bf is not None:
                repl["scale_bf"] = jnp.take(seg.scale_bf, idx, axis=1)
                repl["zs_bf"] = jnp.take(seg.zs_bf, idx, axis=1)
        else:
            repl["qscale"] = jnp.take(seg.qscale, idx, axis=1)
            if seg.scale_f is not None:
                repl["scale_f"] = jnp.take(seg.scale_f, idx, axis=1)
        segs.append(dataclasses.replace(seg, **repl))
    bias = None if lin.bias is None else jnp.take(lin.bias, idx)
    n = int(idx.shape[0])
    return QuantLinear(segments=tuple(segs), perm=lin.perm, bias=bias,
                       k=lin.k, n=n, n_orig=n)


def from_dense(weight: np.ndarray, bias: np.ndarray | None = None) -> DenseLinear:
    """FP16/BF16 fallback layer ([K, N] input layout)."""
    return DenseLinear(
        weight=jnp.asarray(weight, dtype=jnp.bfloat16),
        bias=None if bias is None else jnp.asarray(bias, dtype=jnp.bfloat16))
