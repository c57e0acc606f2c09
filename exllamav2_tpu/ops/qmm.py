"""Quantized matmul: y = x @ dequant(W).

Two TPU execution paths, replacing the reference's CUDA GEMV/cuBLAS split
(cuda/q_gemm.cu:44-265):

  * decode (few rows): a fused Pallas kernel streams the plane-packed words
    HBM->VMEM once, unpacks + scales on the VPU and feeds the MXU — the
    HBM-bandwidth-bound path that sets tokens/s. The v5e VPU:HBM ratio
    (~4.7 lane-ops/byte) makes the unpack+scale chain a joint bottleneck
    near 0.5x HBM peak; int8-MXU and bitcast-extraction variants measured
    in tools/perf_qmm.py lose (see docs/DESIGN.md round-2 kernel study);
  * prefill (many rows): dequantize to bf16 and let XLA run a normal MXU
    matmul (compute-bound, dequant cost amortized).

Mixed-bit-width EXL2 matrices are a sum of per-segment matmuls over disjoint
K-row ranges. Act-order is an activation column gather (x[:, perm]).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from exllamav2_tpu.quant.qtensor import (
    QuantLinear, DenseLinear, GptqSegment, SUB_BLOCK)
from exllamav2_tpu.ops import dequant as D

__all__ = ["qmm", "linear_apply", "FUSED_MAX_ROWS"]

# Below this many activation rows the fused kernel wins (HBM-bound regime);
# the reference draws the same line at MAX_Q_GEMM_ROWS (config.h:4).
FUSED_MAX_ROWS = 32

_M_PAD = 16


# trace-scoped override: the fused sharded path runs its shard_map trace
# with this set when the mesh devices are not TPUs (virtual CPU meshes),
# because jax.default_backend() reports the process default, not the
# mesh platform
_INTERPRET_OVERRIDE = [None]


def _interpret() -> bool:
    if _INTERPRET_OVERRIDE[0] is not None:
        return _INTERPRET_OVERRIDE[0]
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _divisors(total: int, step: int, cap: int):
    return [d for d in range(step, min(total, cap) + 1, step)
            if total % d == 0] or [total]


def _pick_tiles(rows_pad: int, n: int, bits: int, group_rows: int,
                m_pad: int, n_unit: int | None = None) -> tuple[int, int]:
    """Choose (k_tile, n_tile) maximizing block size within a VMEM budget.

    Decode is HBM-bound: throughput tracks DMA transfer size, so prefer the
    largest plane block that leaves room for double buffering (Mosaic
    pipelines the grid's input windows automatically)."""
    target = 1 << 20                  # ~1 MiB plane blocks pipeline best
    best = None
    for kt in _divisors(rows_pad, SUB_BLOCK, 2048):
        if kt % group_rows:
            continue
        # Mosaic sublane rule: the (gt, n_tile) scale/zero/qscale meta
        # block's second-minor dim must be 8-divisible or span the whole
        # group axis (kt == rows_pad ⇒ gt == total groups). Bites at
        # large group sizes: GPTQ gs128 at K=4096 has only 32 groups, so
        # kt=512 gives gt=4 and Mosaic refuses the block (the r4 GPTQ
        # headline-leg crash).
        if (kt // group_rows) % 8 and kt != rows_pad:
            continue
        for nt in _divisors(n, 128, 8192):
            if n_unit and n_unit % nt:
                continue          # merged sources: tiles must not
                                  # straddle a source boundary
            plane_b = kt * bits // 32 * nt * 4
            steps = (n // nt) * (rows_pad // kt)
            # enough grid steps that Mosaic's input pipeline overlaps DMA
            # with compute; blocks near 1 MiB keep each DMA efficient
            score = (-(steps < 4), -abs(plane_b - target), nt)
            if best is None or score > best[0]:
                best = (score, kt, nt)
    if best is None:
        # no tiled kt satisfies the sublane rule (few groups, large K):
        # a single full-K tile is always legal (block dim == array dim).
        # Pick the n-tile whose plane block is closest to the same VMEM
        # target the scored path enforces — the largest divisor at full
        # K could exceed VMEM once dequantized to bf16 (ADVICE r4 low)
        nts = [nt for nt in _divisors(n, 128, 8192)
               if not (n_unit and n_unit % nt)] or [n]
        return rows_pad, min(
            nts, key=lambda nt: abs(rows_pad * bits // 32 * nt * 4
                                    - target))
    return best[1], best[2]


# ---------------------------------------------------------------------------
# Fused kernel
# ---------------------------------------------------------------------------

def _dequant_block(refs, seg, n_tile: int, k_tile: int) -> jax.Array:
    """Shared kernel-body dequant of one [k_tile, n_tile] block -> bf16."""
    if isinstance(seg, GptqSegment):
        plane_refs = refs[:-2]
        scale_ref, zero_ref = refs[-2], refs[-1]
        s = scale_ref[:]
        z = zero_ref[:]
    elif getattr(seg, "scale_f", None) is not None:
        # load-time-decoded bf16 scale rows: stream them, skip the
        # in-kernel sqrt decode (precompute_scales_linear)
        plane_refs = refs[:-1]
        s = refs[-1][:].astype(jnp.float32)
        z = None
    elif getattr(seg, "src_cols", ()):
        # column-merged segment: smax block is [gt, n_sources]; select
        # the source whose columns this n-tile covers (tiles never
        # straddle boundaries — _pick_tiles) and decode exactly
        plane_refs = refs[:-2]
        qs_ref, smax_ref = refs[-2], refs[-1]
        pid = pl.program_id(0)
        src_idx = jnp.int32(0)
        for b in seg.src_cols[1:]:
            src_idx = src_idx + (pid >= b // n_tile).astype(jnp.int32)
        blk = smax_ref[:]                              # [gt, nsrc]
        cols = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 1)
        smax_col = jnp.sum(
            jnp.where(cols == src_idx, blk, 0.0), axis=1, keepdims=True)
        s = D.exl2_scales(qs_ref[:], smax_col)
        z = None
    else:
        plane_refs = refs[:-2]
        qs_ref, smax_ref = refs[-2], refs[-1]
        s = D.exl2_scales(qs_ref[:], smax_ref[:])
        z = None
    vals = D.unpack_planes([r[:] for r in plane_refs], seg.plane_bits)
    gt = k_tile // seg.group_rows
    srows = D.broadcast_groups(s, seg.group_rows)
    if z is None:
        zero = float(2 ** (seg.bits - 1))
        w = ((vals - zero).astype(jnp.float32) * srows)
    else:
        zrows = D.broadcast_groups(z, seg.group_rows)
        w = ((vals - zrows).astype(jnp.float32) * srows)
    return w.astype(jnp.bfloat16)


def _partials_gptq_matmul(x: jax.Array, seg: GptqSegment) -> jax.Array:
    """Scales-on-partials GPTQ kernel (gs>=128 decode experiment).

    Exact reformulation: y = sum_g s_g * (x_g @ v_g - z_g * sum(x_g)) —
    the per-VALUE (sub, convert, mul) chain of _dequant_block collapses
    to ONE i32->bf16 convert per value; scale/zero application moves to
    the [m, n_tile] group partials (gt*m*nt ops, ~GR x fewer). At gs128
    each group dot is a full K=128 MXU pass, so this variant trades the
    VPU bound (~400 GB/s measured, docs/DESIGN.md) for MXU pass count.
    Env-gated (QMM_PARTIALS=1) pending TPU measurement —
    tools/r3_tpu_run.sh leg 8 probes the roofline."""
    m_pad, k_pad = x.shape
    rows_pad = seg.rows_pad
    assert k_pad == rows_pad, (k_pad, rows_pad)
    n = seg.planes[0].shape[1]
    gr = seg.group_rows
    k_tile, n_tile = _pick_tiles(rows_pad, n, seg.bits, gr, m_pad)
    gt = k_tile // gr
    # Mosaic sublane rule: the scales/zeros block's second-minor dim (gt)
    # must be 8-divisible or span the whole group axis. Small matrices
    # (few groups) fall back to a single full-K tile, where the block
    # equals the array dim and is always legal.
    if gt % 8:
        k_tile = rows_pad
        gt = rows_pad // gr
    grid = (n // n_tile, rows_pad // k_tile)

    interp = _interpret()

    def kernel(x_ref, *refs):
        o_ref = refs[-1]
        scale_ref, zero_ref = refs[-3], refs[-2]
        plane_refs = refs[:-3]
        vals = D.unpack_planes([r[:] for r in plane_refs], seg.plane_bits)
        dot_t = jnp.float32 if interp else jnp.bfloat16
        wb = vals.astype(dot_t)                     # [kt, nt]
        xb = x_ref[:].astype(dot_t)                 # [m_pad, kt]
        s = scale_ref[:]                            # [gt, nt] f32
        z = zero_ref[:].astype(jnp.float32)         # [gt, nt]
        acc = None
        for g in range(gt):                         # static unroll
            xg = xb[:, g * gr:(g + 1) * gr]
            wg = wb[g * gr:(g + 1) * gr, :]
            pg = jnp.dot(xg, wg, preferred_element_type=jnp.float32)
            xs = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
            term = (pg - xs * z[g:g + 1, :]) * s[g:g + 1, :]
            acc = term if acc is None else acc + term
        k_step = pl.program_id(1)

        @pl.when(k_step == 0)
        def _():
            o_ref[:] = acc

        @pl.when(k_step != 0)
        def _():
            o_ref[:] = o_ref[:] + acc

    plane_specs = [
        pl.BlockSpec((k_tile * bp // 32, n_tile), lambda i, j: (j, i),
                     memory_space=pltpu.VMEM)
        for bp in seg.plane_bits
    ]
    meta_specs = [
        pl.BlockSpec((gt, n_tile), lambda i, j: (j, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((gt, n_tile), lambda i, j: (j, i),
                     memory_space=pltpu.VMEM),
    ]
    qbytes = sum(p.size * 4 for p in seg.planes)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m_pad, k_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            *plane_specs,
            *meta_specs,
        ],
        out_specs=pl.BlockSpec((m_pad, n_tile), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * rows_pad * n,
            bytes_accessed=qbytes + x.size * 2 + m_pad * n * 4,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(x, *seg.planes, seg.scale, seg.zero)


def _pick_tiles_w4a8(rows_pad: int, n: int, bits: int, group_rows: int,
                     n_unit: int | None = None) -> tuple[int, int]:
    """Tile picker for the int8-MXU partials kernel.

    The exact kernel's ~1 MiB plane-block target is tuned for its
    VPU-bound regime; the int8 kernel at gs>=128 is MXU-pass-bound and
    wants the WIDEST n-tile available (fewer, fatter passes). Measured
    (gs128, probe table in docs/DESIGN.md round-5): the production
    picker's (4096, 256) tile on the [4096, 11008] shape ran 372 GB/s
    where the probe's (1024, 5504) ran 621 — the whole
    production-vs-probe gap. At SMALL group sizes the K=gr dots are
    already pipeline-pass-bound and wide tiles only add VMEM churn
    (gs32 e2e measured 85.7 t/s wide vs 107.3 with the standard
    picker), so gr < 128 keeps the exact kernel's tiling.
    """
    if group_rows < 128:
        return _pick_tiles(rows_pad, n, bits, group_rows, _M_PAD, n_unit)
    kts = [d for d in _divisors(rows_pad, SUB_BLOCK, 1024)
           if d % group_rows == 0 and (d // group_rows) % 8 == 0]
    kt = max(kts) if kts else rows_pad
    cap = 16 << 20
    for nt in sorted(_divisors(n, 128, 8192), reverse=True):
        if n_unit and n_unit % nt:
            continue
        if kt * bits // 32 * nt * 4 <= cap:
            return kt, nt
    return kt, 128


def _w4a8_segment_matmul(x: jax.Array, seg) -> jax.Array:
    """int8-MXU scales-on-partials kernel (the W4A8 opt-in decode path).

    y ~= sum_g a_g * s_g * (xq_g @ vq_g - z_g * sum(xq_g)) where
    xq = round(x / a) is per-token per-group absmax int8 and vq are the
    raw packed values consumed as int8 by the MXU (int32 accumulation).
    The per-VALUE VPU work of the exact kernel (int sub, i32->bf16
    convert, f32 mul) disappears entirely: fixups apply to the [m, nt]
    group PARTIALS (~group_rows x fewer ops), which is why this form
    probed 601 GB/s where every exact variant plateaus at 320-420 GB/s
    (docs/DESIGN.md round-4 study). NOT exact: activation quantization
    perturbs logits; quality measured in QUALITY.md (tools/quality_w4a8).

    Reference analog: none — the reference is W4A16 (q_gemm_kernel.cuh).
    """
    m_pad, k_pad = x.shape
    rows_pad = seg.rows_pad
    assert k_pad == rows_pad, (k_pad, rows_pad)
    n = seg.planes[0].shape[1]
    gr = seg.group_rows
    is_gptq = isinstance(seg, GptqSegment)
    if not is_gptq:
        assert seg.scale_f is not None, \
            "w4a8 EXL2 segments require prescaled scale_f rows " \
            "(ops/dequant.enable_w4a8_linear applies this)"
    k_tile, n_tile = _pick_tiles_w4a8(rows_pad, n, seg.bits, gr)
    gt = k_tile // gr
    grid = (n // n_tile, rows_pad // k_tile)
    g_total = rows_pad // gr

    # per-token per-group absmax int8 activation quantization (in-trace,
    # [m, K] elementwise — negligible next to the weight stream). The
    # [G, m, gr] layout is built OUT HERE because Mosaic rejects
    # in-kernel lane-dim splits ((m, kt) -> (m, gt, gr) "unsupported
    # shape cast") for any gr that isn't a whole 128-lane register; the
    # kernel then consumes a 3-D block directly. Group sums ride along
    # precomputed (one fewer in-kernel reduction).
    xf = x.astype(jnp.float32).reshape(m_pad, g_total, gr)
    amax = jnp.max(jnp.abs(xf), axis=2)                   # [m, G]
    a = amax * jnp.float32(1.0 / 127.0)                   # output scale
    aq = jnp.where(amax > 0, a, jnp.float32(1.0))
    xqf = jnp.clip(jnp.round(xf / aq[:, :, None]), -127, 127)
    xq3 = jnp.transpose(xqf, (1, 0, 2)).astype(jnp.int8)  # [G, m, gr]
    a_t = a.T                                             # [G, m] f32
    x1a = jnp.sum(xqf, axis=2).T * a_t                    # [G, m] f32

    # 8-bit planes hold values in [0, 255]: shift into int8 range and
    # fold the shift into the zero-point term (z - 128; EXL2's implicit
    # zero 2^(bits-1) = 128 cancels exactly)
    off = 128 if seg.bits == 8 else 0
    zero_c = float(2 ** (seg.bits - 1) - off)
    interp = _interpret()

    gptq_bf = is_gptq and getattr(seg, "zs_bf", None) is not None

    def kernel(x_ref, a_ref, x1a_ref, *refs):
        o_ref = refs[-1]
        if is_gptq:
            plane_refs = refs[:-3]
            scale_ref, zero_ref = refs[-3], refs[-2]
        else:
            plane_refs = refs[:-2]
            scale_ref = refs[-2]
        vals = D.unpack_planes([r[:] for r in plane_refs], seg.plane_bits)
        if interp:
            # CPU interpret path: int8 MXU dots are TPU-only; f32 dots
            # of the same integer values are bitwise-identical (products
            # <= 127*255, group sums < 2^24 — exact in f32)
            rhs = (vals - off).astype(jnp.float32).reshape(gt, gr, n_tile)
            lhs = x_ref[:].astype(jnp.float32)               # [gt, m, gr]
            pref = jnp.float32
        else:
            # sublane-only split of the weight block (lane dim intact):
            # supported; the i8 convert is the LAST op before the dot
            rhs = (vals - off).reshape(gt, gr, n_tile).astype(jnp.int8)
            lhs = x_ref[:]                                   # [gt, m, gr] i8
            pref = jnp.int32
        p = jax.lax.dot_general(
            lhs, rhs, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=pref)                     # [gt, m, nt]
        s = scale_ref[:].astype(jnp.float32)                 # [gt, nt]
        av = a_ref[:]                                        # [gt, m]
        x1a_v = x1a_ref[:]                                   # [gt, m]
        pa = p.astype(jnp.float32) * av[:, :, None]
        if gptq_bf:
            # compressed meta: zero_ref holds zs = (z - off) * s, so the
            # correction subtracts AFTER the scale multiply
            zs = zero_ref[:].astype(jnp.float32)              # [gt, nt]
            acc = jnp.sum(pa * s[:, None, :]
                          - x1a_v[:, :, None] * zs[:, None, :], axis=0)
        else:
            if is_gptq:
                z = zero_ref[:].astype(jnp.float32) - float(off)
                pc = pa - x1a_v[:, :, None] * z[:, None, :]
            else:
                pc = pa - jnp.float32(zero_c) * x1a_v[:, :, None]
            acc = jnp.sum(pc * s[:, None, :], axis=0)
        k_step = pl.program_id(1)

        @pl.when(k_step == 0)
        def _():
            o_ref[:] = acc

        @pl.when(k_step != 0)
        def _():
            o_ref[:] = o_ref[:] + acc

    plane_specs = [
        pl.BlockSpec((k_tile * bp // 32, n_tile), lambda i, j: (j, i),
                     memory_space=pltpu.VMEM)
        for bp in seg.plane_bits
    ]
    if is_gptq:
        meta_args = ((seg.scale_bf, seg.zs_bf) if gptq_bf
                     else (seg.scale, seg.zero))
        meta_specs = [
            pl.BlockSpec((gt, n_tile), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gt, n_tile), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
        ]
    else:
        meta_args = (seg.scale_f,)
        meta_specs = [
            pl.BlockSpec((gt, n_tile), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
        ]
    qbytes = sum(p.size * 4 for p in seg.planes)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((gt, m_pad, gr), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gt, m_pad), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gt, m_pad), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            *plane_specs,
            *meta_specs,
        ],
        out_specs=pl.BlockSpec((m_pad, n_tile), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * rows_pad * n,
            bytes_accessed=qbytes + xq3.size + m_pad * n * 4,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(xq3, a_t, x1a, *seg.planes, *meta_args)


def _use_partials(seg) -> bool:
    import os
    return (isinstance(seg, GptqSegment) and seg.group_rows >= 128
            and seg.rows_pad % seg.group_rows == 0
            and os.environ.get("QMM_PARTIALS") == "1")


def _fused_segment_matmul(x: jax.Array, seg) -> jax.Array:
    """x [M_pad, rows_pad] bf16 (zero-padded) @ dequant(seg) -> [M_pad, N] f32."""
    if getattr(seg, "act8", False):
        return _w4a8_segment_matmul(x, seg)
    if _use_partials(seg):
        return _partials_gptq_matmul(x, seg)
    m_pad, k_pad = x.shape
    rows_pad = seg.rows_pad
    assert k_pad == rows_pad, (k_pad, rows_pad)
    n = seg.planes[0].shape[1]
    n_unit = None
    if getattr(seg, "src_cols", ()):
        import math
        from functools import reduce
        widths = [b - a for a, b in
                  zip(seg.src_cols, list(seg.src_cols[1:]) + [n])]
        n_unit = reduce(math.gcd, widths)
    k_tile, n_tile = _pick_tiles(rows_pad, n, seg.bits, seg.group_rows,
                                 m_pad, n_unit)
    gt = k_tile // seg.group_rows
    assert gt * seg.group_rows == k_tile, (k_tile, seg.group_rows)
    grid = (n // n_tile, rows_pad // k_tile)

    interp = _interpret()

    def kernel(x_ref, *refs):
        o_ref = refs[-1]
        w = _dequant_block(refs[:-1], seg, n_tile, k_tile)
        xb = x_ref[:]
        if interp:
            # interpret mode runs the kernel body as XLA CPU ops, whose
            # thunk runtime rejects some bf16 dot fusions (notably with
            # an act-order gather upstream) — compute the dot in f32
            xb, w = xb.astype(jnp.float32), w.astype(jnp.float32)
        acc = jnp.dot(xb, w, preferred_element_type=jnp.float32)
        k_step = pl.program_id(1)

        @pl.when(k_step == 0)
        def _():
            o_ref[:] = acc

        @pl.when(k_step != 0)
        def _():
            o_ref[:] = o_ref[:] + acc

    plane_specs = [
        pl.BlockSpec((k_tile * bp // 32, n_tile), lambda i, j: (j, i),
                     memory_space=pltpu.VMEM)
        for bp in seg.plane_bits
    ]
    if isinstance(seg, GptqSegment):
        meta_args = (seg.scale, seg.zero)
        meta_specs = [
            pl.BlockSpec((gt, n_tile), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gt, n_tile), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
        ]
    elif getattr(seg, "scale_f", None) is not None:
        meta_args = (seg.scale_f,)
        meta_specs = [
            pl.BlockSpec((gt, n_tile), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
        ]
    else:
        nsrc = seg.smax.shape[1]
        meta_args = (seg.qscale, seg.smax)
        meta_specs = [
            pl.BlockSpec((gt, n_tile), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gt, nsrc), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ]

    qbytes = sum(p.size * 4 for p in seg.planes)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m_pad, k_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            *plane_specs,
            *meta_specs,
        ],
        out_specs=pl.BlockSpec((m_pad, n_tile), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * rows_pad * n,
            bytes_accessed=qbytes + x.size * 2 + m_pad * n * 4,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(x, *seg.planes, *meta_args)


# ---------------------------------------------------------------------------
# Public entry points
# ---------------------------------------------------------------------------

def qmm(x: jax.Array, lin: QuantLinear, *, fused: bool | None = None) -> jax.Array:
    """x [..., K] -> [..., n] (padded width; caller slices to n_orig)."""
    lead = x.shape[:-1]
    k = x.shape[-1]
    assert k == lin.k, (k, lin.k)
    x2 = x.reshape(-1, k)
    m = x2.shape[0]
    if lin.perm is not None:
        x2 = jnp.take(x2, lin.perm, axis=1)

    if fused is None:
        fused = m <= FUSED_MAX_ROWS
    if fused:
        m_pad = _round_up(max(m, 1), _M_PAD)
        any_act8 = any(getattr(s, "act8", False) for s in lin.segments)
        # act8 segments quantize activations to int8 in-kernel-path;
        # feeding them from f32 avoids stacking a bf16 rounding under
        # the int8 one (exact segments still take bf16 MXU operands)
        xp = jnp.pad(x2, ((0, m_pad - m), (0, 0)))
        xp = xp.astype(jnp.float32 if any_act8 else jnp.bfloat16)
        out = None
        row = 0
        for seg in lin.segments:
            xs = jax.lax.slice_in_dim(xp, row, row + seg.rows, axis=1)
            if seg.rows < seg.rows_pad:
                xs = jnp.pad(xs, ((0, 0), (0, seg.rows_pad - seg.rows)))
            if not getattr(seg, "act8", False):
                xs = xs.astype(jnp.bfloat16)
            y = _fused_segment_matmul(xs, seg)
            out = y if out is None else out + y
            row += seg.rows
        y = out[:m]
    else:
        # bf16 feeds the MXU on TPU; the CPU backend's thunk runtime
        # cannot execute bf16 dots fused with the act-order gather
        # (DotThunk "BF16 x BF16 = F32" UNIMPLEMENTED), so tests and
        # CPU-mesh shards compute the dot in f32
        dt = jnp.bfloat16 if not _interpret() else jnp.float32
        y = None
        row = 0
        for seg in lin.segments:
            w = D.dequant_segment(seg)                     # [rows, n] bf16
            xs = jax.lax.slice_in_dim(x2, row, row + seg.rows, axis=1)
            part = jnp.dot(xs.astype(dt), w.astype(dt),
                           preferred_element_type=jnp.float32)
            y = part if y is None else y + part
            row += seg.rows
    if lin.bias is not None:
        y = y + jnp.pad(lin.bias.astype(jnp.float32),
                        (0, lin.n - lin.n_orig))
    return y.reshape(*lead, lin.n)


def linear_apply(x: jax.Array, lin, *, fused: bool | None = None) -> jax.Array:
    """Apply a (quantized or dense) linear, returning the logical width."""
    # LoRA wrapper (lora.py LoraLinear): base + scaled rank-r bypass
    if hasattr(lin, "base") and hasattr(lin, "a"):
        y = linear_apply(x, lin.base, fused=fused)
        xa = jnp.dot(x.astype(jnp.bfloat16), lin.a,
                     preferred_element_type=jnp.float32)
        y = y + lin.scaling * jnp.dot(
            xa.astype(jnp.bfloat16), lin.b,
            preferred_element_type=jnp.float32)
        return y
    if isinstance(lin, DenseLinear):
        # see the unfused-branch note in qmm(): CPU's thunk runtime
        # cannot execute some bf16 dot fusions, so off-TPU the dot runs
        # in f32 (tests / CPU-mesh shards only; TPU keeps bf16 MXU dots)
        dt = jnp.bfloat16 if not _interpret() else jnp.float32
        y = jnp.dot(x.astype(dt), lin.weight.astype(dt),
                    preferred_element_type=jnp.float32)
        if lin.bias is not None:
            y = y + lin.bias.astype(jnp.float32)
        return y
    y = qmm(x, lin, fused=fused)
    if lin.n != lin.n_orig:
        y = jax.lax.slice_in_dim(y, 0, lin.n_orig, axis=-1)
    return y
