"""Vectorized dequantization of plane-packed weights (jnp; also used in Pallas).

Works on the TPU device layout produced by quant/qtensor.py: per-bit-plane
uint32 words, strided within 256-row sub-blocks so that unpacking is a static
pattern of full-block shifts + concats (natural row order, no interleaving
relayouts). Replaces the reference's CUDA register shuffle + per-width dequant
routines (cuda/quant/qdq_*.cuh) with an XLA/Mosaic-friendly formulation.

All functions work both at the JAX level and inside Pallas kernel bodies.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from exllamav2_tpu.quant.qtensor import SUB_BLOCK, GptqSegment

__all__ = ["fp16_round", "unpack_plane", "unpack_planes", "exl2_scales",
           "broadcast_groups", "dequant_segment", "dequant_linear"]


def fp16_round(x: jax.Array) -> jax.Array:
    """Round f32 (non-negative, finite) to the nearest fp16 value, in f32.

    Bit-level emulation (Mosaic has no f16<->f32 casts): RNE-truncate the
    mantissa to 10 bits for the fp16 normal range, explicit step rounding for
    fp16 subnormals (< 2^-14).
    """
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    odd = (u >> jnp.uint32(13)) & jnp.uint32(1)
    r = (u + jnp.uint32(0xFFF) + odd) & jnp.uint32(0xFFFFE000)
    normal = jax.lax.bitcast_convert_type(r, jnp.float32)
    sub = jnp.round(x * jnp.float32(2.0 ** 24)) * jnp.float32(2.0 ** -24)
    return jnp.where(x < jnp.float32(2.0 ** -14), sub, normal)


def unpack_plane(words: jax.Array, bp: int) -> jax.Array:
    """Unpack one plane's words [nsb*Qsb, N] -> int32 values [nsb*256, N].

    Qsb = SUB_BLOCK*bp/32; natural row r of sub-block sb lives in word
    (r mod Qsb) at bit slot (r div Qsb). Formulated as one broadcasted
    shift over a fresh leading axis + leading-dim reshapes (no concats —
    Mosaic lowers these as pure layout ops, keeping the VPU free for the
    shift/mask itself).
    """
    qrows, n = words.shape
    qsb = SUB_BLOCK * bp // 32
    per = 32 // bp
    nsb = qrows // qsb
    assert nsb * qsb == qrows, (qrows, bp)
    w = words.astype(jnp.uint32).reshape(nsb, 1, qsb, n)
    shifts = jax.lax.broadcasted_iota(
        jnp.uint32, (1, per, 1, 1), 1) * jnp.uint32(bp)
    mask = jnp.uint32((1 << bp) - 1)
    vals = ((w >> shifts) & mask).astype(jnp.int32)
    return vals.reshape(qrows * per, n)


def unpack_planes(planes, plane_bits) -> jax.Array:
    """Combine bit planes -> int32 values [rows_pad, N]."""
    total = None
    shift = 0
    for bp, words in zip(plane_bits, planes):
        v = unpack_plane(words, bp)
        total = v if total is None else total | (v << shift)
        shift += bp
    return total


def exl2_scales(qscale: jax.Array, smax: jax.Array) -> jax.Array:
    """Decode EXL2 sqrt-encoded scales -> f32 [groups, N].

    Exact fp16 semantics of dq_scale (qdq_util.cuh:24-31): one fp16 rounding
    of (qs^2) * (q_scale_max/256). qs^2 <= 256 and smax are fp16-exact, so the
    f32 product is exact and a single fp16 rounding reproduces the reference.
    """
    qs = qscale.astype(jnp.int32)
    s = (qs * qs).astype(jnp.float32) * smax  # smax [groups, 1], fp16/256
    return fp16_round(s)


def broadcast_groups(per_group: jax.Array, group_rows: int) -> jax.Array:
    """[groups, N] -> [groups*group_rows, N] via broadcast over a fresh
    middle axis + leading-dim reshape (jnp.repeat lowers to an unsupported
    scatter; per-group concat loops cost VPU relayouts)."""
    groups, n = per_group.shape
    if groups == 1:
        return jnp.broadcast_to(per_group, (group_rows, n))
    out = jnp.broadcast_to(per_group[:, None, :], (groups, group_rows, n))
    return out.reshape(groups * group_rows, n)


def dequant_segment(seg, dtype=jnp.bfloat16, rows: int | None = None) -> jax.Array:
    """Dequantize a segment -> [rows or seg.rows, N]."""
    vals = unpack_planes(seg.planes, seg.plane_bits)
    if isinstance(seg, GptqSegment):
        srows = broadcast_groups(seg.scale, seg.group_rows)[:seg.rows_pad]
        zrows = broadcast_groups(seg.zero, seg.group_rows)[:seg.rows_pad]
        w = ((vals - zrows).astype(jnp.float32) * srows).astype(dtype)
    else:
        if getattr(seg, "scale_f", None) is not None:
            scales = seg.scale_f.astype(jnp.float32)
        elif getattr(seg, "src_cols", ()):
            # column-merged segment: expand per-source smax columns to
            # full width before the exact decode (merge_linears)
            n = seg.qscale.shape[1]
            bounds = list(seg.src_cols) + [n]
            gt = seg.qscale.shape[0]
            smax_full = jnp.concatenate([
                jnp.broadcast_to(seg.smax[:, i:i + 1],
                                 (gt, bounds[i + 1] - bounds[i]))
                for i in range(len(seg.src_cols))], axis=1)
            scales = exl2_scales(seg.qscale, smax_full)
        else:
            scales = exl2_scales(seg.qscale, seg.smax)
        srows = broadcast_groups(scales, seg.group_rows)[:seg.rows_pad]
        zero = float(2 ** (seg.bits - 1))
        w = ((vals.astype(jnp.float32) - zero) * srows).astype(dtype)
    return w[:seg.rows if rows is None else rows]


def precompute_scales_linear(lin):
    """Decode a QuantLinear's EXL2 sqrt-encoded group scales once at load
    into bf16 rows carried alongside the segment (QuantSegment.scale_f).

    The fused kernel then streams the decoded scales instead of running
    the in-kernel decode: ~+6% weight-stream bytes for ~2 fewer VPU
    ops/value (docs/DESIGN.md round-3 decode push). Near-exact, not
    bitwise: the fp16-rounded scale takes one extra bf16 rounding
    (<=2^-9 relative), inside the bf16 rounding the kernel's dequant
    output takes anyway."""
    import dataclasses
    from exllamav2_tpu.quant.qtensor import QuantLinear
    if not isinstance(lin, QuantLinear):
        return lin
    segs = []
    for seg in lin.segments:
        if isinstance(seg, GptqSegment) or \
                getattr(seg, "scale_f", None) is not None:
            segs.append(seg)
            continue
        if getattr(seg, "src_cols", ()):
            # column-merged segment (merge_serving_weights): smax holds
            # one column per merged source — expand to full width first
            n = seg.qscale.shape[1]
            bounds = list(seg.src_cols) + [n]
            gt = seg.qscale.shape[0]
            smax = jnp.concatenate([
                jnp.broadcast_to(seg.smax[:, i:i + 1],
                                 (gt, bounds[i + 1] - bounds[i]))
                for i in range(len(seg.src_cols))], axis=1)
        else:
            smax = seg.smax
        sf = exl2_scales(seg.qscale, smax).astype(jnp.bfloat16)
        segs.append(dataclasses.replace(seg, scale_f=sf))
    return dataclasses.replace(lin, segments=tuple(segs))


def precompute_model_scales(tree):
    """Apply precompute_scales_linear to every QuantLinear in a pytree."""
    import jax as _jax
    from exllamav2_tpu.quant.qtensor import QuantLinear

    def f(x):
        return precompute_scales_linear(x) \
            if isinstance(x, QuantLinear) else x

    return _jax.tree_util.tree_map(
        f, tree, is_leaf=lambda x: isinstance(x, QuantLinear))


def _pad_w4a8_rows(seg, max_overhead: float = 0.125):
    """Zero-pad a GPTQ segment's K rows so the w4a8 tile picker can use
    kt = lcm(SUB_BLOCK, 8*group_rows) instead of falling back to
    kt = rows_pad (a 1-2 step grid with almost no DMA/compute overlap).

    Measured on-chip (round 5): the 7B down_proj [11008, 4096] runs
    460 GB/s unpadded (kt=11008, grid (2,1)) vs 713 GB/s padded to
    11264 (kt=1024, grid (1,11)) — +55% on that stream for +2.3%
    bytes. Exact: padded activation rows are zero, so their int8
    partials and group sums vanish regardless of the (zero-filled)
    scale/zero rows; plane packing is sub-block-sequential, so
    appending whole zero sub-blocks is layout-correct.
    """
    import math
    gr = seg.group_rows
    unit = (SUB_BLOCK * 8 * gr) // math.gcd(SUB_BLOCK, 8 * gr)
    rows_pad = seg.rows_pad
    if unit > 1024 or rows_pad % unit == 0:
        return seg         # already kt-friendly, or no kt <= cap exists
    new_pad = -(-rows_pad // unit) * unit
    if (new_pad - rows_pad) > max_overhead * rows_pad:
        return seg         # padding would cost more bytes than it saves
    import dataclasses
    add = new_pad - rows_pad
    planes = tuple(
        jnp.concatenate(
            [p, jnp.zeros((add * bp // 32, p.shape[1]), p.dtype)], axis=0)
        for p, bp in zip(seg.planes, seg.plane_bits))
    gadd = add // gr
    scale = jnp.concatenate(
        [seg.scale, jnp.zeros((gadd, seg.scale.shape[1]),
                              seg.scale.dtype)], axis=0)
    zero = jnp.concatenate(
        [seg.zero, jnp.zeros((gadd, seg.zero.shape[1]),
                             seg.zero.dtype)], axis=0)
    return dataclasses.replace(seg, planes=planes, scale=scale, zero=zero)


def enable_w4a8_linear(lin):
    """Flag every segment of a QuantLinear for the int8-MXU decode path
    (ops/qmm._w4a8_segment_matmul): per-token per-group absmax int8
    activation quantization feeding batched int8 MXU group partials.

    NOT exact quantized-model semantics — an opt-in W4A8 approximation
    whose quality cost is measured by tools/quality_w4a8.py (QUALITY.md).
    The exact formulations plateau at the v5e VPU-convert bound
    (~0.5x HBM peak over three rounds of measurement, docs/DESIGN.md);
    the int8 form probed 601 GB/s (~1.6x) because the per-value
    int->bf16 convert disappears — the MXU consumes the 4-bit values as
    int8 directly and the scale/zero fixups move to the group partials.

    EXL2 segments are prescaled first (the kernel streams bf16 scale_f
    rows; the sqrt decode doesn't pay for itself once scales apply to
    partials). Reference analog: none — the reference is W4A16
    throughout (cuda/q_gemm_kernel.cuh); this mode exists because TPU
    int8 MXU throughput is the one lever past the convert bound."""
    import dataclasses
    from exllamav2_tpu.quant.qtensor import QuantLinear
    if not isinstance(lin, QuantLinear):
        return lin
    lin = precompute_scales_linear(lin)
    segs = []
    for seg in lin.segments:
        if seg.bits > 8:
            segs.append(seg)
            continue
        repl = {"act8": True}
        if isinstance(seg, GptqSegment):
            # kt-friendly K padding (exact; see _pad_w4a8_rows) BEFORE
            # the meta compression so scale_bf/zs_bf match the padded
            # group count
            seg = _pad_w4a8_rows(seg)
        if isinstance(seg, GptqSegment) and seg.zs_bf is None:
            # compressed meta for the int8 kernel: bf16 scales and the
            # precomputed (zero - off) * scale product (off folds the
            # 8-bit int8-range shift) — halves the meta stream
            off = 128 if seg.bits == 8 else 0
            repl["scale_bf"] = seg.scale.astype(jnp.bfloat16)
            repl["zs_bf"] = ((seg.zero.astype(jnp.float32) - float(off))
                             * seg.scale).astype(jnp.bfloat16)
        segs.append(dataclasses.replace(seg, **repl))
    return dataclasses.replace(lin, segments=tuple(segs))


def enable_w4a8(tree, skip_head: bool = True):
    """Apply enable_w4a8_linear to every QuantLinear in a model pytree.

    skip_head keeps the lm_head on the exact path: logits feed the
    sampler directly, so head quantization error lands 1:1 on token
    probabilities while the head is a single matrix (small fraction of
    the weight stream)."""
    import jax as _jax
    import dataclasses
    from exllamav2_tpu.quant.qtensor import QuantLinear

    def f(x):
        return enable_w4a8_linear(x) if isinstance(x, QuantLinear) else x

    head = getattr(tree, "head", None)
    out = _jax.tree_util.tree_map(
        f, tree, is_leaf=lambda x: isinstance(x, QuantLinear))
    if skip_head and head is not None:
        out = dataclasses.replace(out, head=precompute_model_scales(head))
    return out


def dequant_linear(ql, dtype=jnp.bfloat16, original_order: bool = True) -> jax.Array:
    """Fully dequantize a QuantLinear -> [K, N] (activation/stored order)."""
    w = jnp.concatenate([dequant_segment(s, dtype) for s in ql.segments], axis=0)
    if original_order and ql.perm is not None:
        # stored row j corresponds to original row perm[j]
        w = jnp.zeros_like(w).at[ql.perm].set(w)
    return w


def merge_linears(lins):
    """Column-concat compatible QuantLinears into one wider linear.

    The decode hot path is HBM-bound AND pays per-kernel-call overhead;
    merging q|k|v (and gate|up) halves the pallas call count per layer
    (7 -> 4) with one wider weight stream (docs/DESIGN.md round-3 decode
    push; reference analog: fused QKV in ext_qattn.cpp).

    Requirements: same K, identical (or absent) act-order perm, equal
    segment structure, exact widths (no lane padding). Both formats
    merge BITWISE-EXACTLY: GPTQ concats its explicit per-group scales;
    EXL2 keeps each source's smax as a column of one [gt, n_sources]
    array and the kernel selects the right column per n-tile
    (QuantSegment.src_cols). Returns None when not mergeable."""
    import dataclasses
    import numpy as np
    from exllamav2_tpu.quant.qtensor import QuantLinear

    if any(not isinstance(l, QuantLinear) for l in lins):
        return None
    k0 = lins[0].k
    if any(l.k != k0 or l.n != l.n_orig for l in lins):
        return None
    have_perm = [l.perm is not None for l in lins]
    if any(have_perm) and not all(have_perm):
        return None
    if all(have_perm):
        p0 = np.asarray(lins[0].perm)
        if any(not np.array_equal(p0, np.asarray(l.perm))
               for l in lins[1:]):
            return None
    nseg = len(lins[0].segments)
    if any(len(l.segments) != nseg for l in lins):
        return None

    def skey(s):
        return (type(s).__name__, s.rows, s.bits, tuple(s.plane_bits),
                s.group_rows, s.planes[0].shape[0])

    segs = []
    for i in range(nseg):
        ss = [l.segments[i] for l in lins]
        s0 = ss[0]
        if any(skey(s) != skey(s0) for s in ss):
            return None
        planes = tuple(
            jnp.concatenate([s.planes[j] for s in ss], axis=1)
            for j in range(len(s0.planes)))
        if isinstance(s0, GptqSegment):
            repl = dict(
                planes=planes,
                scale=jnp.concatenate([s.scale for s in ss], axis=1),
                zero=jnp.concatenate([s.zero for s in ss], axis=1))
            if all(s.scale_bf is not None for s in ss):
                repl["scale_bf"] = jnp.concatenate(
                    [s.scale_bf for s in ss], axis=1)
                repl["zs_bf"] = jnp.concatenate(
                    [s.zs_bf for s in ss], axis=1)
            else:
                repl["scale_bf"] = repl["zs_bf"] = None
            segs.append(dataclasses.replace(s0, **repl))
        else:
            # EXACT exl2 merge: per-source smax kept as columns of one
            # [gt, n_sources] array; the kernel selects the source's
            # column per n-tile (src_cols boundaries), so the decoded
            # scales are bit-identical to the unmerged matrices
            src_cols = tuple(int(np.cumsum([0] + [l.n for l in lins])[j])
                             for j in range(len(lins)))
            segs.append(dataclasses.replace(
                s0, planes=planes,
                qscale=jnp.concatenate([s.qscale for s in ss], axis=1),
                smax=jnp.concatenate([s.smax for s in ss], axis=1),
                scale_f=None, src_cols=src_cols))
    n = sum(l.n for l in lins)
    bias = None
    if any(l.bias is not None for l in lins):
        bias = jnp.concatenate([
            l.bias if l.bias is not None else jnp.zeros(l.n, jnp.float32)
            for l in lins])
    out = QuantLinear(segments=tuple(segs), perm=lins[0].perm,
                      bias=bias, k=k0, n=n, n_orig=n)
    if any(getattr(s, "act8", False) for s in out.segments) or any(
            getattr(s, "scale_f", None) is not None
            for l in lins for s in l.segments):
        # the merge rebuilt EXL2 segments with scale_f=None; re-prescale
        # when the sources carried prescaled scales (the production
        # default — a LoRA attach/detach cycle re-merges via set_loras
        # and would otherwise silently drop the prescale win) and always
        # for act8 segments (the w4a8 kernel requires scale_f)
        out = precompute_scales_linear(out)
    return out


def strip_merged_weights(w):
    """Drop the merged qkv / gate_up fast-path attrs so the per-matrix
    linears are authoritative again (required when LoRA wraps q/k/v —
    the forward prefers the merged stream, which would silently bypass
    the adapters)."""
    import dataclasses
    from exllamav2_tpu.models.modules import MLPWeights

    layers = []
    for lw in w.layers:
        aw = lw.attn
        if getattr(aw, "qkv", None) is not None:
            aw = dataclasses.replace(aw, qkv=None)
        mlp = lw.mlp
        if isinstance(mlp, MLPWeights) \
                and getattr(mlp, "gate_up", None) is not None:
            mlp = dataclasses.replace(mlp, gate_up=None)
        layers.append(dataclasses.replace(lw, attn=aw, mlp=mlp))
    return dataclasses.replace(w, layers=tuple(layers))


def merge_serving_weights(w):
    """Attach merged qkv / gate_up decode fast-path linears to every
    layer where the structure allows (bitwise-exact; see merge_linears).
    Single-chip serving only: the fused-TP shard path rebuilds from the
    unmerged linears (a column shard of a merged array would interleave
    q|k|v boundaries)."""
    import dataclasses
    from exllamav2_tpu.models.modules import MLPWeights

    layers = []
    for lw in w.layers:
        aw = lw.attn
        qkv = merge_linears([aw.q, aw.k, aw.v])
        if qkv is not None:
            aw = dataclasses.replace(aw, qkv=qkv)
        mlp = lw.mlp
        if isinstance(mlp, MLPWeights) and mlp.gate is not None:
            gu = merge_linears([mlp.gate, mlp.up])
            if gu is not None:
                mlp = dataclasses.replace(mlp, gate_up=gu)
        layers.append(dataclasses.replace(lw, attn=aw, mlp=mlp))
    return dataclasses.replace(w, layers=tuple(layers))
