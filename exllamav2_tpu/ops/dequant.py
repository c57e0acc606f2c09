"""Vectorized dequantization of packed bit-streams (jnp; also used in Pallas).

The stored EXL2/GPTQ bit-stream packs values per column, little-endian along K
(see quant/formats.py). Because every 32 rows occupy exactly `bits` words for
any width, unpacking is a *static* pattern: reshape the word stream into
blocks of `bits` words and emit 32 values per block with unrolled shifts —
pure VPU shift/mask ops, no gathers. This replaces the reference's CUDA
register shuffle + per-width dequant routines (cuda/quant/qdq_*.cuh) with an
XLA/Mosaic-friendly formulation.

All functions work both at the JAX level and inside Pallas kernel bodies.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["unpack_words", "exl2_scales", "dequant_segment_values",
           "dequant_exl2_segment", "dequant_gptq_segment", "dequant_linear"]


def unpack_words(words: jax.Array, bits: int) -> jax.Array:
    """Unpack uint32 words [qrows, N] -> int32 values [qrows*32//bits, N].

    Static unrolled shifts; 32 values per `bits`-word block.
    """
    qrows, n = words.shape
    w = words.astype(jnp.uint32)
    mask = jnp.uint32((1 << bits) - 1)
    if 32 % bits == 0:
        # one word yields 32/bits values; no cross-word reads
        per = 32 // bits
        vals = [(w >> jnp.uint32(i * bits)) & mask for i in range(per)]
        out = jnp.stack(vals, axis=1)                     # [qrows, per, N]
        return out.reshape(qrows * per, n).astype(jnp.int32)
    # 3/5/6-bit: blocks of `bits` words hold 32 values. A trailing short group
    # may leave a partial block; pad words with zeros (extra values are sliced
    # away by the caller).
    if qrows % bits != 0:
        pad = bits - qrows % bits
        w = jnp.concatenate([w, jnp.zeros((pad, n), jnp.uint32)], axis=0)
        qrows += pad
    blocks = w.reshape(qrows // bits, bits, n)
    vals = []
    for i in range(32):
        j = i * bits
        wi, s = j // 32, j % 32
        v = blocks[:, wi] >> jnp.uint32(s)
        if s + bits > 32:
            v = v | (blocks[:, wi + 1] << jnp.uint32(32 - s))
        vals.append(v & mask)
    out = jnp.stack(vals, axis=1)                         # [blocks, 32, N]
    return out.reshape(qrows // bits * 32, n).astype(jnp.int32)


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
    # subnormal range: round to a multiple of 2^-24 (RNE via jnp.round)
    sub = jnp.round(x * jnp.float32(2.0 ** 24)) * jnp.float32(2.0 ** -24)
    return jnp.where(x < jnp.float32(2.0 ** -14), sub, normal)


def exl2_scales(qscale: jax.Array, smax: jax.Array) -> jax.Array:
    """Decode EXL2 sqrt-encoded scales -> f32 [groups, N].

    Exact fp16 semantics of dq_scale (qdq_util.cuh:24-31): one fp16 rounding
    of (qs^2) * (q_scale_max/256). qs^2 <= 256 and smax are fp16-exact, so the
    f32 product is exact and a single fp16 rounding reproduces the reference.
    """
    qs = qscale.astype(jnp.int32)
    s = (qs * qs).astype(jnp.float32) * smax  # smax [groups, 1], fp16/256
    return fp16_round(s)


def _broadcast_groups(per_group: jax.Array, rows: int, group_rows: int) -> jax.Array:
    """Expand [groups, N] -> [rows, N] repeating each group row group_rows times."""
    groups, n = per_group.shape
    full = jnp.repeat(per_group, group_rows, axis=0, total_repeat_length=groups * group_rows)
    if groups * group_rows == rows:
        return full
    return full[:rows]


def dequant_segment_values(seg) -> jax.Array:
    """Unpack a segment's quantized integers -> int32 [rows, N]."""
    vals = unpack_words(seg.qweight, seg.bits)
    return vals[:seg.rows]


def dequant_exl2_segment(seg, dtype=jnp.bfloat16) -> jax.Array:
    """Dequantize a QuantSegment -> [rows, N]."""
    vals = dequant_segment_values(seg)
    scales = exl2_scales(seg.qscale, seg.smax)
    zero = float(2 ** (seg.bits - 1))
    srows = _broadcast_groups(scales, seg.rows, seg.group_rows)
    return ((vals.astype(jnp.float32) - zero) * srows).astype(dtype)


def dequant_gptq_segment(seg, dtype=jnp.bfloat16) -> jax.Array:
    """Dequantize a GptqSegment -> [rows, N]: (q - zero) * scale."""
    vals = dequant_segment_values(seg)
    zrows = _broadcast_groups(seg.zero.astype(jnp.int32), seg.rows, seg.group_rows)
    srows = _broadcast_groups(seg.scale.astype(jnp.float32), seg.rows, seg.group_rows)
    return ((vals - zrows).astype(jnp.float32) * srows).astype(dtype)


def dequant_segment(seg, dtype=jnp.bfloat16) -> jax.Array:
    from exllamav2_tpu.quant.qtensor import GptqSegment
    if isinstance(seg, GptqSegment):
        return dequant_gptq_segment(seg, dtype)
    return dequant_exl2_segment(seg, dtype)


def dequant_linear(ql, dtype=jnp.bfloat16, original_order: bool = True) -> jax.Array:
    """Fully dequantize a QuantLinear -> [K, N] (activation/stored order)."""
    w = jnp.concatenate([dequant_segment(s, dtype) for s in ql.segments], axis=0)
    if original_order and ql.perm is not None:
        # stored row j corresponds to original row perm[j]
        w = jnp.zeros_like(w).at[ql.perm].set(w)
    return w
