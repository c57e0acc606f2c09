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
        scales = exl2_scales(seg.qscale, seg.smax)
        srows = broadcast_groups(scales, seg.group_rows)[:seg.rows_pad]
        zero = float(2 ** (seg.bits - 1))
        w = ((vals.astype(jnp.float32) - zero) * srows).astype(dtype)
    return w[:seg.rows if rows is None else rows]


def dequant_linear(ql, dtype=jnp.bfloat16, original_order: bool = True) -> jax.Array:
    """Fully dequantize a QuantLinear -> [K, N] (activation/stored order)."""
    w = jnp.concatenate([dequant_segment(s, dtype) for s in ql.segments], axis=0)
    if original_order and ql.perm is not None:
        # stored row j corresponds to original row perm[j]
        w = jnp.zeros_like(w).at[ql.perm].set(w)
    return w
