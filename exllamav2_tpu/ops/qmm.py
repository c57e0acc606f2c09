"""Quantized matmul: y = x @ dequant(W).

Two TPU execution paths, replacing the reference's CUDA GEMV/cuBLAS split
(cuda/q_gemm.cu:44-265):

  * decode (few rows): a fused Pallas kernel streams the packed words
    HBM->VMEM once, unpacks + scales on the VPU and feeds the MXU — the
    HBM-bandwidth-bound path that sets tokens/s;
  * prefill (many rows): dequantize tiles to bf16 and let XLA run a normal
    MXU matmul (compute-bound, dequant cost amortized).

Mixed-bit-width EXL2 matrices are a sum of per-segment matmuls over disjoint
K-row ranges. Act-order is an activation column gather (x[:, perm]).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from exllamav2_tpu.quant.qtensor import (
    QuantLinear, DenseLinear, QuantSegment, GptqSegment, SEG_K_PAD)
from exllamav2_tpu.ops import dequant as D

__all__ = ["qmm", "linear_apply"]

# Below this many activation rows the fused kernel wins (HBM-bound regime);
# above it, reconstruct + MXU matmul (cuda/q_gemm.cu uses the same split at
# MAX_Q_GEMM_ROWS).
FUSED_MAX_ROWS = 32

_M_PAD = 16          # sublane padding for the activation tile
_N_TILE = 512
_K_TILE = SEG_K_PAD


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# Fused kernels
# ---------------------------------------------------------------------------

def _kernel_exl2(x_ref, qw_ref, qs_ref, smax_ref, o_ref, *, bits, group_rows):
    k_step = pl.program_id(1)

    vals = D.unpack_words(qw_ref[:], bits)                  # [K_TILE, N_TILE]
    scales = D.exl2_scales(qs_ref[:], smax_ref[:])          # [G_t, N_TILE]
    g_t = scales.shape[0]
    srows = jnp.broadcast_to(
        scales[:, None, :], (g_t, group_rows, scales.shape[1])
    ).reshape(g_t * group_rows, scales.shape[1])
    zero = float(2 ** (bits - 1))
    w = ((vals.astype(jnp.float32) - zero) * srows).astype(jnp.bfloat16)

    acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

    @pl.when(k_step == 0)
    def _():
        o_ref[:] = acc

    @pl.when(k_step != 0)
    def _():
        o_ref[:] = o_ref[:] + acc


def _kernel_gptq(x_ref, qw_ref, scale_ref, zero_ref, o_ref, *, bits, group_rows):
    k_step = pl.program_id(1)

    vals = D.unpack_words(qw_ref[:], bits)
    g_t, n_t = scale_ref.shape

    def expand(a):
        return jnp.broadcast_to(
            a[:, None, :], (g_t, group_rows, n_t)).reshape(g_t * group_rows, n_t)

    srows = expand(scale_ref[:].astype(jnp.float32))
    zrows = expand(zero_ref[:].astype(jnp.int32))
    w = ((vals - zrows).astype(jnp.float32) * srows).astype(jnp.bfloat16)

    acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

    @pl.when(k_step == 0)
    def _():
        o_ref[:] = acc

    @pl.when(k_step != 0)
    def _():
        o_ref[:] = o_ref[:] + acc


def _fused_segment_matmul(x: jax.Array, seg) -> jax.Array:
    """x [M_pad, rows_pad] bf16 (zero-padded) @ dequant(seg) -> [M_pad, N] f32."""
    m_pad, k_pad = x.shape
    rows_pad = seg.qweight.shape[0] * 32 // seg.bits
    assert k_pad == rows_pad, (k_pad, rows_pad)
    n = seg.qweight.shape[1]
    n_tile = min(_N_TILE, n)
    k_tile = min(_K_TILE, rows_pad)
    assert n % n_tile == 0 and rows_pad % k_tile == 0
    qrows_tile = k_tile * seg.bits // 32
    g_tile = k_tile // seg.group_rows
    grid = (n // n_tile, rows_pad // k_tile)

    common = dict(bits=seg.bits, group_rows=seg.group_rows)
    if isinstance(seg, GptqSegment):
        kernel = functools.partial(_kernel_gptq, **common)
        scale_args = (seg.scale, seg.zero)
        scale_specs = [
            pl.BlockSpec((g_tile, n_tile), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g_tile, n_tile), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
        ]
    else:
        kernel = functools.partial(_kernel_exl2, **common)
        scale_args = (seg.qscale, seg.smax)
        scale_specs = [
            pl.BlockSpec((g_tile, n_tile), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g_tile, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ]

    flops = 2 * m_pad * rows_pad * n
    bytes_accessed = (seg.qweight.size * 4 + x.size * 2 + m_pad * n * 4)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m_pad, k_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qrows_tile, n_tile), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            *scale_specs,
        ],
        out_specs=pl.BlockSpec((m_pad, n_tile), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0),
        interpret=_interpret(),
    )(x, seg.qweight, *scale_args)


# ---------------------------------------------------------------------------
# Public entry points
# ---------------------------------------------------------------------------

def _segment_x(x2: jax.Array, seg, row_start: int) -> jax.Array:
    """Slice + zero-pad the activation columns for one segment."""
    rows_pad = seg.qweight.shape[0] * 32 // seg.bits
    xs = jax.lax.slice_in_dim(x2, row_start, row_start + seg.rows, axis=1)
    if seg.rows < rows_pad:
        xs = jnp.pad(xs, ((0, 0), (0, rows_pad - seg.rows)))
    return xs


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
        xp = jnp.pad(x2, ((0, m_pad - m), (0, 0))).astype(jnp.bfloat16)
        out = None
        row = 0
        for seg in lin.segments:
            xs = _segment_x(xp, seg, row)
            y = _fused_segment_matmul(xs, seg)
            out = y if out is None else out + y
            row += seg.rows
        y = out[:m]
    else:
        y = None
        row = 0
        for seg in lin.segments:
            w = D.dequant_segment(seg)                     # [rows, n] bf16
            xs = jax.lax.slice_in_dim(x2, row, row + seg.rows, axis=1)
            part = jnp.dot(xs.astype(jnp.bfloat16), w,
                           preferred_element_type=jnp.float32)
            y = part if y is None else y + part
            row += seg.rows
    if lin.bias is not None:
        y = y + jnp.pad(lin.bias.astype(jnp.float32),
                        (0, lin.n - lin.n_orig))
    return y.reshape(*lead, lin.n)


def linear_apply(x: jax.Array, lin, *, fused: bool | None = None) -> jax.Array:
    """Apply a (quantized or dense) linear, returning the logical width."""
    if isinstance(lin, DenseLinear):
        y = jnp.dot(x.astype(jnp.bfloat16), lin.weight,
                    preferred_element_type=jnp.float32)
        if lin.bias is not None:
            y = y + lin.bias.astype(jnp.float32)
        return y
    y = qmm(x, lin, fused=fused)
    if lin.n != lin.n_orig:
        y = jax.lax.slice_in_dim(y, 0, lin.n_orig, axis=-1)
    return y
