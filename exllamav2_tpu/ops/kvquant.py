"""KV-cache quantization: FP8 / Q4 / Q8 with 32-wide Hadamard rotation.

TPU re-formulation of the reference CUDA kernels (cuda/cache_q.cuh:1-187,
cuda/cache.cu:25-37): the warp-shuffle Hadamard butterfly becomes a 32x32
matmul against the (unnormalized, +-1) Hadamard matrix — a trivially fused
VPU/MXU op — and group absmax/quant/pack are plain vector ops XLA fuses
into the surrounding attention step.

Scheme (exactly the reference's):
  * groups of 32 consecutive elements along head_dim
  * rotate: r = x @ H32 (unnormalized; the 1/32 folds into dequant)
  * Q4: q = clamp(round(r/absmax * 8 + 8), 0, 15),  scale = absmax/8
  * Q8: q = clamp(round(r/absmax * 128 + 128), 0, 255), scale = absmax/128
  * dequant: (q - mid) * scale, then @ H32 * (1/32)
  * FP8: e5m2 cast (reference truncates fp16 bits, cache.cu:25-37; we use
    RNE cast which is strictly more accurate)
  * "Q6" = Q8 keys + Q4 values (cache.cu:259-269)

Q4 packs two nibbles per byte along head_dim, so the cache really is 4.25
bits/value (incl. fp16-ish scale per 32).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["hadamard32", "kv_quant", "kv_dequant", "cache_bytes_per_el",
           "CACHE_KINDS"]

CACHE_KINDS = ("bf16", "fp8", "q4", "q8")
_GROUP = 32


def _had(n: int) -> np.ndarray:
    h = np.array([[1]], np.float32)
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return h


_H32 = _had(_GROUP)


def hadamard32(dtype=jnp.float32) -> jax.Array:
    """Unnormalized 32x32 Hadamard (entries +-1); H @ H = 32 I."""
    return jnp.asarray(_H32, dtype)


def kv_quant(x: jax.Array, kind: str):
    """x [..., D] float -> (data, scales|None) for the given cache kind."""
    if kind == "bf16":
        return x.astype(jnp.bfloat16), None
    if kind == "fp8":
        return x.astype(jnp.float8_e5m2), None
    d = x.shape[-1]
    assert d % _GROUP == 0, d
    g = d // _GROUP
    xf = x.astype(jnp.float32).reshape(*x.shape[:-1], g, _GROUP)
    r = jnp.einsum("...i,ij->...j", xf, hadamard32())
    absmax = jnp.max(jnp.abs(r), axis=-1, keepdims=True)
    absmax = jnp.maximum(absmax, 1e-8)
    if kind == "q4":
        q = jnp.clip(jnp.round(r / absmax * 8.0 + 8.0), 0, 15)
        q = q.reshape(*x.shape[:-1], d).astype(jnp.uint8)
        # half-split packing: byte j = el[j] | el[j + d/2] << 4, so unpack
        # is two masked halves concatenated in natural element order — no
        # lane interleave (the paged-attention kernel dequants in place)
        lo = q[..., :d // 2]
        hi = q[..., d // 2:]
        data = lo | (hi << 4)
        scales = (absmax[..., 0] / 8.0).astype(jnp.bfloat16)
        return data, scales
    if kind == "q8":
        q = jnp.clip(jnp.round(r / absmax * 128.0 + 128.0), 0, 255)
        data = q.astype(jnp.uint8).reshape(*x.shape[:-1], d)
        scales = (absmax[..., 0] / 128.0).astype(jnp.bfloat16)
        return data, scales
    raise ValueError(kind)


def kv_dequant(data: jax.Array, scales: jax.Array | None, kind: str,
               dtype=jnp.bfloat16) -> jax.Array:
    """Inverse of kv_quant -> [..., D] in `dtype`."""
    if kind == "bf16":
        return data.astype(dtype)
    if kind == "fp8":
        return data.astype(dtype)
    if kind == "q4":
        lo = (data & 0x0F).astype(jnp.float32) - 8.0
        hi = ((data >> 4) & 0x0F).astype(jnp.float32) - 8.0
        d2 = data.shape[-1]
        q = jnp.concatenate([lo, hi], axis=-1)         # natural order
        g = q.shape[-1] // _GROUP
        q = q.reshape(*q.shape[:-1], g, _GROUP)
        r = q * scales.astype(jnp.float32)[..., None]
        y = jnp.einsum("...i,ij->...j", r, hadamard32()) * (1.0 / _GROUP)
        return y.reshape(*data.shape[:-1], d2 * 2).astype(dtype)
    if kind == "q8":
        d = data.shape[-1]
        g = d // _GROUP
        q = data.astype(jnp.float32).reshape(*data.shape[:-1], g, _GROUP) \
            - 128.0
        r = q * scales.astype(jnp.float32)[..., None]
        y = jnp.einsum("...i,ij->...j", r, hadamard32()) * (1.0 / _GROUP)
        return y.reshape(*data.shape[:-1], d).astype(dtype)
    raise ValueError(kind)


def cache_bytes_per_el(kind: str) -> float:
    """HBM bytes per cached element (incl. scales)."""
    return {"bf16": 2.0, "fp8": 1.0,
            "q4": 0.5 + 2.0 / _GROUP, "q8": 1.0 + 2.0 / _GROUP}[kind]


def data_shape(kind: str, d: int) -> tuple[int, ...]:
    """Trailing data dims for one [.., D] row of cache."""
    return {"bf16": (d,), "fp8": (d,), "q4": (d // 2,), "q8": (d,)}[kind]


def data_dtype(kind: str):
    return {"bf16": jnp.bfloat16, "fp8": jnp.float8_e5m2,
            "q4": jnp.uint8, "q8": jnp.uint8}[kind]
