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

__all__ = ["hadamard32", "hadamard_for", "group_for", "num_groups",
           "kv_quant", "kv_dequant", "cache_bytes_per_el", "CACHE_KINDS"]

CACHE_KINDS = ("bf16", "fp8", "q4", "q8")
_GROUP = 32


def _paley1(q: int) -> np.ndarray:
    """Paley-I Hadamard of order q+1 (q prime, q ≡ 3 mod 4): H = S + I
    with S the skew matrix of the quadratic-residue (Jacobsthal)
    pattern. Covers orders 12/20/24 which Sylvester doubling cannot
    (reference ships stored Paley tables, hadamard.py)."""
    residues = {(i * i) % q for i in range(1, q)}
    chi = np.array([0] + [1 if i in residues else -1 for i in range(1, q)],
                   np.float32)
    qm = chi[(np.arange(q)[:, None] - np.arange(q)[None, :]) % q]
    smat = np.zeros((q + 1, q + 1), np.float32)
    smat[0, 1:] = 1.0
    smat[1:, 0] = -1.0
    smat[1:, 1:] = qm
    h = smat + np.eye(q + 1, dtype=np.float32)
    assert np.allclose(h @ h.T, (q + 1) * np.eye(q + 1))
    return h


def _had(n: int) -> np.ndarray:
    """Unnormalized Hadamard of order n: Sylvester doubling from 1 (n a
    power of two) or from a Paley-I seed (n = 2^a * {12, 20, 24})."""
    for seed in (12, 20, 24):
        if n % seed == 0 and (n // seed) & (n // seed - 1) == 0:
            h = _paley1(seed - 1)
            break
    else:
        assert n & (n - 1) == 0, f"no Hadamard construction for {n}"
        h = np.array([[1]], np.float32)
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return h


def group_for(d: int) -> int:
    """Rotation group width for a head_dim: largest constructible
    Hadamard order dividing d (32 for the common dims; 16 for 80/112,
    20 for 100, 24 for 72 ...)."""
    for g in (32, 24, 20, 16, 12, 8, 4):
        if d % g == 0:
            return g
    raise ValueError(f"head_dim {d} not divisible by 4")


def num_groups(d: int) -> int:
    """Scale entries per cached [.., D] row for quantized kinds."""
    return d // group_for(d)


_H32 = _had(_GROUP)
_HAD_CACHE: dict[int, np.ndarray] = {_GROUP: _H32}


def hadamard32(dtype=jnp.float32) -> jax.Array:
    """Unnormalized 32x32 Hadamard (entries +-1); H @ H = 32 I."""
    return jnp.asarray(_H32, dtype)


def hadamard_for(g: int, dtype=jnp.float32) -> jax.Array:
    """Unnormalized g x g Hadamard; H @ H.T = g I."""
    if g not in _HAD_CACHE:
        _HAD_CACHE[g] = _had(g)
    return jnp.asarray(_HAD_CACHE[g], dtype)


def kv_quant(x: jax.Array, kind: str):
    """x [..., D] float -> (data, scales|None) for the given cache kind."""
    if kind == "bf16":
        return x.astype(jnp.bfloat16), None
    if kind == "fp8":
        return x.astype(jnp.float8_e5m2), None
    d = x.shape[-1]
    gw = group_for(d)
    g = d // gw
    xf = x.astype(jnp.float32).reshape(*x.shape[:-1], g, gw)
    r = jnp.einsum("...i,ij->...j", xf, hadamard_for(gw))
    absmax = jnp.max(jnp.abs(r), axis=-1, keepdims=True)
    absmax = jnp.maximum(absmax, 1e-8)
    if kind == "q4":
        s = _bf16_scale_consistent(absmax, 8.0)        # [..., G, 1] f32
        q = jnp.clip(jnp.round(r / s + 8.0), 0, 15)
        q = q.reshape(*x.shape[:-1], d).astype(jnp.uint8)
        # half-split packing: byte j = el[j] | el[j + d/2] << 4, so unpack
        # is two masked halves concatenated in natural element order — no
        # lane interleave (the paged-attention kernel dequants in place)
        lo = q[..., :d // 2]
        hi = q[..., d // 2:]
        data = lo | (hi << 4)
        return data, s[..., 0].astype(jnp.bfloat16)
    if kind == "q8":
        s = _bf16_scale_consistent(absmax, 128.0)
        q = jnp.clip(jnp.round(r / s + 128.0), 0, 255)
        data = q.astype(jnp.uint8).reshape(*x.shape[:-1], d)
        return data, s[..., 0].astype(jnp.bfloat16)
    raise ValueError(kind)


def _bf16_scale_consistent(absmax: jax.Array, qmax: float) -> jax.Array:
    """Group scale, pre-rounded to its bf16 STORAGE value (rounded up a
    ulp when bf16 rounded it down). Quantizing against the exact stored
    scale removes the scale-mismatch noise that fp16 storage would have
    avoided (Mosaic has no f16, so bf16 storage is forced — reference
    stores fp16, cache_q.cuh s_buffer); rounding up keeps |r/s| <= qmax
    so the clamp never adds error beyond the reference's own. Returns
    f32 [..., G, 1] equal to the bf16 value."""
    s = (absmax / qmax).astype(jnp.bfloat16)
    sf = s.astype(jnp.float32)
    bumped = jax.lax.bitcast_convert_type(
        s, jnp.uint16) + jnp.uint16(1)
    s_up = jax.lax.bitcast_convert_type(
        bumped, jnp.bfloat16).astype(jnp.float32)
    return jnp.where(sf * qmax < absmax, s_up, sf)


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
        gw = group_for(q.shape[-1])
        g = q.shape[-1] // gw
        q = q.reshape(*q.shape[:-1], g, gw)
        r = q * scales.astype(jnp.float32)[..., None]
        y = jnp.einsum("...i,ji->...j", r, hadamard_for(gw)) * (1.0 / gw)
        return y.reshape(*data.shape[:-1], d2 * 2).astype(dtype)
    if kind == "q8":
        d = data.shape[-1]
        gw = group_for(d)
        g = d // gw
        q = data.astype(jnp.float32).reshape(*data.shape[:-1], g, gw) \
            - 128.0
        r = q * scales.astype(jnp.float32)[..., None]
        y = jnp.einsum("...i,ji->...j", r, hadamard_for(gw)) * (1.0 / gw)
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
