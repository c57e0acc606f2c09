"""Experimental FPx (eXmY sub-byte float) weight emulation.

Analog of the reference's experimental/fpx.py (unused by default there
too): round weights through an eXmY floating grid — per-row absmax
scaling to the format's max normal, round-to-nearest-even in value
space, clamp — to study sub-byte float formats (fp6_e3m2, fp5_e2m2,
fp4_e2m1 ...) without a packed kernel.

TPU-first formulation: instead of the reference's 120-line integer
bit-surgery on the f32 encoding (_f32_to_fpx_unpacked /
_fpx_unpacked_to_f32), the grid round happens in VALUE space with
frexp/ldexp — the set of representable eXmY values is exactly
{± m·2^(e-mbits)} plus denormals, so rounding |x| to its local quantum
2^(floor(log2|x|) - mbits) (or the denormal quantum below min-normal)
with jnp.round (half-even) IS the encode-decode round trip. Jits clean.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from exllamav2_tpu.models.modules import (LayerWeights, MLPWeights,
                                          ModelWeights)
from exllamav2_tpu.quant.qtensor import DenseLinear

__all__ = ["fpx_round", "fpxify_tensor", "fpxify"]


def fpx_round(x: jax.Array, ebits: int, mbits: int) -> jax.Array:
    """Round every element of x to the nearest eXmY-representable value
    (round-half-even; overflow clamps to ±max-normal, like the
    reference's clamp — no inf/NaN encodings)."""
    assert 1 + ebits + mbits <= 8 and ebits >= 2
    bias = (1 << (ebits - 1)) - 1
    min_normal = 2.0 ** (1 - bias)
    max_exp = (1 << ebits) - 1 - bias      # all-ones exponent is a value
    max_normal = 2.0 ** max_exp * (2.0 - 2.0 ** (-mbits))
    xf = x.astype(jnp.float32)
    ax = jnp.abs(xf)
    _, e = jnp.frexp(ax)                   # ax = m * 2^e, m in [0.5, 1)
    q_norm = jnp.ldexp(jnp.float32(1.0), e - 1 - mbits)
    q_den = jnp.float32(min_normal * 2.0 ** (-mbits))
    q = jnp.where(ax < min_normal, q_den, q_norm)
    r = jnp.round(ax / q) * q              # half-even on the local grid
    r = jnp.minimum(r, max_normal)
    return (jnp.sign(xf) * r).astype(x.dtype)


def fpxify_tensor(w: jax.Array, ebits: int, mbits: int) -> jax.Array:
    """Reference to_scaled_tc_fpx/from_scaled_tc_fpx round trip: per-row
    absmax scale to max-normal, eXmY grid round, rescale."""
    bias = (1 << (ebits - 1)) - 1
    max_normal = 2.0 ** ((1 << ebits) - 1 - bias) * (2.0 - 2.0 ** (-mbits))
    wf = w.astype(jnp.float32)
    scale = jnp.clip(jnp.max(jnp.abs(wf), axis=-1, keepdims=True),
                     1e-12, None) / max_normal
    return (fpx_round(wf / scale, ebits, mbits) * scale).astype(w.dtype)


def fpxify(weights: ModelWeights, exponent: int, mantissa: int
           ) -> ModelWeights:
    """Round every dense linear through the eXmY grid (reference fpxify
    walks linear modules; quantized linears are left untouched — they
    already carry their own format)."""

    def conv(lin):
        if isinstance(lin, DenseLinear):
            return dataclasses.replace(
                lin, weight=fpxify_tensor(lin.weight, exponent, mantissa))
        return lin

    layers = []
    for lw in weights.layers:
        attn = dataclasses.replace(
            lw.attn, q=conv(lw.attn.q), k=conv(lw.attn.k),
            v=conv(lw.attn.v), o=conv(lw.attn.o))
        if isinstance(lw.mlp, MLPWeights):
            mlp = dataclasses.replace(
                lw.mlp, gate=conv(lw.mlp.gate), up=conv(lw.mlp.up),
                down=conv(lw.mlp.down))
        else:
            mlp = lw.mlp
        layers.append(LayerWeights(attn=attn, mlp=mlp))
    return dataclasses.replace(weights, layers=tuple(layers),
                               head=conv(weights.head))
