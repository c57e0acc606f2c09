"""Paged attention (TPU analog of flash_attn_with_kvcache + block tables).

v1 is the XLA formulation: gather + dequantize the sequence's pages and
run masked GQA attention — structurally the same as the reference's
dequant-to-fp16-temp + flash path (cache.py:472-514 -> attn.py:602-613).
The fused Pallas kernel (page streaming, double-buffered DMA, in-kernel
dequant) replaces `_attention` behind the same signature.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["paged_attention"]

_NEG = -1e30


def paged_attention(q: jax.Array, cache, layer: int,
                    block_table: jax.Array, cache_seqlens: jax.Array,
                    *, scale: float | jax.Array,
                    window: int = 0, softcap: float = 0.0) -> jax.Array:
    """q [B, T, Hq, D] -> attention output [B, T, Hq, D] (f32).

    cache_seqlens[b] = past length BEFORE the current q tokens; the cache
    must already contain the q tokens' K/V at positions
    cache_seqlens[b] .. cache_seqlens[b]+T-1 (append happens first, same
    order as the reference's direct-cache-write path attn.py:520-578).
    """
    b, t, hq, d = q.shape
    k, v = cache.gather_layer(layer, block_table)      # [B, S, Hkv, D]
    s = k.shape[1]
    hkv = k.shape[2]
    g = hq // hkv

    qg = q.astype(jnp.bfloat16).reshape(b, t, hkv, g, d)
    scores = jnp.einsum("btkgd,bskd->bkgts", qg, k,
                        preferred_element_type=jnp.float32) * scale
    if softcap > 0.0:
        scores = jnp.tanh(scores / softcap) * softcap

    pos_q = cache_seqlens[:, None] + jnp.arange(t, dtype=jnp.int32)[None]
    pos_k = jnp.arange(s, dtype=jnp.int32)
    mask = pos_k[None, None, :] <= pos_q[:, :, None]         # [B, T, S]
    if window > 0:
        mask &= pos_k[None, None, :] > pos_q[:, :, None] - window
    scores = jnp.where(mask[:, None, None], scores, _NEG)

    probs = jax.nn.softmax(scores, axis=-1).astype(jnp.bfloat16)
    out = jnp.einsum("bkgts,bskd->btkgd", probs, v,
                     preferred_element_type=jnp.float32)
    return out.reshape(b, t, hq, d)
