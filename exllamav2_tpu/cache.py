"""KV caches.

TPU-first re-design of the reference cache classes (exllamav2/cache.py):
functional pytrees updated with lax.dynamic_update_slice inside the jitted
step (donated, so XLA updates in place — no torch-style mutable state).

v1 provides the linear FP16/BF16 cache (`ExLlamaV2Cache` analog,
cache.py:230) shaped [L, B, S, Hkv, D]. Quantized (Q4/Q6/Q8/FP8) and paged
variants build on the same layout in later stages.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["KVCache"]


@partial(jax.tree_util.register_dataclass,
         data_fields=["k", "v"], meta_fields=[])
@dataclasses.dataclass
class KVCache:
    """Linear per-layer K/V tensors, [L, B, Hkv, max_seq, D].

    Heads ahead of sequence so the decode-attention kernel's per-head
    blocks are contiguous in HBM (ops/decode_attn.py)."""
    k: jax.Array
    v: jax.Array

    @classmethod
    def alloc(cls, num_layers: int, batch: int, max_seq: int,
              kv_heads: int, head_dim: int, dtype=jnp.bfloat16) -> "KVCache":
        shape = (num_layers, batch, kv_heads, max_seq, head_dim)
        return cls(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))

    @property
    def max_seq(self) -> int:
        return self.k.shape[3]

    def update(self, layer: int, new_k: jax.Array, new_v: jax.Array,
               past_len) -> "KVCache":
        """Write new_k/new_v [B, T, Hkv, D] at position past_len of layer."""
        zero = jnp.int32(0)
        idx = (jnp.int32(layer), zero, zero,
               jnp.asarray(past_len, jnp.int32), zero)
        nk = jnp.transpose(new_k, (0, 2, 1, 3))[None]     # [1,B,H,T,D]
        nv = jnp.transpose(new_v, (0, 2, 1, 3))[None]
        return KVCache(
            k=jax.lax.dynamic_update_slice(
                self.k, nk.astype(self.k.dtype), idx),
            v=jax.lax.dynamic_update_slice(
                self.v, nv.astype(self.v.dtype), idx))

    def layer(self, layer: int) -> tuple[jax.Array, jax.Array]:
        """-> K/V [B, Hkv, S, D] for one layer."""
        return self.k[layer], self.v[layer]
