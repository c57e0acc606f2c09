"""Paged KV cache with optional quantization.

TPU analog of the reference's paged cache (cache.py + the dynamic
generator's page pool, dynamic.py:33 PAGE_SIZE=256): K/V live in a flat
pool of pages indexed through per-sequence block tables; cache kinds map
to the reference's ExLlamaV2Cache / _8bit / _Q4 / _Q6 / _Q8
(cache.py:230-656). Quantization (ops/kvquant.py) happens on append for
exactly the touched rows, like fp16_to_q_kv on store (cache.py:517-556).

Layout is head-major — data [L, Hkv, rows, D'] — so one (layer, head)
page is a contiguous [page_size, D'] block that the Pallas paged-attention
kernel can DMA directly (ops/paged_attn.py).

All updates are functional (donated into the jitted step). Page size is
fixed at 256 like the reference (dynamic.py:33).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from exllamav2_tpu.ops import kvquant as KQ

__all__ = ["PagedKVCache", "PAGE_SIZE"]

PAGE_SIZE = 256


def _kinds(kind: str) -> tuple[str, str]:
    """cache kind -> (k kind, v kind); Q6 = 8-bit K + 4-bit V
    (cache.cu:259-269)."""
    if kind == "q6":
        return "q8", "q4"
    return kind, kind


@partial(jax.tree_util.register_dataclass,
         data_fields=["k_data", "k_scales", "v_data", "v_scales"],
         meta_fields=["kind", "page_size", "head_dim"])
@dataclasses.dataclass
class PagedKVCache:
    """Flat page pool: data [L, Hkv, P * page_size, D'] (+ scales)."""
    k_data: jax.Array
    k_scales: jax.Array | None
    v_data: jax.Array
    v_scales: jax.Array | None
    kind: str
    page_size: int
    head_dim: int

    @classmethod
    def alloc(cls, num_layers: int, num_pages: int, kv_heads: int,
              head_dim: int, kind: str = "bf16",
              page_size: int = PAGE_SIZE) -> "PagedKVCache":
        kk, vk = _kinds(kind)
        rows = num_pages * page_size

        def mk(k):
            data = jnp.zeros((num_layers, kv_heads, rows,
                              *KQ.data_shape(k, head_dim)[0:1]),
                             KQ.data_dtype(k))
            scales = None
            if k in ("q4", "q8"):
                # bf16 storage (Mosaic has no f16); the codec quantizes
                # against the exact stored value (kvquant scale
                # consistency) so no storage-rounding noise survives
                scales = jnp.zeros(
                    (num_layers, kv_heads, rows, KQ.num_groups(head_dim)),
                    jnp.bfloat16)
            return data, scales

        kd, ks = mk(kk)
        vd, vs = mk(vk)
        return cls(k_data=kd, k_scales=ks, v_data=vd, v_scales=vs,
                   kind=kind, page_size=page_size, head_dim=head_dim)

    @property
    def num_pages(self) -> int:
        return self.k_data.shape[2] // self.page_size

    @property
    def num_layers(self) -> int:
        return self.k_data.shape[0]

    @property
    def kv_heads(self) -> int:
        return self.k_data.shape[1]

    def append(self, layer: int, block_table: jax.Array,
               cache_seqlens: jax.Array, new_k: jax.Array,
               new_v: jax.Array) -> "PagedKVCache":
        """Write new_k/new_v [B, T, H, D] at positions cache_seqlens[b]+t
        of each sequence (through its block table [B, max_pages]).

        Implemented with dynamic_update_slice chains, NOT jnp scatter:
        XLA lowers the mixed-index scatter `pool.at[layer, :, rows].set`
        into a full-pool materialization, so every layer's append was
        copying the entire pool — measured 4.5 ms/layer at 7B (decode
        cost scaled with POOL SIZE, the round-4 serving-throughput root
        cause). DUS updates stay in place under donation: the decode
        append is now ~8 KB/row of actual writes."""
        kk, vk = _kinds(self.kind)
        b, t, h, d = new_k.shape
        ps = self.page_size
        pos = cache_seqlens[:, None] + jnp.arange(t, dtype=jnp.int32)[None]
        page_idx = jnp.take_along_axis(
            block_table, pos // ps, axis=1)                   # [B, T]
        rows = page_idx * ps + pos % ps                       # [B, T]

        if b * t <= 64:
            # decode / spec-verify: one row-sized DUS per (b, t) — the
            # hot path (t == 1), unrolled statically
            def upd(data, scales, x, kind):
                qd, qs = KQ.kv_quant(x, kind)                 # [B,T,H,*]
                qd = qd.astype(data.dtype)
                for bi in range(b):
                    for ti in range(t):
                        r = rows[bi, ti]
                        data = jax.lax.dynamic_update_slice(
                            data, qd[bi, ti][None, :, None, :],
                            (layer, 0, r, 0))
                        if scales is not None:
                            scales = jax.lax.dynamic_update_slice(
                                scales, qs[bi, ti][None, :, None, :],
                                (layer, 0, r, 0))
                return data, scales
        else:
            # prefill: read-modify-write each touched page (a chunk of T
            # contiguous positions spans at most ceil(T/ps)+1 pages); the
            # in-page scatter runs on a 2 MB operand instead of the pool
            n_pages = (t - 1) // ps + 2

            def upd(data, scales, x, kind):
                qd, qs = KQ.kv_quant(x, kind)                 # [B,T,H,*]
                qd = qd.astype(data.dtype)

                def rmw(arr, vals, bi, lp, width):
                    phys = block_table[bi, jnp.minimum(
                        lp, block_table.shape[1] - 1)]
                    page = jax.lax.dynamic_slice(
                        arr, (layer, 0, phys * ps, 0),
                        (1, arr.shape[1], ps, width))
                    in_page = (pos[bi] // ps) == lp           # [T]
                    off = jnp.where(in_page, pos[bi] % ps, ps)
                    pagep = jnp.pad(page, ((0, 0), (0, 0), (0, 1),
                                           (0, 0)))
                    pagep = pagep.at[0, :, off].set(
                        vals[bi], mode="drop")                # [T,H,W]
                    return jax.lax.dynamic_update_slice(
                        arr, pagep[:, :, :ps], (layer, 0, phys * ps, 0))

                for bi in range(b):
                    first_lp = cache_seqlens[bi] // ps
                    for p in range(n_pages):
                        data = rmw(data, qd, bi, first_lp + p,
                                   data.shape[-1])
                        if scales is not None:
                            scales = rmw(scales, qs, bi, first_lp + p,
                                         scales.shape[-1])
                return data, scales

        kd, ks = upd(self.k_data, self.k_scales, new_k, kk)
        vd, vs = upd(self.v_data, self.v_scales, new_v, vk)
        return dataclasses.replace(self, k_data=kd, k_scales=ks,
                                   v_data=vd, v_scales=vs)

    def gather_layer(self, layer: int, block_table: jax.Array,
                     dtype=jnp.bfloat16):
        """Dequantized K/V [B, H, max_pages*page_size, D] for attention.

        The jnp reference path (the Pallas paged-attention kernel streams
        pages instead of materializing this)."""
        kk, vk = _kinds(self.kind)
        ps = self.page_size

        def gather(data, scales, kind):
            rows = (block_table[..., None] * ps
                    + jnp.arange(ps, dtype=jnp.int32)).reshape(
                        block_table.shape[0], -1)             # [B, S]
            d = jnp.take(data[layer], rows, axis=1)           # [H, B, S, D']
            d = jnp.transpose(d, (1, 0, 2, 3))                # [B, H, S, D']
            s = None
            if scales is not None:
                s = jnp.transpose(
                    jnp.take(scales[layer], rows, axis=1), (1, 0, 2, 3))
            return KQ.kv_dequant(d, s, kind, dtype)

        k = gather(self.k_data, self.k_scales, kk)
        v = gather(self.v_data, self.v_scales, vk)
        return k, v

    def copy_pages(self, src_rows: jax.Array, dst_rows: jax.Array
                   ) -> "PagedKVCache":
        """Copy whole pages (dedup / defrag support, cache.py:179-215
        copy_states + cache_rotate analog). src/dst are page indices.

        Per-page dynamic slice + update-slice (contiguous 2 MB moves)
        instead of a row scatter, for the same full-pool-copy reason as
        append()."""
        ps = self.page_size

        def cp(a):
            if a is None:
                return None
            for i in range(src_rows.shape[0]):        # static unroll
                page = jax.lax.dynamic_slice(
                    a, (0, 0, src_rows[i] * ps, 0),
                    (a.shape[0], a.shape[1], ps, a.shape[3]))
                a = jax.lax.dynamic_update_slice(
                    a, page, (0, 0, dst_rows[i] * ps, 0))
            return a

        return dataclasses.replace(
            self, k_data=cp(self.k_data), k_scales=cp(self.k_scales),
            v_data=cp(self.v_data), v_scales=cp(self.v_scales))
