"""Paged attention (TPU analog of flash_attn_with_kvcache + block tables).

v1 is the XLA formulation: gather + dequantize the sequence's pages and
run masked GQA attention — structurally the same as the reference's
dequant-to-fp16-temp + flash path (cache.py:472-514 -> attn.py:602-613).
The fused Pallas kernel (page streaming, double-buffered DMA, in-kernel
dequant) replaces `_attention` behind the same signature.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["paged_attention", "paged_decode_attention"]

_NEG = -1e30


def _lane_scales(scales):
    """[page, G] group scales -> [page, G*32] per-lane (element-wise
    repeat built from static broadcasts — repeat/tile semantics differ
    across lowerings, this is unambiguous)."""
    g = scales.shape[1]
    page = scales.shape[0]
    sf = scales.astype(jnp.float32)
    return jnp.concatenate(
        [jnp.broadcast_to(sf[:, i:i + 1], (page, 32)) for i in range(g)],
        axis=1)


def _dq_block(data, scales, kind):
    """In-kernel page dequant -> f32 [page, D] WITHOUT the inverse
    Hadamard (folded into the caller's q pre-rotation / output
    post-rotation — the rotation commutes through the dot products)."""
    if kind in ("bf16", "fp8"):
        return data.astype(jnp.float32)
    if kind == "q8":
        v = data.astype(jnp.int32).astype(jnp.float32) - 128.0
        return v * _lane_scales(scales)
    if kind == "q4":
        w = data.astype(jnp.int32)
        lo = (w & 15).astype(jnp.float32) - 8.0
        hi = ((w >> 4) & 15).astype(jnp.float32) - 8.0
        v = jnp.concatenate([lo, hi], axis=1)          # natural order
        return v * _lane_scales(scales)
    raise ValueError(kind)


def _lane_scales3(scales):
    """[H, page, G] group scales -> [H, page, G*32] per-lane."""
    h, page, g = scales.shape
    sf = scales.astype(jnp.float32)
    return jnp.concatenate(
        [jnp.broadcast_to(sf[:, :, i:i + 1], (h, page, 32))
         for i in range(g)], axis=2)


def _dq_block3(data, scales, kind):
    """All-head variant of _dq_block: [H, page, D'] -> f32 [H, page, D]."""
    if kind in ("bf16", "fp8"):
        return data.astype(jnp.float32)
    if kind == "q8":
        v = data.astype(jnp.int32).astype(jnp.float32) - 128.0
        return v * _lane_scales3(scales)
    if kind == "q4":
        w = data.astype(jnp.int32)
        lo = (w & 15).astype(jnp.float32) - 8.0
        hi = ((w >> 4) & 15).astype(jnp.float32) - 8.0
        v = jnp.concatenate([lo, hi], axis=2)          # natural order
        return v * _lane_scales3(scales)
    raise ValueError(kind)


@functools.partial(jax.jit, static_argnums=(3, 8, 9, 10, 11, 12, 13))
def paged_decode_attention(q: jax.Array, k_data: jax.Array,
                           v_data: jax.Array, layer: int,
                           block_table: jax.Array, valid_lens: jax.Array,
                           k_scales, v_scales,
                           scale: float, page_size: int, hq: int,
                           kinds: tuple = ("bf16", "bf16"),
                           softcap: float = 0.0,
                           window: int = 0) -> jax.Array:
    """Fused paged flash-decode (t = 1).

    q [B, Hq, D]; k/v_data FULL pool [L, Hkv, rows, D]; block_table [B, P]
    (page indices, padding rows -> null page); valid_lens [B] = number of
    valid kv rows (cache already contains the current token). Streams one
    [Hkv, page, D] block per grid step via the scalar-prefetched block
    table (the TPU analog of flash_attn_with_kvcache + block tables,
    attn.py:602-613) with online-softmax accumulation across pages.

    softcap > 0 applies tanh score capping (Gemma2, attn.py:216-221);
    window > 0 restricts attention to the trailing `window` positions
    (sliding-window decode, flash-attn window kwarg attn.py:591-595) —
    pages wholly outside the window are skipped, so SWA decode streams
    only O(window) KV bytes.
    """
    b, _, d = q.shape
    nl, hkv, rows = k_data.shape[:3]
    g = hq // hkv
    p_width = block_table.shape[1]
    qg = q.reshape(b, hkv, g, d)
    gpad = max(g, 8)
    kk_kind, vv_kind = kinds
    has_ks = kk_kind in ("q4", "q8")
    has_vs = vv_kind in ("q4", "q8")

    def kernel(bt_ref, vl_ref, *refs):
        i = 0
        q_ref = refs[i]; i += 1
        k_ref = refs[i]; i += 1
        v_ref = refs[i]; i += 1
        ks_ref = refs[i] if has_ks else None
        i += has_ks
        vs_ref = refs[i] if has_vs else None
        i += has_vs
        o_ref, m_ref, l_ref, acc_ref = refs[i:i + 4]

        bi = pl.program_id(0)
        pi = pl.program_id(1)

        @pl.when(pi == 0)
        def _():
            m_ref[:] = jnp.full_like(m_ref, -1e30)
            l_ref[:] = jnp.zeros_like(l_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        vlb = vl_ref[bi]
        start = pi * page_size
        live = start < vlb
        if window > 0:
            # decode: the single query sits at position vlb-1; pages that
            # end before vlb-window hold only out-of-window keys
            live = jnp.logical_and(live, start + page_size > vlb - window)

        @pl.when(live)
        def _():
            # one batched dot_general over ALL kv heads per page block
            # (a python head loop emits hkv x ~8 tiny Mosaic ops whose
            # fixed issue cost dominates decode at 32 heads x 32 layers;
            # measured 25x slower than this formulation at 7B geometry)
            pos = jax.lax.broadcasted_iota(
                jnp.int32, (1, 1, page_size), 2) + start
            # bf16 MXU dots (one pass vs f32's four; A/B measured 1.5x
            # on the 7B decode block) — accumulation stays f32
            qf = q_ref[0].astype(jnp.bfloat16)                 # [H, G, D]
            kk = _dq_block3(k_ref[0],
                            ks_ref[0] if has_ks else None,
                            kk_kind).astype(jnp.bfloat16)
            vv = _dq_block3(v_ref[0],
                            vs_ref[0] if has_vs else None,
                            vv_kind).astype(jnp.bfloat16)
            s = jax.lax.dot_general(
                qf, kk, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) * scale    # [H, G, P]
            if softcap > 0.0:
                s = jnp.tanh(s * (1.0 / softcap)) * softcap
            valid = pos < vlb
            if window > 0:
                valid = jnp.logical_and(valid, pos >= vlb - window)
            s = jnp.where(valid, s, -1e30)
            m_prev = m_ref[:, :g, :1]                          # [H, G, 1]
            l_prev = l_ref[:, :g, :1]
            m_curr = jnp.max(s, axis=2, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next)
            l_ref[:, :g, :1] = alpha * l_prev \
                + jnp.sum(p, axis=2, keepdims=True)
            m_ref[:, :g, :1] = m_next
            o_curr = jax.lax.dot_general(
                p.astype(jnp.bfloat16), vv, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)            # [H, G, D]
            acc_ref[:, :g] = acc_ref[:, :g] * alpha + o_curr

        @pl.when(pi == pl.num_programs(1) - 1)
        def _():
            l = l_ref[:, :g, :1]
            o_ref[0] = acc_ref[:, :g] / jnp.where(l == 0.0, 1.0, l)

    def page_spec(arr):
        last = arr.shape[3]

        def idx(bi, pi, bt, vl):
            # dead-page DMA elision: pages past the valid length (and,
            # with SWA, before the window) re-fetch the nearest LIVE
            # page's index — Mosaic skips the DMA when consecutive grid
            # steps map to the same window, so streamed bytes track the
            # VALID kv length, not the bucketed block-table width
            # (compute for dead steps is already skipped via pl.when)
            last_live = jnp.maximum(vl[bi] - 1, 0) // page_size
            pc = jnp.minimum(pi, last_live)
            if window > 0:
                first_live = jnp.maximum(vl[bi] - window, 0) // page_size
                pc = jnp.maximum(pc, jnp.minimum(first_live, last_live))
            return (layer, 0, bt[bi, pc], 0)

        return pl.BlockSpec((1, hkv, page_size, last), idx)

    in_specs = [
        pl.BlockSpec((1, hkv, g, d),
                     lambda bi, pi, bt, vl: (bi, 0, 0, 0)),
        page_spec(k_data),
        page_spec(v_data),
    ]
    args = [qg, k_data, v_data]
    if has_ks:
        in_specs.append(page_spec(k_scales))
        args.append(k_scales)
    if has_vs:
        in_specs.append(page_spec(v_scales))
        args.append(v_scales)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, p_width),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, hkv, g, d),
                               lambda bi, pi, bt, vl: (bi, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((hkv, gpad, 128), jnp.float32),
            pltpu.VMEM((hkv, gpad, 128), jnp.float32),
            pltpu.VMEM((hkv, gpad, d), jnp.float32),
        ],
    )
    from exllamav2_tpu.ops.qmm import _interpret as _kern_interp
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, g, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_kern_interp(),
    )(block_table, valid_lens, *args)
    return out.reshape(b, 1, hq, d)


def paged_attention(q: jax.Array, cache, layer: int,
                    block_table: jax.Array, cache_seqlens: jax.Array,
                    *, scale: float | jax.Array,
                    window: int = 0, softcap: float = 0.0,
                    allow_kernel: bool = True) -> jax.Array:
    """q [B, T, Hq, D] -> attention output [B, T, Hq, D] (f32).

    cache_seqlens[b] = past length BEFORE the current q tokens; the cache
    must already contain the q tokens' K/V at positions
    cache_seqlens[b] .. cache_seqlens[b]+T-1 (append happens first, same
    order as the reference's direct-cache-write path attn.py:520-578).
    """
    b, t, hq, d = q.shape
    # fused page-streaming kernel for the decode hot path (bf16 + Q4/Q8/Q6
    # kinds; the Hadamard rotation commutes through the dots, so K-side is
    # folded into a q pre-rotation and V-side into an output rotation)
    from exllamav2_tpu.cache_paged import _kinds
    kk_kind, vv_kind = _kinds(cache.kind)
    from exllamav2_tpu.ops.qmm import _interpret as _kern_interp, \
        _INTERPRET_OVERRIDE
    on_tpu = (jax.default_backend() == "tpu"
              and _INTERPRET_OVERRIDE[0] is not True) \
        or _INTERPRET_OVERRIDE[0] is True
    if (allow_kernel and t == 1 and d % 32 == 0
            and kk_kind in ("bf16", "fp8", "q4", "q8")
            and vv_kind in ("bf16", "fp8", "q4", "q8")
            and on_tpu):
        from exllamav2_tpu.ops.kvquant import hadamard32
        qd = q[:, 0].astype(jnp.bfloat16)
        eff_scale = float(scale)
        if kk_kind in ("q4", "q8"):
            h32 = hadamard32(jnp.float32)
            qr = qd.astype(jnp.float32).reshape(b, hq, d // 32, 32)
            qd = jnp.einsum("...i,ij->...j", qr, h32).reshape(
                b, hq, d).astype(jnp.bfloat16)
            eff_scale = eff_scale / 32.0
        out = paged_decode_attention(
            qd, cache.k_data, cache.v_data, layer, block_table,
            cache_seqlens + 1, cache.k_scales, cache.v_scales,
            eff_scale, cache.page_size, hq, (kk_kind, vv_kind),
            float(softcap), int(window))
        if vv_kind in ("q4", "q8"):
            h32 = hadamard32(jnp.float32)
            o = out.astype(jnp.float32).reshape(b, 1, hq, d // 32, 32)
            out = (jnp.einsum("...i,ij->...j", o, h32)
                   * (1.0 / 32.0)).reshape(b, 1, hq, d)
        return out
    k, v = cache.gather_layer(layer, block_table)      # [B, Hkv, S, D]
    s = k.shape[2]
    hkv = k.shape[1]
    g = hq // hkv

    # bf16 feeds the MXU on TPU; the CPU thunk runtime rejects some
    # bf16 x bf16 = f32 dot fusions (same workaround as qmm.py's
    # unfused branch), so off-TPU the dots run in f32
    dt = jnp.bfloat16 if on_tpu else jnp.float32
    qg = q.astype(dt).reshape(b, t, hkv, g, d)
    scores = jnp.einsum("btkgd,bksd->bkgts", qg, k.astype(dt),
                        preferred_element_type=jnp.float32) * scale
    if softcap > 0.0:
        scores = jnp.tanh(scores / softcap) * softcap

    pos_q = cache_seqlens[:, None] + jnp.arange(t, dtype=jnp.int32)[None]
    pos_k = jnp.arange(s, dtype=jnp.int32)
    mask = pos_k[None, None, :] <= pos_q[:, :, None]         # [B, T, S]
    if window > 0:
        mask &= pos_k[None, None, :] > pos_q[:, :, None] - window
    scores = jnp.where(mask[:, None, None], scores, _NEG)

    probs = jax.nn.softmax(scores, axis=-1).astype(dt)
    out = jnp.einsum("bkgts,bksd->btkgd", probs, v.astype(dt),
                     preferred_element_type=jnp.float32)
    return out.reshape(b, t, hq, d)
