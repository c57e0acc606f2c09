"""Fused decode attention (t = 1) over the linear KV cache.

TPU analog of flash-decode: one Pallas kernel streams K/V head blocks
HBM->VMEM once and computes masked softmax-attention on the VPU (a
head-batched matvec uses the MXU so poorly that the elementwise-reduce
formulation is faster and purely bandwidth-bound). Measured ~1.6x over
the XLA einsum path on v5e.

Cache layout is [B, H_kv, S, D]; only the first `limit` rows of S are
read (static block bound — the caller buckets past_len). GQA maps G query
heads onto each KV head inside the block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["decode_attention"]


def _interpret() -> bool:
    from exllamav2_tpu.ops.qmm import _interpret as q
    return q()


@functools.partial(jax.jit, static_argnums=(3, 5, 6, 7, 8))
def decode_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                     layer: int, past_len: jax.Array, limit: int,
                     scale: float, softcap: float = 0.0,
                     window: int = 0) -> jax.Array:
    """q [B, Hq, D] (t=1), k/v FULL cache [L, B, Hkv, S, D]
    -> out [B, Hq, D] f32.

    The whole cache is passed (leading-dim reshape is free) and the layer
    is selected through the BlockSpec index map — slicing cache[layer] on
    the caller side would materialize a per-layer copy just to feed the
    custom call.

    Attends to positions 0..past_len (inclusive — the current token's K/V
    must already be written). `limit` (static) bounds the S rows read.
    softcap > 0 applies tanh capping; window > 0 limits attention to the
    trailing window (attn.py:216-221, 591-595 analogs).
    """
    b, hq, d = q.shape
    hkv, s_max = k.shape[2], k.shape[3]
    nl = k.shape[0]
    g = hq // hkv
    limit = min(limit, s_max)

    bh = b * hkv
    kf = k.reshape(nl * bh, s_max, d)
    vf = v.reshape(nl * bh, s_max, d)
    qf = q.reshape(bh, g, d)

    hb = 1
    while hb < 8 and hb * 2 <= bh and bh % (hb * 2) == 0:
        hb *= 2

    def kernel(pl_ref, q_ref, k_ref, v_ref, o_ref):
        qh = q_ref[:].astype(jnp.float32)            # [HB, G, D]
        kk = k_ref[:].astype(jnp.float32)            # [HB, L, D]
        vv = v_ref[:].astype(jnp.float32)
        past = pl_ref[0]
        sc = jnp.sum(kk[:, None] * qh[:, :, None, :], axis=3) \
            * scale                                   # [HB, G, L]
        if softcap > 0.0:
            sc = jnp.tanh(sc * (1.0 / softcap)) * softcap
        pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, limit), 2)
        valid = pos <= past
        if window > 0:
            valid = jnp.logical_and(valid, pos > past - window)
        sc = jnp.where(valid, sc, -1e30)
        m = jnp.max(sc, axis=2, keepdims=True)
        e = jnp.exp(sc - m)
        p = e / jnp.sum(e, axis=2, keepdims=True)
        o = jnp.sum(vv[:, None] * p[:, :, :, None], axis=2)  # [HB, G, D]
        o_ref[:] = o

    grid = (bh // hb,)
    off = layer * (bh // hb)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((hb, g, d), lambda h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hb, limit, d), lambda h: (off + h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hb, limit, d), lambda h: (off + h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((hb, g, d), lambda h: (h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, g, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(jnp.asarray(past_len, jnp.int32).reshape(1), qf, kf, vf)
    return out.reshape(b, hq, d)
