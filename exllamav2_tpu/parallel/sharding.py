"""Mesh + sharding rules: the TPU replacement for the reference TP layer.

The reference implements single-host tensor parallelism with a custom
pinned-host-memory collective backend (tensor_p.py + ext_tp.cpp:129-330,
broadcast/gather/allgather staged through the CPU). On TPU the whole layer
collapses into sharding annotations over a jax Mesh: XLA inserts ICI/DCN
collectives (all-gather / reduce-scatter / psum) and overlaps them with
compute. The reference's five split tables (tensor_p.py:14-18 —
BROADCAST_KV/_Q/_ID/_RS/_VC) map to PartitionSpecs:

  kv-head split  -> KV cache + k/v projections sharded on "tp"
  q-head split   -> q / o projections sharded on "tp"
  intermediate   -> gate/up column-, down row-sharded on "tp"
  hidden (RS)    -> activations replicated (small) or reduce-scattered
  vocab split    -> lm_head column-sharded on "tp", logits all-gathered

Data parallel ("dp") shards the batch; both axes live on one mesh and
multi-host extends the same program over DCN unchanged.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from exllamav2_tpu.cache import KVCache
from exllamav2_tpu.models.modules import (
    AttnWeights, LayerWeights, MLPWeights, MoEWeights, ModelWeights,
    NormWeights, StaticModel)
from exllamav2_tpu.quant.qtensor import QuantLinear, DenseLinear

__all__ = ["make_mesh", "shard_model", "shard_cache", "shard_inputs"]


def make_mesh(n_devices: int | None = None, dp: int = 1,
              devices=None) -> Mesh:
    """Build a (dp, tp) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    n = n_devices or len(devices)
    devices = np.asarray(devices[:n]).reshape(dp, n // dp)
    return Mesh(devices, axis_names=("dp", "tp"))


def _put(x, mesh, spec):
    if x is None:
        return None
    return jax.device_put(x, NamedSharding(mesh, spec))


def _shard_linear(lin, mesh, kind: str):
    """kind: 'col' shards out-features, 'row' shards in-features (dense only),
    'rep' replicates. Quantized layers always column-shard: every plane /
    scale array has N as its last axis, so a 'tp' split of N is a clean
    even split of all members; row-parallel quantized layers are expressed
    as column splits with XLA inserting the reduce."""
    rep = P()
    if lin is None:
        return None
    if isinstance(lin, DenseLinear):
        if kind == "col":
            w = _put(lin.weight, mesh, P(None, "tp"))
            b = _put(lin.bias, mesh, P("tp")) if lin.bias is not None else None
        elif kind == "row":
            w = _put(lin.weight, mesh, P("tp", None))
            b = _put(lin.bias, mesh, rep) if lin.bias is not None else None
        else:
            w = _put(lin.weight, mesh, rep)
            b = _put(lin.bias, mesh, rep) if lin.bias is not None else None
        return DenseLinear(weight=w, bias=b)
    assert isinstance(lin, QuantLinear)
    spec_n = P(None, "tp") if kind in ("col", "row") else P()
    segs = []
    for seg in lin.segments:
        repl = {
            "planes": tuple(_put(p, mesh, spec_n) for p in seg.planes),
        }
        if hasattr(seg, "qscale"):
            repl["qscale"] = _put(seg.qscale, mesh, spec_n)
            repl["smax"] = _put(seg.smax, mesh, P())
        else:
            repl["scale"] = _put(seg.scale, mesh, spec_n)
            repl["zero"] = _put(seg.zero, mesh, spec_n)
        segs.append(dataclasses.replace(seg, **repl))
    return QuantLinear(
        segments=tuple(segs),
        perm=_put(lin.perm, mesh, P()),
        bias=_put(lin.bias, mesh, P("tp") if kind == "col" else P()),
        k=lin.k, n=lin.n, n_orig=lin.n_orig)


def _shard_norm(nw: NormWeights, mesh) -> NormWeights:
    return NormWeights(weight=_put(nw.weight, mesh, P()),
                       bias=_put(nw.bias, mesh, P()))


def shard_model(w: ModelWeights, st: StaticModel, mesh: Mesh) -> ModelWeights:
    """Place all weights with TP shardings (tensor_p.py define_split analog)."""
    layers = []
    for lw in w.layers:
        attn = AttnWeights(
            norm=_shard_norm(lw.attn.norm, mesh),
            q=_shard_linear(lw.attn.q, mesh, "col"),
            k=_shard_linear(lw.attn.k, mesh, "col"),
            v=_shard_linear(lw.attn.v, mesh, "col"),
            o=_shard_linear(lw.attn.o, mesh, "row"),
            q_norm=_shard_norm(lw.attn.q_norm, mesh)
            if lw.attn.q_norm is not None else None,
            k_norm=_shard_norm(lw.attn.k_norm, mesh)
            if lw.attn.k_norm is not None else None,
        )
        if isinstance(lw.mlp, MoEWeights):
            mlp = MoEWeights(
                norm=_shard_norm(lw.mlp.norm, mesh),
                router=_shard_linear(lw.mlp.router, mesh, "rep"),
                w1=tuple(_shard_linear(e, mesh, "col") for e in lw.mlp.w1),
                w2=tuple(_shard_linear(e, mesh, "row") for e in lw.mlp.w2),
                w3=tuple(_shard_linear(e, mesh, "col") for e in lw.mlp.w3),
            )
        else:
            mlp = MLPWeights(
                norm=_shard_norm(lw.mlp.norm, mesh),
                gate=_shard_linear(lw.mlp.gate, mesh, "col"),
                up=_shard_linear(lw.mlp.up, mesh, "col"),
                down=_shard_linear(lw.mlp.down, mesh, "row"),
            )
        layers.append(LayerWeights(attn=attn, mlp=mlp))
    return ModelWeights(
        embed=_put(w.embed, mesh, P(None, None)),
        layers=tuple(layers),
        final_norm=_shard_norm(w.final_norm, mesh),
        head=_shard_linear(w.head, mesh, "col"),   # vocab split (_VC)
        sin=_put(w.sin, mesh, P()),
        cos=_put(w.cos, mesh, P()),
    )


def shard_cache(cache: KVCache, mesh: Mesh) -> KVCache:
    """KV cache split: batch on dp, kv-heads on tp (BROADCAST_KV analog).

    Cache layout is [L, B, Hkv, S, D]."""
    spec = P(None, "dp", "tp", None, None)
    return KVCache(k=_put(cache.k, mesh, spec), v=_put(cache.v, mesh, spec))


def shard_inputs(ids, mesh: Mesh):
    return _put(ids, mesh, P("dp", None))


def shard_paged_cache(cache, mesh: Mesh):
    """Paged pool split: kv-heads on tp (layout [L, Hkv, rows, D']).

    Page indices are host-global, so every shard holds the same page
    table — the property SURVEY §7 calls out for multi-host serving."""
    import dataclasses as dc
    spec = P(None, "tp", None, None)

    def put(x):
        return None if x is None else _put(x, mesh, spec)

    return dc.replace(cache, k_data=put(cache.k_data),
                      k_scales=put(cache.k_scales),
                      v_data=put(cache.v_data),
                      v_scales=put(cache.v_scales))
