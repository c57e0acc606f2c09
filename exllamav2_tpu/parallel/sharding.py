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
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from exllamav2_tpu.cache import KVCache
from exllamav2_tpu.models.modules import (
    AttnWeights, EPMoEWeights, LayerWeights, MLPWeights, MoEWeights,
    ModelWeights, NormWeights, StaticModel)
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
            if getattr(seg, "scale_f", None) is not None:
                repl["scale_f"] = _put(seg.scale_f, mesh, spec_n)
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


# ---------------------------------------------------------------------------
# Fused sharded serving: shard_map around the Pallas-kernel forward
# (reference analog: fully-fused TP attention, ext_qattn.cpp:261-439)
# ---------------------------------------------------------------------------

def _tp_fusable_linear(lin, tp: int, exact_width: bool) -> bool:
    """Every linear is COLUMN-sharded in the fused TP mode, so only the
    out-features need to split evenly. Act-order perms are fine: K stays
    whole per shard, so the activation gather x[:, perm] is replicated
    work, identical on every shard. Multi-segment (mixed-bitrate)
    layouts are fine too: every segment's planes/scales carry N as the
    last axis and split cleanly. `exact_width` is required for layers
    whose output reshapes straight to heads (q/k/v) — a lane-padded N
    would interleave pad columns into the head split; layers whose
    output is reassembled by an all-gather (o, gate/up, down, head)
    tolerate padding (the gather rebuilds the padded array in order and
    the caller slices the tail off)."""
    if isinstance(lin, DenseLinear) or lin is None:
        return True
    if lin.n % tp:
        return False
    if exact_width and lin.n != lin.n_orig:
        return False
    return True


def tp_fusable(w: ModelWeights, st: StaticModel, tp: int) -> bool:
    """Fused-TP feasibility: head counts and out-features split evenly.
    All linears COLUMN-shard (a lane split of the packed planes is always
    clean; K-row splits would have to respect the 256-row pack blocks,
    which real 11008-wide MLPs cannot) — so act-order and mixed-bitrate
    checkpoints, i.e. everything the converter emits, are fusable."""
    if tp <= 1:
        return False
    if st.num_kv_heads % tp or st.num_heads % tp:
        return False
    if st.parallel_blocks:
        return False                     # shared-norm blocks: keep GSPMD
    for lw in w.layers:
        lins = [(lw.attn.q, True), (lw.attn.k, True), (lw.attn.v, True),
                (lw.attn.o, False)]
        if isinstance(lw.mlp, MoEWeights):
            # MoE layers go expert-parallel on the same axis: whole
            # experts are distributed, so only uniformity + divisibility
            # matter (no inter % tp constraint)
            # quantized routers are densified at shard time (tiny [d, E]
            # matrices; replicated, so the dequant cost is one-off)
            if not _ep_stackable(lw.mlp, tp):
                return False
        else:
            lins += [(lw.mlp.gate, False), (lw.mlp.up, False),
                     (lw.mlp.down, False)]
        for lin, exact in lins:
            if not _tp_fusable_linear(lin, tp, exact):
                return False
    if not _tp_fusable_linear(w.head, tp, False):
        return False
    return True


def _densify_router(lin):
    """Quantized MoE routers become dense bf16 for the fused path: the
    matrix is tiny ([d, E]) and replicated, so a one-off dequant beats
    keeping the GSPMD fallback for the whole model (VERDICT r2 weak #3;
    the reference keeps routers fp16 outright, moe_mlp.py)."""
    if isinstance(lin, QuantLinear):
        from exllamav2_tpu.ops.dequant import dequant_linear
        return DenseLinear(
            weight=dequant_linear(lin)[:, :lin.n_orig].astype(jnp.bfloat16),
            bias=None if lin.bias is None
            else jnp.asarray(lin.bias, jnp.bfloat16))
    return lin


def _ep_stackable(mw: MoEWeights, tp: int) -> bool:
    """Whole-expert distribution needs E % tp == 0 and structurally
    identical experts (stacking is leaf-wise, meta lives in the
    treedef). Experts are never column-split, so act-order perms,
    multi-segment layouts and lane padding all stack fine."""
    import jax as _jax
    if len(mw.w1) % tp:
        return False
    for grp in (mw.w1, mw.w2, mw.w3):
        if len({_jax.tree_util.tree_structure(e) for e in grp}) != 1:
            return False
        shapes = [tuple(l.shape for l in _jax.tree_util.tree_leaves(e))
                  for e in grp]
        if len(set(shapes)) != 1:
            return False
    return True


def _tpf_stacked(lins, mesh):
    """Stack per-expert linears on a leading expert axis and shard that
    axis over "tp" (expert parallelism: each shard owns E/tp whole
    experts). Returns (placed stacked linear, PartitionSpec pytree)."""
    import jax as _jax
    stacked = _jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *lins)
    placed = _jax.tree_util.tree_map(
        lambda a: _put(a, mesh, P("tp")), stacked)
    spec = _jax.tree_util.tree_map(lambda a: P("tp"), stacked)
    return placed, spec


def _tpf_linear(lin, mesh, kind: str, tp: int):
    """Place a linear for the shard_map path, rewriting static meta to the
    PER-SHARD view (shard_map hands each program its local block, so k/n
    metadata must describe the local shapes)."""
    if lin is None:
        return None, None
    if isinstance(lin, DenseLinear):
        if kind == "col":
            w = _put(lin.weight, mesh, P(None, "tp"))
            b = _put(lin.bias, mesh, P("tp")) if lin.bias is not None \
                else None
            return DenseLinear(weight=w, bias=b), DenseLinear(
                weight=P(None, "tp"),
                bias=P("tp") if lin.bias is not None else None)
        return (DenseLinear(weight=_put(lin.weight, mesh, P()),
                            bias=_put(lin.bias, mesh, P())
                            if lin.bias is not None else None),
                DenseLinear(weight=P(),
                            bias=P() if lin.bias is not None else None))
    assert isinstance(lin, QuantLinear)
    assert kind == "col", kind
    arr_spec = P(None, "tp")
    segs_w, segs_s = [], []
    for seg in lin.segments:
        repl_w = {"planes": tuple(_put(p, mesh, arr_spec)
                                  for p in seg.planes)}
        repl_s = {"planes": tuple(arr_spec for _ in seg.planes)}
        if hasattr(seg, "qscale"):
            repl_w.update(qscale=_put(seg.qscale, mesh, arr_spec),
                          smax=_put(seg.smax, mesh, P()))
            repl_s.update(qscale=arr_spec, smax=P())
            if getattr(seg, "scale_f", None) is not None:
                repl_w.update(scale_f=_put(seg.scale_f, mesh, arr_spec))
                repl_s.update(scale_f=arr_spec)
        else:
            repl_w.update(scale=_put(seg.scale, mesh, arr_spec),
                          zero=_put(seg.zero, mesh, arr_spec))
            repl_s.update(scale=arr_spec, zero=arr_spec)
        segs_w.append(dataclasses.replace(seg, **repl_w))
        segs_s.append(dataclasses.replace(seg, **repl_s))
    nl = lin.n // tp
    bias_w = bias_s = None
    if lin.bias is not None:
        # the bias must shard in the same (lane-padded) coordinate
        # system as the plane chunks — pad it to n before placing
        bias_full = lin.bias
        if lin.n != lin.n_orig:
            bias_full = jnp.pad(bias_full, (0, lin.n - lin.n_orig))
        bias_w = _put(bias_full, mesh, P("tp"))
        bias_s = P("tp")
    # act-order: K stays whole per shard, so the activation gather
    # x[:, perm] is shard-invariant — the perm replicates
    perm_w = _put(lin.perm, mesh, P()) if lin.perm is not None else None
    perm_s = P() if lin.perm is not None else None
    out = QuantLinear(segments=tuple(segs_w), perm=perm_w, bias=bias_w,
                      k=lin.k, n=nl, n_orig=nl)
    spec = QuantLinear(segments=tuple(segs_s), perm=perm_s, bias=bias_s,
                       k=lin.k, n=nl, n_orig=nl)
    return out, spec


def _tpf_norm(nw, mesh):
    if nw is None:
        return None, None
    return (_shard_norm(nw, mesh),
            NormWeights(weight=P(),
                        bias=P() if nw.bias is not None else None))


def shard_model_tp_fused(w: ModelWeights, st: StaticModel, mesh: Mesh,
                         tp: int):
    """-> (placed weights with per-shard meta, matching PartitionSpec
    pytree) for the shard_map fused serving path."""
    layers_w, layers_s = [], []
    for lw in w.layers:
        aw, as_ = {}, {}
        for nm, kind in (("q", "col"), ("k", "col"), ("v", "col"),
                         ("o", "col")):
            aw[nm], as_[nm] = _tpf_linear(getattr(lw.attn, nm), mesh,
                                          kind, tp)
        n1w, n1s = _tpf_norm(lw.attn.norm, mesh)
        qn_w, qn_s = _tpf_norm(lw.attn.q_norm, mesh)
        kn_w, kn_s = _tpf_norm(lw.attn.k_norm, mesh)
        np_w, np_s = _tpf_norm(lw.attn.norm_post, mesh)
        attn_w = AttnWeights(norm=n1w, q=aw["q"], k=aw["k"], v=aw["v"],
                             o=aw["o"], q_norm=qn_w, k_norm=kn_w,
                             norm_post=np_w)
        attn_s = AttnWeights(norm=n1s, q=as_["q"], k=as_["k"], v=as_["v"],
                             o=as_["o"], q_norm=qn_s, k_norm=kn_s,
                             norm_post=np_s)
        n2w, n2s = _tpf_norm(lw.mlp.norm, mesh)
        npw, nps = _tpf_norm(getattr(lw.mlp, "norm_post", None), mesh)
        if isinstance(lw.mlp, MoEWeights):
            rw, rs = _tpf_linear(_densify_router(lw.mlp.router), mesh,
                                 "rep", tp)
            w1w, w1s = _tpf_stacked(lw.mlp.w1, mesh)
            w2w, w2s = _tpf_stacked(lw.mlp.w2, mesh)
            w3w, w3s = _tpf_stacked(lw.mlp.w3, mesh)
            mlp_w = EPMoEWeights(norm=n2w, router=rw, w1=w1w, w2=w2w,
                                 w3=w3w, norm_post=npw)
            mlp_s = EPMoEWeights(norm=n2s, router=rs, w1=w1s, w2=w2s,
                                 w3=w3s, norm_post=nps)
        else:
            gw, gs = _tpf_linear(lw.mlp.gate, mesh, "col", tp)
            uw, us = _tpf_linear(lw.mlp.up, mesh, "col", tp)
            dw, ds = _tpf_linear(lw.mlp.down, mesh, "col", tp)
            mlp_w = MLPWeights(norm=n2w, gate=gw, up=uw, down=dw,
                               norm_post=npw)
            mlp_s = MLPWeights(norm=n2s, gate=gs, up=us, down=ds,
                               norm_post=nps)
        layers_w.append(LayerWeights(attn=attn_w, mlp=mlp_w))
        layers_s.append(LayerWeights(attn=attn_s, mlp=mlp_s))
    fn_w, fn_s = _tpf_norm(w.final_norm, mesh)
    hd_w, hd_s = _tpf_linear(w.head, mesh, "col", tp)
    wm = ModelWeights(
        embed=_put(w.embed, mesh, P()), layers=tuple(layers_w),
        final_norm=fn_w, head=hd_w,
        sin=_put(w.sin, mesh, P()), cos=_put(w.cos, mesh, P()),
        pos_emb=_put(w.pos_emb, mesh, P())
        if w.pos_emb is not None else None,
        sin_alt=_put(w.sin_alt, mesh, P())
        if w.sin_alt is not None else None,
        cos_alt=_put(w.cos_alt, mesh, P())
        if w.cos_alt is not None else None)
    sm = ModelWeights(
        embed=P(), layers=tuple(layers_s), final_norm=fn_s, head=hd_s,
        sin=P(), cos=P(),
        pos_emb=P() if w.pos_emb is not None else None,
        sin_alt=P() if w.sin_alt is not None else None,
        cos_alt=P() if w.cos_alt is not None else None)
    return wm, sm


def lora_wrap_tp_fused(w: ModelWeights, specs: ModelWeights, lora,
                       mesh: Mesh, tp: int):
    """Wrap a PEFT adapter into the fused-TP weight AND spec pytrees.

    Reference parity: exllamav2 threads LoRAs through its fused TP
    attention/MLP (attn.py:528-547, ext_qmlp.cpp lora args). Here the
    rank-r factors become optional pytree leaves of the shard_map
    program: A replicates ([k, r] — the low-rank projection x@A is
    shard-invariant, every shard computes the same [m, r]); B
    column-shards ([r, n/tp]) in the same lane-padded coordinate system
    as the base planes, so the per-shard bypass (x@A)@B_local adds
    directly onto the local base output and the existing all-gather
    stitching reassembles the full width. Returns (weights, specs) with
    matching structure (LoraLinear is a registered dataclass; `scaling`
    is a meta field and must agree between the two trees)."""
    from exllamav2_tpu.lora import LoraLinear

    def wrap(lin, spec, key):
        pair = lora.pair_for(key)
        if pair is None or lin is None:
            return lin, spec
        a, b = pair                                   # [k, r], [r, n_orig]
        n_full = lin.n * tp                           # lane-padded width
        if b.shape[1] < n_full:
            b = np.pad(b, ((0, 0), (0, n_full - b.shape[1])))
        wl = LoraLinear(
            base=lin,
            a=_put(jnp.asarray(a, jnp.bfloat16), mesh, P()),
            b=_put(jnp.asarray(b, jnp.bfloat16), mesh, P(None, "tp")),
            scaling=float(lora.scaling))
        sl = LoraLinear(base=spec, a=P(), b=P(None, "tp"),
                        scaling=float(lora.scaling))
        return wl, sl

    layers_w, layers_s = [], []
    for l, (lw, ls) in enumerate(zip(w.layers, specs.layers)):
        p = f"model.layers.{l}"
        aw, as_ = {}, {}
        for nm, tgt in (("q", "q_proj"), ("k", "k_proj"),
                        ("v", "v_proj"), ("o", "o_proj")):
            aw[nm], as_[nm] = wrap(getattr(lw.attn, nm),
                                   getattr(ls.attn, nm),
                                   f"{p}.self_attn.{tgt}")
        attn_w = dataclasses.replace(lw.attn, **aw)
        attn_s = dataclasses.replace(ls.attn, **as_)
        if isinstance(lw.mlp, MLPWeights):
            mw, ms = {}, {}
            for nm, tgt in (("gate", "gate_proj"), ("up", "up_proj"),
                            ("down", "down_proj")):
                mw[nm], ms[nm] = wrap(getattr(lw.mlp, nm),
                                      getattr(ls.mlp, nm),
                                      f"{p}.mlp.{tgt}")
            mlp_w = dataclasses.replace(lw.mlp, **mw)
            mlp_s = dataclasses.replace(ls.mlp, **ms)
        else:
            mlp_w, mlp_s = lw.mlp, ls.mlp
        layers_w.append(LayerWeights(attn=attn_w, mlp=mlp_w))
        layers_s.append(LayerWeights(attn=attn_s, mlp=mlp_s))
    return (dataclasses.replace(w, layers=tuple(layers_w)),
            dataclasses.replace(specs, layers=tuple(layers_s)))


def paged_cache_pspecs(cache):
    """PartitionSpec pytree matching shard_paged_cache placement."""
    import dataclasses as dc
    spec = P(None, "tp", None, None)

    def put(x):
        return None if x is None else spec

    return dc.replace(cache, k_data=put(cache.k_data),
                      k_scales=put(cache.k_scales),
                      v_data=put(cache.v_data),
                      v_scales=put(cache.v_scales))


def local_static(st: StaticModel, tp: int) -> StaticModel:
    """Per-shard StaticModel for use inside shard_map."""
    return dataclasses.replace(
        st, num_heads=st.num_heads // tp,
        num_kv_heads=st.num_kv_heads // tp,
        tp_axis="tp", fused_matmul=True)


def make_tp_paged_forward_factory(mesh: Mesh, st_local: StaticModel,
                                  w_specs, cache_specs):
    """-> get(last_token_only, with_embeds=False, with_rope=False):
    cached shard_map-wrapped model_forward_paged variants. Every shard
    runs the fused Pallas kernels on its local weight/KV blocks; psum /
    all_gather inside the forward (models/forward.py _tp_gather) stitch
    the results — the TPU analog of the reference's fully-fused TP
    attention (ext_qattn.cpp:261-439) with ICI collectives instead of
    pinned-host staging. Multimodal prefill operands (input_embeds [B,T,d]
    rows, MRoPE sin/cos rows) ride along replicated — each shard embeds
    the same rows and projects them through its local weight blocks."""
    try:
        from jax import shard_map
    except ImportError:                      # older jax
        from jax.experimental.shard_map import shard_map
    from exllamav2_tpu.models.forward import model_forward_paged

    interp = mesh.devices.flat[0].platform != "tpu"
    cache = {}

    def fwd(w, ids, c, block_table, cache_seqlens, pos_off,
            last_token_only, input_embeds=None, rope_rows=None):
        from exllamav2_tpu.ops import qmm as _q
        prev = _q._INTERPRET_OVERRIDE[0]
        _q._INTERPRET_OVERRIDE[0] = interp
        try:
            logits, c = model_forward_paged(
                w, st_local, ids, c, block_table, cache_seqlens,
                last_token_only=last_token_only, pos_offsets=pos_off,
                input_embeds=input_embeds, rope_rows=rope_rows)
        finally:
            _q._INTERPRET_OVERRIDE[0] = prev
        return logits, c

    def _shard_map(body, in_specs):
        kw = dict(mesh=mesh, in_specs=in_specs,
                  out_specs=(P(), cache_specs))
        # replication checking kw was renamed across jax versions
        for flag in ({"check_vma": False}, {"check_rep": False}, {}):
            try:
                return shard_map(body, **kw, **flag)
            except TypeError:
                continue
        raise RuntimeError("shard_map signature mismatch")

    def get(last_token_only: bool, with_embeds: bool = False,
            with_rope: bool = False):
        key = (last_token_only, with_embeds, with_rope)
        if key in cache:
            return cache[key]
        base = (w_specs, P(), cache_specs, P(), P(), P())
        if with_embeds and with_rope:
            body = lambda w, i, c, bt, sl, po, em, sr, cr: fwd(
                w, i, c, bt, sl, po, last_token_only,
                input_embeds=em, rope_rows=(sr, cr))
            fn = _shard_map(body, base + (P(), P(), P()))
        elif with_embeds:
            body = lambda w, i, c, bt, sl, po, em: fwd(
                w, i, c, bt, sl, po, last_token_only, input_embeds=em)
            fn = _shard_map(body, base + (P(),))
        else:
            assert not with_rope
            body = lambda w, i, c, bt, sl, po: fwd(
                w, i, c, bt, sl, po, last_token_only)
            fn = _shard_map(body, base)
        cache[key] = fn
        return fn

    return get


def make_tp_paged_forward(mesh: Mesh, st_local: StaticModel,
                          w_specs, cache_specs):
    """-> (fwd_last, fwd_full): the text-only fused TP forwards (see
    make_tp_paged_forward_factory for the MM-capable factory)."""
    get = make_tp_paged_forward_factory(mesh, st_local, w_specs,
                                        cache_specs)
    return get(True), get(False)


def make_multihost_mesh(dp: int = 1, tp: int | None = None) -> Mesh:
    """Global mesh across hosts (SURVEY §7 step 7: the same shard_map
    program runs over DCN; per-host schedulers feed identical token ids).

    Call jax.distributed.initialize() first (TPU pod environments do this
    automatically). The tp axis should stay within a slice so its
    all-gathers ride ICI; dp crosses hosts over DCN.
    """
    devices = jax.devices()
    n = len(devices)
    tp = tp or n // dp
    assert dp * tp == n, (dp, tp, n)
    import numpy as _np
    return Mesh(_np.asarray(devices).reshape(dp, tp),
                axis_names=("dp", "tp"))
