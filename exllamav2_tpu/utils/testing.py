"""Test fixtures: synthesize tiny checkpoints on disk.

The reference has no hermetic tests (SURVEY.md §4 — scripts with hard-coded
model paths). We do better: generate small random Llama-family checkpoints
(FP16 / EXL2 / GPTQ) deterministically and run the whole stack against them.
"""

from __future__ import annotations

import json
import os

import numpy as np

from exllamav2_tpu.quant import formats as F
from exllamav2_tpu.stloader import write_safetensors

__all__ = ["make_tiny_llama", "random_quant_linear", "random_model_weights"]


def random_quant_linear(rng, k: int, n: int, bits: int = 4,
                        group_rows: int = 32, smax_scale: float = 3e-3):
    """Build a QuantLinear with random packed planes directly (no codec pass).

    Uniform random packed words ARE uniform random quantized values, so this
    is distribution-equivalent to packing random ints but ~free. Generated
    on-device with jax.random (host->device transfers through the TPU
    tunnel are slow; synthesizing GBs of benchmark weights must not cross
    the host boundary). `rng` is a numpy Generator used only to derive seeds.
    """
    import jax
    import jax.numpy as jnp
    from exllamav2_tpu.quant.qtensor import (
        QuantLinear, QuantSegment, SUB_BLOCK, plane_split)
    rows_pad = -(-k // SUB_BLOCK) * SUB_BLOCK
    key = jax.random.PRNGKey(int(rng.integers(0, 2 ** 31)))
    ks = list(jax.random.split(key, len(plane_split(bits)) + 2))
    planes = tuple(
        jax.random.bits(ks[i], (rows_pad * bp // 32, n), jnp.uint32)
        for i, bp in enumerate(plane_split(bits)))
    groups = rows_pad // group_rows
    qscale = jax.random.randint(
        ks[-2], (groups, n), 1, 17, jnp.uint8)
    smax = (jax.random.uniform(ks[-1], (groups, 1), jnp.float32)
            * smax_scale + smax_scale / 4)
    seg = QuantSegment(planes=planes, qscale=qscale, smax=smax, bits=bits,
                       plane_bits=plane_split(bits), rows=k,
                       group_rows=group_rows)
    return QuantLinear(segments=(seg,), perm=None, bias=None,
                       k=k, n=n, n_orig=n)


def random_gptq_linear(rng, k: int, n: int, bits: int = 4,
                       group_rows: int = 128, scale_mag: float = 3e-3):
    """GPTQ-layout analog of random_quant_linear: random packed planes +
    explicit per-group f32 scales / int zeros, synthesized on device
    (same compute/memory profile as a real gs128 GPTQ checkpoint)."""
    import jax
    import jax.numpy as jnp
    from exllamav2_tpu.quant.qtensor import (
        QuantLinear, GptqSegment, SUB_BLOCK, plane_split)
    rows_pad = -(-k // SUB_BLOCK) * SUB_BLOCK
    key = jax.random.PRNGKey(int(rng.integers(0, 2 ** 31)))
    ks = list(jax.random.split(key, len(plane_split(bits)) + 2))
    planes = tuple(
        jax.random.bits(ks[i], (rows_pad * bp // 32, n), jnp.uint32)
        for i, bp in enumerate(plane_split(bits)))
    groups = rows_pad // group_rows
    scale = (jax.random.uniform(ks[-2], (groups, n), jnp.float32)
             * scale_mag + scale_mag / 4)
    zero = jax.random.randint(ks[-1], (groups, n), 0, 2 ** bits, jnp.int32)
    seg = GptqSegment(planes=planes, scale=scale, zero=zero, bits=bits,
                      plane_bits=plane_split(bits), rows=k,
                      group_rows=group_rows)
    return QuantLinear(segments=(seg,), perm=None, bias=None,
                       k=k, n=n, n_orig=n)


def random_model_weights(*, vocab=32000, hidden=4096, layers=32, heads=32,
                         kv_heads=32, inter=11008, max_seq=2048, bits=4,
                         seed=0, dense=False, moe=0, moe_topk=2,
                         fmt="exl2"):
    """In-memory random model (ModelWeights, StaticModel) of real geometry.
    moe > 0 makes every layer a block-sparse MoE with that many experts."""
    import jax.numpy as jnp
    from exllamav2_tpu.models.modules import (
        AttnWeights, LayerWeights, MLPWeights, MoEWeights, ModelWeights,
        NormWeights, StaticModel, LayerStatic)
    from exllamav2_tpu.quant.qtensor import from_dense
    from exllamav2_tpu.ops.rope import build_sincos

    rng = np.random.default_rng(seed)
    head_dim = hidden // heads

    def lin(k, n):
        if dense:
            return from_dense(
                (rng.standard_normal((k, n)) * 0.02).astype(np.float32))
        if fmt == "gptq":
            return random_gptq_linear(rng, k, n, bits=bits)
        return random_quant_linear(rng, k, n, bits=bits)

    def norm():
        return NormWeights(weight=jnp.ones((hidden,), jnp.float32))

    lws = []
    for _ in range(layers):
        attn = AttnWeights(norm=norm(),
                           q=lin(hidden, heads * head_dim),
                           k=lin(hidden, kv_heads * head_dim),
                           v=lin(hidden, kv_heads * head_dim),
                           o=lin(heads * head_dim, hidden))
        if moe:
            mlp = MoEWeights(
                norm=norm(),
                router=from_dense(
                    (rng.standard_normal((hidden, moe)) * 0.02)
                    .astype(np.float32)),
                w1=tuple(lin(hidden, inter) for _ in range(moe)),
                w2=tuple(lin(inter, hidden) for _ in range(moe)),
                w3=tuple(lin(hidden, inter) for _ in range(moe)))
        else:
            mlp = MLPWeights(norm=norm(), gate=lin(hidden, inter),
                             up=lin(hidden, inter), down=lin(inter, hidden))
        lws.append(LayerWeights(attn=attn, mlp=mlp))

    from types import SimpleNamespace
    rope_cfg = SimpleNamespace(
        rotary_dim=head_dim, rotary_embedding_base=10000.0, rope_scaling=None,
        max_seq_len=max_seq, max_position_embeddings=max_seq,
        original_max_position_embeddings=None, head_dim=head_dim)
    sin, cos = build_sincos(rope_cfg)

    import jax
    w = ModelWeights(
        embed=(jax.random.normal(
            jax.random.PRNGKey(seed + 1), (vocab, hidden), jnp.bfloat16)
            * 0.02),
        layers=tuple(lws), final_norm=norm(), head=lin(hidden, vocab),
        sin=sin, cos=cos)
    st = StaticModel(
        num_layers=layers, num_heads=heads, num_kv_heads=kv_heads,
        head_dim=head_dim, hidden_size=hidden, vocab_size=vocab,
        norm_eps=1e-5, layers=tuple(LayerStatic() for _ in range(layers)),
        num_experts=moe, num_experts_per_tok=moe_topk if moe else 0)
    return w, st


def _quant_linear_exl2(rng, w_hf: np.ndarray, bits_pattern, group_rows=32,
                       act_order=False) -> dict[str, np.ndarray]:
    """w_hf [out, in] f32 -> EXL2 tensor dict. Stored layout is W^T [in, out]."""
    wt = np.ascontiguousarray(w_hf.T)                        # [K, N]
    k = wt.shape[0]
    groups = -(-k // group_rows)
    bits = [bits_pattern[i % len(bits_pattern)] for i in range(groups)]
    invperm = None
    if act_order:
        perm = rng.permutation(k).astype(np.int32)
        invperm = np.argsort(perm).astype(np.int32)
        wt = wt[perm]
    t = F.exl2_pack(wt, bits, group_rows, invperm=invperm)
    out = {"q_weight": t.q_weight, "q_scale": t.q_scale,
           "q_scale_max": t.q_scale_max.astype(np.float16),
           "q_groups": t.q_groups}
    if t.q_invperm is not None:
        out["q_invperm"] = t.q_invperm
    return out


def _quant_linear_gptq(rng, w_hf: np.ndarray, bits=4, group_size=32,
                       act_order=False) -> dict[str, np.ndarray]:
    wt = np.ascontiguousarray(w_hf.T)
    k, n = wt.shape
    g_idx = None
    if act_order:
        perm = rng.permutation(k)
        g_idx = (perm // group_size).astype(np.int32)
        # quantize rows grouped by g_idx but stored in original order:
        order = np.argsort(g_idx, kind="stable")
        inv = np.argsort(order)
        wt_g = wt[order]
    else:
        wt_g = wt
    groups = -(-k // group_size)
    maxq = 2 ** bits - 1
    q = np.empty((k, n), np.uint16)
    zeros = np.empty((groups, n), np.uint16)
    scales = np.empty((groups, n), np.float16)
    for g in range(groups):
        rows = wt_g[g * group_size:(g + 1) * group_size]
        lo, hi = rows.min(axis=0), rows.max(axis=0)
        scale = np.maximum((hi - lo) / maxq, 1e-8)
        zero = np.clip(np.round(-lo / scale), 0, maxq)
        q[g * group_size:g * group_size + rows.shape[0]] = np.clip(
            np.round(rows / scale) + zero, 0, maxq).astype(np.uint16)
        zeros[g] = zero.astype(np.uint16)
        scales[g] = scale.astype(np.float16)
    if act_order:
        q = q[inv]
    t = F.gptq_pack(q, zeros, scales.astype(np.float32), bits=bits,
                    g_idx=g_idx)
    out = {"qweight": t.qweight, "qzeros": t.qzeros,
           "scales": t.scales.astype(np.float16)}
    if t.g_idx is not None:
        out["g_idx"] = t.g_idx
    return out


def make_tiny_llama(model_dir: str, *, quant: str | None = "exl2",
                    vocab: int = 256, hidden: int = 256, layers: int = 2,
                    heads: int = 4, kv_heads: int = 2, inter: int = 512,
                    max_pos: int = 512, seed: int = 0,
                    act_order: bool = False, arch: str = "LlamaForCausalLM",
                    extra_config: dict | None = None,
                    scale: float = 0.05, head_scale: float = 1.0,
                    attn_scale: float = 1.0) -> str:
    """Write a tiny random checkpoint in the layout the given architecture
    declares (keys derived from the ArchParams registry); returns model_dir.
    """
    from exllamav2_tpu.architecture import get_arch, NormType

    os.makedirs(model_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    ap = get_arch(arch, allow_fallback=True)
    head_dim = hidden // heads
    if ap.mqa:
        kv_heads = 1
    cfg = {
        "architectures": [arch],
        "hidden_size": hidden,
        "intermediate_size": inter,
        "num_hidden_layers": layers,
        "num_attention_heads": heads,
        "num_key_value_heads": kv_heads,
        "vocab_size": vocab,
        "rms_norm_eps": 1e-5,
        "layer_norm_eps": 1e-5,
        "layer_norm_epsilon": 1e-5,
        "norm_epsilon": 1e-5,
        "rope_theta": 10000.0,
        "max_position_embeddings": max_pos,
        "tie_word_embeddings": False,
        "bos_token_id": 1, "eos_token_id": 2,
    }
    if extra_config:
        cfg.update(extra_config)
    with open(os.path.join(model_dir, "config.json"), "w") as f:
        json.dump(cfg, f, indent=1)

    def dense(o, i):
        return (rng.standard_normal((o, i)) * scale).astype(np.float32)

    tensors: dict[str, np.ndarray] = {}
    pre = ap.lm_prefix
    norm_bias = ap.norm == NormType.LAYERNORM

    def put_linear(key, w_hf, bias_width=0):
        if ap.orig_weights_transposed:
            w_hf = np.ascontiguousarray(w_hf.T)   # Conv1D stores [in, out]
            assert quant is None, "transposed fixtures are fp16-only"
        if quant == "exl2":
            sub = _quant_linear_exl2(rng, w_hf, bits_pattern=[4, 4, 5, 3],
                                     act_order=act_order)
        elif quant == "gptq":
            sub = _quant_linear_gptq(rng, w_hf, act_order=act_order)
        else:
            sub = {"weight": w_hf.astype(np.float16)}
        for suffix, arr in sub.items():
            tensors[f"{pre}{key}.{suffix}"] = arr
        if bias_width:
            tensors[f"{pre}{key}.bias"] = \
                (rng.standard_normal(bias_width) * 0.01).astype(np.float16)

    def put_norm(key_pat, l):
        key = pre + key_pat.split("|")[0].format(l=l)
        tensors[f"{key}.weight"] = (
            np.ones(hidden, np.float16)
            + rng.standard_normal(hidden).astype(np.float16) * 0.01)
        if norm_bias:
            tensors[f"{key}.bias"] = np.zeros(hidden, np.float16)

    tensors[f"{pre}model.embed_tokens.weight"] = \
        dense(vocab, hidden).astype(np.float16)
    if ap.learned_pos_emb and ap.key_learned_pos_emb:
        tensors[f"{pre}{ap.key_learned_pos_emb}.weight"] = \
            (rng.standard_normal((max_pos, hidden)) * 0.01).astype(np.float16)

    attn_bias = bool(ap.attention_bias
                     or (extra_config or {}).get("attention_bias"))
    mlp_bias = ap.mlp_bias
    nq, nkv = heads * head_dim, kv_heads * head_dim
    for l in range(layers):
        put_norm(ap.key_norm_1, l)
        if ap.key_norm_1_post:
            put_norm(ap.key_norm_1_post, l)
        if ap.key_norm_2:
            put_norm(ap.key_norm_2, l)
        if ap.key_norm_2_post:
            put_norm(ap.key_norm_2_post, l)
        if ap.fused_qkv:
            if ap.fused_qkv_altpack:
                # [q_group | k | v] per kv head (InternLM2 wqkv)
                g = heads // kv_heads
                blocks = []
                for h in range(kv_heads):
                    blocks += [dense(g * head_dim, hidden),
                               dense(head_dim, hidden),
                               dense(head_dim, hidden)]
                w = np.concatenate(blocks, axis=0)
            else:
                w = dense(nq + 2 * nkv, hidden)
            put_linear(ap.key_fused_qkv.format(l=l), w,
                       bias_width=(nq + 2 * nkv) if attn_bias else 0)
        else:
            # attn_scale > 1 peaks the softmax (scores scale ~ s^2): a
            # random-init net attends near-uniformly, which hides
            # K-cache quantization error — peaked attention restores the
            # trained-model sensitivity (K error perturbs WHERE attention
            # lands, see docs/QUALITY.md q6-vs-q4 discussion)
            put_linear(ap.key_attn_q.format(l=l),
                       dense(nq, hidden) * attn_scale,
                       bias_width=nq if attn_bias else 0)
            put_linear(ap.key_attn_k.format(l=l),
                       dense(nkv, hidden) * attn_scale,
                       bias_width=nkv if attn_bias else 0)
            put_linear(ap.key_attn_v.format(l=l), dense(nkv, hidden),
                       bias_width=nkv if attn_bias else 0)
        put_linear(ap.key_attn_o.format(l=l), dense(hidden, nq),
                   bias_width=hidden if ap.attention_bias_o else 0)
        if ap.is_moe:
            n_exp = (extra_config or {}).get(
                "num_local_experts", (extra_config or {}).get(
                    "num_experts", 4))
            # router stays fp16 (reference keeps it unquantized)
            tensors[f"{pre}{ap.key_moe_gate.format(l=l)}.weight"] = \
                dense(n_exp, hidden).astype(np.float16)
            for e in range(n_exp):
                put_linear(ap.key_moe_w1.format(l=l, e=e),
                           dense(inter, hidden))
                put_linear(ap.key_moe_w2.format(l=l, e=e),
                           dense(hidden, inter))
                put_linear(ap.key_moe_w3.format(l=l, e=e),
                           dense(inter, hidden))
        elif ap.fused_gate_up:
            put_linear(ap.key_fused_gate_up.format(l=l),
                       dense(2 * inter, hidden))
            put_linear(ap.key_mlp_down.format(l=l), dense(hidden, inter))
        else:
            if ap.mlp_gated and ap.key_mlp_gate:
                put_linear(ap.key_mlp_gate.format(l=l), dense(inter, hidden),
                           bias_width=inter if mlp_bias else 0)
            put_linear(ap.key_mlp_up.format(l=l), dense(inter, hidden),
                       bias_width=inter if mlp_bias else 0)
            put_linear(ap.key_mlp_down.format(l=l), dense(hidden, inter),
                       bias_width=hidden if mlp_bias else 0)
    tensors[f"{pre}model.norm.weight"] = np.ones(hidden, np.float16)
    if norm_bias:
        tensors[f"{pre}model.norm.bias"] = np.zeros(hidden, np.float16)
    if not ap.tied_head_default:
        # head_scale > 1 sharpens logit margins so greedy argmax is stable
        # under bf16 shape-dependent accumulation (speculative-decode tests)
        w = dense(vocab, hidden) * head_scale
        if ap.orig_weights_transposed:
            w = np.ascontiguousarray(w.T)
        tensors[f"{pre}lm_head.weight"] = w.astype(np.float16)

    write_safetensors(os.path.join(model_dir, "model.safetensors"), tensors)
    return model_dir
