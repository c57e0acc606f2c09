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


def random_model_weights(*, vocab=32000, hidden=4096, layers=32, heads=32,
                         kv_heads=32, inter=11008, max_seq=2048, bits=4,
                         seed=0, dense=False):
    """In-memory random model (ModelWeights, StaticModel) of real geometry."""
    import jax.numpy as jnp
    from exllamav2_tpu.models.modules import (
        AttnWeights, LayerWeights, MLPWeights, ModelWeights, NormWeights,
        StaticModel, LayerStatic)
    from exllamav2_tpu.quant.qtensor import from_dense
    from exllamav2_tpu.ops.rope import build_sincos

    rng = np.random.default_rng(seed)
    head_dim = hidden // heads

    def lin(k, n):
        if dense:
            return from_dense(
                (rng.standard_normal((k, n)) * 0.02).astype(np.float32))
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
        norm_eps=1e-5, layers=tuple(LayerStatic() for _ in range(layers)))
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
                    scale: float = 0.05, head_scale: float = 1.0) -> str:
    """Write a tiny random Llama checkpoint; returns model_dir."""
    os.makedirs(model_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    head_dim = hidden // heads
    cfg = {
        "architectures": [arch],
        "hidden_size": hidden,
        "intermediate_size": inter,
        "num_hidden_layers": layers,
        "num_attention_heads": heads,
        "num_key_value_heads": kv_heads,
        "vocab_size": vocab,
        "rms_norm_eps": 1e-5,
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

    def put_linear(key, w_hf):
        if quant == "exl2":
            sub = _quant_linear_exl2(rng, w_hf, bits_pattern=[4, 4, 5, 3],
                                     act_order=act_order)
        elif quant == "gptq":
            sub = _quant_linear_gptq(rng, w_hf, act_order=act_order)
        else:
            sub = {"weight": w_hf.astype(np.float16)}
        for suffix, arr in sub.items():
            tensors[f"{key}.{suffix}"] = arr

    norm_bias = arch in ("Starcoder2ForCausalLM", "CohereForCausalLM")
    tensors["model.embed_tokens.weight"] = dense(vocab, hidden).astype(np.float16)
    for l in range(layers):
        p = f"model.layers.{l}"
        tensors[f"{p}.input_layernorm.weight"] = \
            np.ones(hidden, np.float16) + rng.standard_normal(hidden).astype(np.float16) * 0.01
        tensors[f"{p}.post_attention_layernorm.weight"] = \
            np.ones(hidden, np.float16) + rng.standard_normal(hidden).astype(np.float16) * 0.01
        if norm_bias:
            tensors[f"{p}.input_layernorm.bias"] = \
                np.zeros(hidden, np.float16)
            tensors[f"{p}.post_attention_layernorm.bias"] = \
                np.zeros(hidden, np.float16)
        if arch == "Phi3ForCausalLM":
            put_linear(f"{p}.self_attn.qkv_proj",
                       dense((heads + 2 * kv_heads) * head_dim, hidden))
        else:
            put_linear(f"{p}.self_attn.q_proj",
                       dense(heads * head_dim, hidden))
            put_linear(f"{p}.self_attn.k_proj",
                       dense(kv_heads * head_dim, hidden))
            put_linear(f"{p}.self_attn.v_proj",
                       dense(kv_heads * head_dim, hidden))
        put_linear(f"{p}.self_attn.o_proj", dense(hidden, heads * head_dim))
        if (extra_config or {}).get("attention_bias"):
            for nm, width in (("q_proj", heads * head_dim),
                              ("k_proj", kv_heads * head_dim),
                              ("v_proj", kv_heads * head_dim)):
                tensors[f"{p}.self_attn.{nm}.bias"] = \
                    (rng.standard_normal(width) * 0.01).astype(np.float16)
        if arch == "MixtralForCausalLM":
            n_exp = (extra_config or {}).get("num_local_experts", 4)
            # router stays fp16 (reference keeps it unquantized)
            tensors[f"{p}.block_sparse_moe.gate.weight"] = \
                dense(n_exp, hidden).astype(np.float16)
            for e in range(n_exp):
                q = f"{p}.block_sparse_moe.experts.{e}"
                put_linear(f"{q}.w1", dense(inter, hidden))
                put_linear(f"{q}.w2", dense(hidden, inter))
                put_linear(f"{q}.w3", dense(inter, hidden))
        elif arch == "Phi3ForCausalLM":
            put_linear(f"{p}.mlp.gate_up_proj", dense(2 * inter, hidden))
            put_linear(f"{p}.mlp.down_proj", dense(hidden, inter))
        else:
            put_linear(f"{p}.mlp.gate_proj", dense(inter, hidden))
            put_linear(f"{p}.mlp.up_proj", dense(inter, hidden))
            put_linear(f"{p}.mlp.down_proj", dense(hidden, inter))
    tensors["model.norm.weight"] = np.ones(hidden, np.float16)
    if norm_bias:
        tensors["model.norm.bias"] = np.zeros(hidden, np.float16)
    # head_scale > 1 sharpens logit margins so greedy argmax is stable
    # under bf16 shape-dependent accumulation (speculative-decode tests)
    tensors["lm_head.weight"] = \
        (dense(vocab, hidden) * head_scale).astype(np.float16)

    write_safetensors(os.path.join(model_dir, "model.safetensors"), tensors)
    return model_dir
