"""Checkpoint loading: tensor sets -> ModelWeights pytree.

Analog of the reference's module loading path (module.py:101-151
load_weight auto-detecting EXL2/GPTQ/FP16 tensor sets, model.py:99-154
module-list construction). Loads via the mmap safetensors reader and
builds the TPU device layout (quant/qtensor.py) per linear.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from exllamav2_tpu.architecture import NormType
from exllamav2_tpu.config import ModelConfig
from exllamav2_tpu.quant import formats as F
from exllamav2_tpu.quant.qtensor import (
    QuantLinear, DenseLinear, from_exl2, from_gptq, from_dense)
from exllamav2_tpu.stloader import TensorFileMap, read_weight_f32
from exllamav2_tpu.models.modules import (
    NormWeights, AttnWeights, MLPWeights, MoEWeights, LayerWeights,
    ModelWeights, StaticModel, LayerStatic)
from exllamav2_tpu.ops.rope import build_sincos

__all__ = ["load_model", "load_linear", "build_static"]


def load_linear(tfm: TensorFileMap, key: str,
                transpose_dense: bool = True) -> QuantLinear | DenseLinear:
    """Load one linear layer by key prefix, auto-detecting the tensor set
    (module.py:101-151): EXL2 '.q_weight' / GPTQ '.qweight' / FP16 '.weight'.
    """
    bias = None
    if key + ".bias" in tfm:
        bias = read_weight_f32(tfm, key + ".bias")
    if key + ".q_weight" in tfm:
        t = F.Exl2Tensor(
            k=0, n=0,
            q_weight=tfm.get_tensor(key + ".q_weight"),
            q_scale=tfm.get_tensor(key + ".q_scale"),
            q_scale_max=tfm.get_tensor(key + ".q_scale_max").astype(np.float16),
            q_groups=tfm.get_tensor(key + ".q_groups"),
            q_invperm=tfm.get_tensor(key + ".q_invperm")
            if key + ".q_invperm" in tfm else None,
            bias=bias)
        t.n = t.q_weight.shape[1]
        # K from invperm, else from group table walk
        if t.q_invperm is not None:
            t.k = t.q_invperm.shape[0]
        else:
            gr = t.q_groups.astype(np.int64)
            bits_last = int(gr[-2])
            qrow_last = int(gr[-1])
            rows = 0
            for i in range(len(gr) // 2 - 1):
                qrows_i = int(gr[i * 2 + 3]) - int(gr[i * 2 + 1])
                rows += qrows_i * 32 // int(gr[i * 2])
            rows += (t.q_weight.shape[0] - qrow_last) * 32 // bits_last
            t.k = rows
        return from_exl2(t)
    if key + ".qweight" in tfm:
        qweight = tfm.get_tensor(key + ".qweight")
        scales = tfm.get_tensor(key + ".scales").astype(np.float16)
        qzeros = tfm.get_tensor(key + ".qzeros")
        g_idx = tfm.get_tensor(key + ".g_idx") \
            if key + ".g_idx" in tfm else None
        n = qweight.shape[1]
        groups = scales.shape[0]
        bits = qzeros.shape[1] * 32 // n
        k = qweight.shape[0] * 32 // bits
        t = F.GptqTensor(k=k, n=n, bits=bits, qweight=qweight,
                         qzeros=qzeros, scales=scales, g_idx=g_idx, bias=bias)
        return from_gptq(t)
    # FP16/BF16: HF stores [out, in]; our DenseLinear wants [in, out]
    w = read_weight_f32(tfm, key + ".weight")
    if transpose_dense:
        w = w.T
    return from_dense(w, bias)


def load_norm(tfm: TensorFileMap, key: str) -> NormWeights:
    w = jnp.asarray(read_weight_f32(tfm, key + ".weight"))
    b = jnp.asarray(read_weight_f32(tfm, key + ".bias")) \
        if key + ".bias" in tfm else None
    return NormWeights(weight=w, bias=b)


def build_static(cfg: ModelConfig) -> StaticModel:
    arch = cfg.arch
    per_layer = []
    for l in range(cfg.num_hidden_layers):
        sw = 0
        if cfg.sliding_window:
            if arch.sliding_window_pattern > 1:
                # alternating SWA (gemma2): odd layers full, even SWA
                sw = cfg.sliding_window \
                    if (l % arch.sliding_window_pattern) == 0 else 0
            else:
                sw = cfg.sliding_window
        per_layer.append(LayerStatic(sliding_window=sw))
    attn_scale = None
    if cfg.attention_multiplier is not None:
        attn_scale = float(cfg.attention_multiplier)
    return StaticModel(
        num_layers=cfg.num_hidden_layers,
        num_heads=cfg.num_attention_heads,
        num_kv_heads=cfg.num_key_value_heads,
        head_dim=cfg.head_dim,
        hidden_size=cfg.hidden_size,
        vocab_size=cfg.vocab_size,
        norm_eps=cfg.norm_eps,
        norm_type="rms" if arch.norm == NormType.RMS else "layernorm",
        norm_constant_bias=arch.norm_constant_bias,
        rope_style="neox",
        mlp_act=arch.mlp_act,
        mlp_gated=arch.mlp_gated,
        use_qk_norm=cfg.use_qk_norm,
        attn_logit_softcap=cfg.attn_logit_softcapping,
        final_logit_softcap=cfg.final_logit_softcapping,
        normalize_embeddings=arch.normalize_embeddings,
        embedding_multiplier=cfg.embedding_multiplier,
        attn_scale=attn_scale,
        logit_scale=cfg.logit_scale,
        residual_fp32=arch.residual_stream_fp32,
        parallel_blocks=arch.parallel_decoder_blocks,
        layers=tuple(per_layer),
        num_experts=cfg.num_experts,
        num_experts_per_tok=cfg.num_experts_per_tok,
        norm_topk_prob=cfg.norm_topk_prob,
    )


def load_model(cfg: ModelConfig) -> tuple[ModelWeights, StaticModel]:
    """Build the full weight pytree from a prepared config."""
    tfm = cfg.tensor_file_map
    arch = cfg.arch
    st = build_static(cfg)

    embed = read_weight_f32(tfm, arch.key_embedding + ".weight")
    embed_j = jnp.asarray(embed, dtype=jnp.bfloat16)

    layers = []
    for l in range(cfg.num_hidden_layers):
        k = lambda pat: pat.format(l=l)
        if arch.fused_qkv:
            # Phi3-style packed qkv_proj, sliced into q/k/v
            # (module.py:154-199 fused-tensor slicing)
            from exllamav2_tpu.quant.qtensor import slice_columns
            fused = load_linear(tfm, k(arch.key_fused_qkv))
            nq = cfg.num_attention_heads * cfg.head_dim
            nkv = cfg.num_key_value_heads * cfg.head_dim
            q_lin = slice_columns(fused, 0, nq)
            k_lin = slice_columns(fused, nq, nq + nkv)
            v_lin = slice_columns(fused, nq + nkv, nq + 2 * nkv)
        else:
            q_lin = load_linear(tfm, k(arch.key_attn_q))
            k_lin = load_linear(tfm, k(arch.key_attn_k))
            v_lin = load_linear(tfm, k(arch.key_attn_v))
        attn = AttnWeights(
            norm=load_norm(tfm, k(arch.key_norm_1)),
            q=q_lin, k=k_lin, v=v_lin,
            o=load_linear(tfm, k(arch.key_attn_o)),
            q_norm=load_norm(tfm, k(arch.key_attn_q_norm))
            if arch.key_attn_q_norm and cfg.use_qk_norm else None,
            k_norm=load_norm(tfm, k(arch.key_attn_k_norm))
            if arch.key_attn_k_norm and cfg.use_qk_norm else None,
        )
        if arch.is_moe:
            mlp = MoEWeights(
                norm=load_norm(tfm, k(arch.key_norm_2)),
                router=load_linear(tfm, k(arch.key_moe_gate)),
                w1=tuple(load_linear(tfm, arch.key_moe_w1.format(l=l, e=e))
                         for e in range(cfg.num_experts)),
                w2=tuple(load_linear(tfm, arch.key_moe_w2.format(l=l, e=e))
                         for e in range(cfg.num_experts)),
                w3=tuple(load_linear(tfm, arch.key_moe_w3.format(l=l, e=e))
                         for e in range(cfg.num_experts)),
            )
        elif arch.fused_gate_up:
            from exllamav2_tpu.quant.qtensor import slice_columns
            fused = load_linear(tfm, k(arch.key_fused_gate_up))
            inter = cfg.intermediate_size
            mlp = MLPWeights(
                norm=load_norm(tfm, k(arch.key_norm_2)),
                gate=slice_columns(fused, 0, inter),
                up=slice_columns(fused, inter, 2 * inter),
                down=load_linear(tfm, k(arch.key_mlp_down)),
            )
        else:
            mlp = MLPWeights(
                norm=load_norm(tfm, k(arch.key_norm_2)),
                gate=load_linear(tfm, k(arch.key_mlp_gate))
                if arch.mlp_gated and arch.key_mlp_gate else None,
                up=load_linear(tfm, k(arch.key_mlp_up)),
                down=load_linear(tfm, k(arch.key_mlp_down)),
            )
        layers.append(LayerWeights(attn=attn, mlp=mlp))

    final_norm = load_norm(tfm, arch.key_norm)
    if cfg.tie_word_embeddings or not tfm.has_prefix(arch.key_head + "."):
        head = from_dense(embed.T)
    else:
        head = load_linear(tfm, arch.key_head)

    sin, cos = build_sincos(cfg)
    w = ModelWeights(embed=embed_j, layers=tuple(layers),
                     final_norm=final_norm, head=head, sin=sin, cos=cos)
    return w, st
