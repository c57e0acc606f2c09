"""Weight pytrees for decoder models.

The TPU-first counterpart of the reference's module classes (attn.py,
mlp.py, rmsnorm.py, embedding.py, …). Instead of stateful torch modules,
weights are plain pytree dataclasses and the math lives in pure jitted
functions (models/forward.py) — XLA's compilation replaces the reference's
CUDA-graph machinery (cuda/graph.cu) outright.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax

__all__ = ["NormWeights", "AttnWeights", "MLPWeights", "MoEWeights",
           "EPMoEWeights", "LayerWeights", "ModelWeights", "StaticModel",
           "LayerStatic"]


@partial(jax.tree_util.register_dataclass,
         data_fields=["weight", "bias"], meta_fields=[])
@dataclasses.dataclass
class NormWeights:
    """RMS / LayerNorm weights (rmsnorm.py / layernorm.py analog)."""
    weight: jax.Array                 # [d] f32
    bias: jax.Array | None = None     # [d] f32 (layernorm only)


@partial(jax.tree_util.register_dataclass,
         data_fields=["norm", "q", "k", "v", "o", "q_norm", "k_norm",
                      "norm_post", "qkv"],
         meta_fields=[])
@dataclasses.dataclass
class AttnWeights:
    """One attention block (attn.py analog). q/k/v/o are QuantLinear or
    DenseLinear; q_norm/k_norm are per-head-dim norms (Qwen3/Gemma3);
    norm_post is the Gemma2/GLM4 post-attention norm applied to the block
    output before the residual add. qkv, when set, is a column-merged
    single linear streamed by ONE fused kernel call in decode
    (ops/dequant.merge_serving_linears); q/k/v stay for prefill and as
    the exact reference."""
    norm: NormWeights
    q: Any
    k: Any
    v: Any
    o: Any
    q_norm: NormWeights | None = None
    k_norm: NormWeights | None = None
    norm_post: NormWeights | None = None
    qkv: Any | None = None


@partial(jax.tree_util.register_dataclass,
         data_fields=["norm", "gate", "up", "down", "norm_post",
                      "gate_up"],
         meta_fields=[])
@dataclasses.dataclass
class MLPWeights:
    """Gated or ungated MLP (mlp.py analog); gate is None when ungated;
    norm_post is the Gemma2/GLM4 post-feedforward norm. gate_up, when
    set, is the column-merged decode fast path (see AttnWeights.qkv)."""
    norm: NormWeights
    gate: Any | None
    up: Any
    down: Any
    norm_post: NormWeights | None = None
    gate_up: Any | None = None


@partial(jax.tree_util.register_dataclass,
         data_fields=["norm", "router", "w1", "w2", "w3", "norm_post"],
         meta_fields=[])
@dataclasses.dataclass
class MoEWeights:
    """Block-sparse MoE (moe_mlp.py analog). w1/w2/w3 are tuples of linears,
    one per expert (gate/down/up in llama naming)."""
    norm: NormWeights
    router: Any                      # DenseLinear [d, n_experts]
    w1: tuple
    w2: tuple
    w3: tuple
    norm_post: NormWeights | None = None


@partial(jax.tree_util.register_dataclass,
         data_fields=["norm", "router", "w1", "w2", "w3", "norm_post"],
         meta_fields=[])
@dataclasses.dataclass
class EPMoEWeights:
    """Expert-parallel MoE: w1/w2/w3 are SINGLE stacked linears whose
    data leaves carry a leading expert axis [E, ...], sharded over the
    mesh axis so each shard owns whole experts (SURVEY §2.5 EP row —
    the reference keeps all experts local, moe_mlp.py). Full-width
    expert matmuls + one psum replace the column-split path's two
    all-gathers per MoE layer."""
    norm: NormWeights
    router: Any                      # replicated DenseLinear
    w1: Any                          # stacked QuantLinear | DenseLinear
    w2: Any
    w3: Any
    norm_post: NormWeights | None = None


@partial(jax.tree_util.register_dataclass,
         data_fields=["attn", "mlp"], meta_fields=[])
@dataclasses.dataclass
class LayerWeights:
    attn: AttnWeights
    mlp: Any                          # MLPWeights | MoEWeights


@partial(jax.tree_util.register_dataclass,
         data_fields=["embed", "layers", "final_norm", "head", "sin", "cos",
                      "pos_emb", "sin_alt", "cos_alt"],
         meta_fields=[])
@dataclasses.dataclass
class ModelWeights:
    embed: jax.Array                  # [vocab, d] bf16
    layers: tuple                     # tuple[LayerWeights, ...]
    final_norm: NormWeights
    head: Any                         # QuantLinear | DenseLinear
    sin: jax.Array                    # [max_seq, rot/2] rope table
    cos: jax.Array
    pos_emb: jax.Array | None = None  # [max_pos, d] learned positions (GPT2)
    sin_alt: jax.Array | None = None  # gemma3 SWA-layer rope table
    cos_alt: jax.Array | None = None


@dataclasses.dataclass(frozen=True)
class LayerStatic:
    """Per-layer static info (hashable; jit-static)."""
    sliding_window: int = 0           # 0 = full attention
    alt_rope: bool = False            # gemma3: SWA layers use sin/cos_alt
    rope_enabled: bool = True         # cohere2: NoPE on full-attn layers


@dataclasses.dataclass(frozen=True)
class StaticModel:
    """Static (hashable) model description closed over by jitted forwards.

    Everything shape- or branch-determining lives here; ModelWeights holds
    only arrays. Mirrors what the reference scatters across ExLlamaV2Config
    and ExLlamaV2ArchParams.
    """
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    hidden_size: int
    vocab_size: int
    norm_eps: float
    norm_type: str = "rms"            # "rms" | "layernorm"
    norm_constant_bias: float = 0.0
    rope_style: str = "neox"          # "neox" | "gptj" | "none"
    mlp_act: str = "silu"
    mlp_gated: bool = True
    use_qk_norm: bool = False
    attn_logit_softcap: float = 0.0
    final_logit_softcap: float = 0.0
    normalize_embeddings: bool = False
    embedding_multiplier: float = 1.0
    attn_scale: float | None = None   # None -> 1/sqrt(head_dim)
    logit_scale: float = 1.0
    residual_fp32: bool = False
    parallel_blocks: bool = False
    scale_depth: float = 1.0          # minicpm/granite residual multiplier
    learned_pos_emb: bool = False     # gpt2: add pos_emb rows after embed
    # False forces the dequant+XLA-matmul path everywhere (multi-device GSPMD
    # can't partition a pallas custom call on its own; the fused sharded
    # path wraps the forward in shard_map instead — see parallel/sharding)
    fused_matmul: bool = True
    # set inside shard_map: mesh axis name for TP collectives; head/kv
    # counts in this StaticModel are then PER-SHARD values
    tp_axis: str | None = None
    layers: tuple = ()                # tuple[LayerStatic, ...]
    # MoE
    num_experts: int = 0
    num_experts_per_tok: int = 0
    norm_topk_prob: bool = True

    @property
    def q_per_kv(self) -> int:
        return self.num_heads // self.num_kv_heads
