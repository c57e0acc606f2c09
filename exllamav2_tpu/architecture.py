"""Architecture registry: declarative per-family parameters.

TPU-native analog of the reference's exllamav2/architecture.py (966 lines,
~28 architectures). Each entry states tensor-key layouts, norm type, rope
style and quirk flags; the model builder (models/model.py) consumes these
to assemble the layer graph. Families are added incrementally; Llama is the
default template exactly as in the reference (architecture.py:904-966).
"""

from __future__ import annotations

import dataclasses
import enum

__all__ = ["RopeStyle", "NormType", "ArchParams", "get_arch", "ARCHITECTURES"]


class RopeStyle(enum.Enum):
    NONE = 0
    GPTJ = 1      # rotate interleaved even/odd pairs
    NEOX = 2      # rotate half (llama-style)


class NormType(enum.Enum):
    RMS = 0
    LAYERNORM = 1


@dataclasses.dataclass
class ArchParams:
    arch_string: str
    # tensor keys (format slots: {l} layer index, {e} expert index)
    key_embedding: str = "model.embed_tokens"
    key_norm_1: str = "model.layers.{l}.input_layernorm"
    key_norm_2: str = "model.layers.{l}.post_attention_layernorm"
    key_attn_q: str = "model.layers.{l}.self_attn.q_proj"
    key_attn_k: str = "model.layers.{l}.self_attn.k_proj"
    key_attn_v: str = "model.layers.{l}.self_attn.v_proj"
    key_attn_o: str = "model.layers.{l}.self_attn.o_proj"
    key_attn_q_norm: str | None = None       # qwen3/gemma3 per-head qk norm
    key_attn_k_norm: str | None = None
    key_mlp_gate: str | None = "model.layers.{l}.mlp.gate_proj"
    key_mlp_up: str = "model.layers.{l}.mlp.up_proj"
    key_mlp_down: str = "model.layers.{l}.mlp.down_proj"
    key_norm: str = "model.norm"
    key_head: str = "lm_head"
    # MoE keys
    key_moe_gate: str | None = None           # router
    key_moe_w1: str | None = None             # gate_proj per expert
    key_moe_w2: str | None = None             # down_proj per expert
    key_moe_w3: str | None = None             # up_proj per expert
    # structure
    norm: NormType = NormType.RMS
    rope_style: RopeStyle = RopeStyle.NEOX
    mlp_act: str = "silu"                     # silu | gelu
    mlp_gated: bool = True
    is_moe: bool = False
    parallel_decoder_blocks: bool = False     # cohere-style
    # quirks (reference architecture.py:134-249)
    norm_eps_key: str = "rms_norm_eps"
    attention_bias: bool = False              # qwen2 style qkv bias
    mlp_bias: bool = False
    norm_constant_bias: float = 0.0           # gemma adds 1 to norm weight
    normalize_embeddings: bool = False        # gemma multiplies by sqrt(dim)
    residual_stream_fp32: bool = False
    clamp_hidden_states: bool = False
    logit_scale_basedim: bool = False         # granite
    attn_logit_softcapping: float = 0.0       # gemma2
    final_logit_softcapping: float = 0.0
    sliding_window_pattern: int = 0           # alternating SWA every N layers
    swa_full_layer_interval: int = 0          # gemma3: 1 full per N
    default_use_qk_norm: bool = False
    scale_attn_weights_by_layer: bool = False
    untie_word_embeddings_key: str = "tie_word_embeddings"
    fused_qkv: bool = False                   # phi3-style packed qkv
    key_fused_qkv: str | None = None
    fused_gate_up: bool = False               # phi3-style packed gate_up
    key_fused_gate_up: str | None = None
    learned_pos_emb: bool = False             # gpt2


def _llama(**kw) -> ArchParams:
    return ArchParams(**kw)


ARCHITECTURES: dict[str, ArchParams] = {}


def _register(arch: ArchParams):
    ARCHITECTURES[arch.arch_string] = arch
    return arch


# Llama family — the default (covers Llama 1/2/3, Yi, Orion-like layouts).
_register(_llama(arch_string="LlamaForCausalLM"))

# Mistral: identical tensor layout; sliding window handled via config.
_register(_llama(arch_string="MistralForCausalLM"))

# Qwen2/2.5: attention bias on q/k/v.
_register(_llama(arch_string="Qwen2ForCausalLM", attention_bias=True))

# Qwen3: per-head q/k norms, no attn bias.
_register(_llama(
    arch_string="Qwen3ForCausalLM",
    key_attn_q_norm="model.layers.{l}.self_attn.q_norm",
    key_attn_k_norm="model.layers.{l}.self_attn.k_norm",
    default_use_qk_norm=True,
))

# Qwen3 MoE.
_register(_llama(
    arch_string="Qwen3MoeForCausalLM",
    key_attn_q_norm="model.layers.{l}.self_attn.q_norm",
    key_attn_k_norm="model.layers.{l}.self_attn.k_norm",
    default_use_qk_norm=True,
    is_moe=True,
    key_moe_gate="model.layers.{l}.mlp.gate",
    key_moe_w1="model.layers.{l}.mlp.experts.{e}.gate_proj",
    key_moe_w2="model.layers.{l}.mlp.experts.{e}.down_proj",
    key_moe_w3="model.layers.{l}.mlp.experts.{e}.up_proj",
))

# Mixtral MoE.
_register(_llama(
    arch_string="MixtralForCausalLM",
    is_moe=True,
    key_moe_gate="model.layers.{l}.block_sparse_moe.gate",
    key_moe_w1="model.layers.{l}.block_sparse_moe.experts.{e}.w1",
    key_moe_w2="model.layers.{l}.block_sparse_moe.experts.{e}.w2",
    key_moe_w3="model.layers.{l}.block_sparse_moe.experts.{e}.w3",
))

# Gemma: geglu, +1 norm bias, embedding scaling, tied head.
_register(_llama(
    arch_string="GemmaForCausalLM",
    mlp_act="gelu",
    norm_constant_bias=1.0,
    normalize_embeddings=True,
))

# Gemma2: adds softcapping + alternating SWA + pre/post norms (pre only v1).
_register(_llama(
    arch_string="Gemma2ForCausalLM",
    mlp_act="gelu",
    norm_constant_bias=1.0,
    normalize_embeddings=True,
    attn_logit_softcapping=50.0,
    final_logit_softcapping=30.0,
    sliding_window_pattern=2,
    residual_stream_fp32=True,
))

# Phi3: fused qkv + fused gate_up.
_register(_llama(
    arch_string="Phi3ForCausalLM",
    fused_qkv=True,
    key_fused_qkv="model.layers.{l}.self_attn.qkv_proj",
    fused_gate_up=True,
    key_fused_gate_up="model.layers.{l}.mlp.gate_up_proj",
))

# StarCoder2: layernorm + ungated gelu MLP + biases.
_register(_llama(
    arch_string="Starcoder2ForCausalLM",
    norm=NormType.LAYERNORM,
    norm_eps_key="norm_epsilon",
    mlp_gated=False,
    mlp_act="gelu",
    key_mlp_gate=None,
    key_mlp_up="model.layers.{l}.mlp.c_fc",
    key_mlp_down="model.layers.{l}.mlp.c_proj",
    attention_bias=True,
    mlp_bias=True,
))

# Cohere: layernorm, parallel decoder blocks, tied embeddings w/ logit scale.
_register(_llama(
    arch_string="CohereForCausalLM",
    norm=NormType.LAYERNORM,
    norm_eps_key="layer_norm_eps",
    parallel_decoder_blocks=True,
))

# GLM4-style (kept llama-shaped; partial-rotary handled via config).
_register(_llama(arch_string="Glm4ForCausalLM", attention_bias=True))


def get_arch(arch_string: str) -> ArchParams:
    """Look up an architecture; unknown archs fall back to the Llama layout
    (the reference does the same with a warning, architecture.py:904)."""
    if arch_string in ARCHITECTURES:
        return ARCHITECTURES[arch_string]
    import warnings
    warnings.warn(f"unknown architecture {arch_string!r}; assuming Llama layout")
    return dataclasses.replace(
        ARCHITECTURES["LlamaForCausalLM"], arch_string=arch_string)
