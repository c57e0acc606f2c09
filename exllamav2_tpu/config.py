"""Model configuration: reads HF config.json and resolves hyperparameters.

TPU-native analog of ExLlamaV2Config (reference exllamav2/config.py:210-626):
parses config.json / generation_config.json, resolves hidden sizes, GQA
groups, RoPE scaling variants (config.py:383-412), sliding window, soft-
capping, MoE params, and builds the tensor file map from safetensors headers.
Runtime limits (max_seq_len etc., config.py:60-75) live here too.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

from exllamav2_tpu.architecture import ArchParams, get_arch
from exllamav2_tpu.stloader import TensorFileMap

__all__ = ["ModelConfig"]


def _get(d: dict, keys, default=None):
    for k in (keys if isinstance(keys, (list, tuple)) else [keys]):
        if k in d and d[k] is not None:
            return d[k]
    return default


@dataclasses.dataclass
class ModelConfig:
    model_dir: str | None = None
    arch: ArchParams | None = None

    # core dims
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    head_dim: int = 128
    vocab_size: int = 32000
    norm_eps: float = 1e-5
    tie_word_embeddings: bool = False

    # rope
    rotary_embedding_base: float = 10000.0
    rope_scaling: dict | None = None
    partial_rotary_factor: float = 1.0
    max_position_embeddings: int = 2048
    original_max_position_embeddings: int | None = None

    # quirks resolved from config
    sliding_window: int = 0
    attn_logit_softcapping: float = 0.0
    final_logit_softcapping: float = 0.0
    use_qk_norm: bool = False
    logit_scale: float = 1.0
    attention_multiplier: float | None = None  # granite-style explicit scale
    embedding_multiplier: float = 1.0

    # MoE
    num_experts: int = 0
    num_experts_per_tok: int = 0
    moe_intermediate_size: int = 0
    norm_topk_prob: bool = True

    # runtime limits (reference config.py:60-75)
    max_seq_len: int = 2048
    max_batch_size: int = 256
    max_input_len: int = 2048
    max_attention_size: int = 2048 ** 2
    max_output_len: int | None = None

    # token ids
    bos_token_id: int | None = None
    eos_token_id: Any = None
    pad_token_id: int | None = None

    raw: dict = dataclasses.field(default_factory=dict)
    tensor_file_map: TensorFileMap | None = None
    quant_method: str | None = None           # None (fp16) | "exl2" | "gptq"
    gptq_bits: int = 4
    gptq_group_size: int = 128

    @classmethod
    def from_dir(cls, model_dir: str, prepare: bool = True) -> "ModelConfig":
        cfg = cls(model_dir=model_dir)
        if prepare:
            cfg.prepare()
        return cfg

    def prepare(self):
        assert self.model_dir is not None
        with open(os.path.join(self.model_dir, "config.json")) as f:
            c = json.load(f)
        self.load_dict(c)
        self.tensor_file_map = TensorFileMap(self.model_dir)
        self.detect_quant()
        return self

    def load_dict(self, c: dict):
        self.raw = c
        archs = _get(c, "architectures", ["LlamaForCausalLM"])
        self.arch = get_arch(archs[0])

        self.hidden_size = int(_get(c, ["hidden_size", "n_embd", "d_model"], 4096))
        self.num_hidden_layers = int(_get(
            c, ["num_hidden_layers", "n_layer", "num_layers"], 32))
        self.num_attention_heads = int(_get(
            c, ["num_attention_heads", "n_head"], 32))
        self.num_key_value_heads = int(_get(
            c, ["num_key_value_heads", "num_kv_heads"],
            self.num_attention_heads))
        self.head_dim = int(_get(
            c, "head_dim", self.hidden_size // self.num_attention_heads))
        self.intermediate_size = int(_get(
            c, ["intermediate_size", "n_inner", "ffn_dim"],
            4 * self.hidden_size))
        self.vocab_size = int(_get(c, "vocab_size", 32000))
        self.norm_eps = float(_get(
            c, [self.arch.norm_eps_key, "rms_norm_eps", "layer_norm_eps",
                "layer_norm_epsilon"], 1e-5))
        self.tie_word_embeddings = bool(_get(c, "tie_word_embeddings", False))

        self.rotary_embedding_base = float(_get(
            c, ["rope_theta", "rotary_emb_base"], 10000.0))
        self.max_position_embeddings = int(_get(
            c, ["max_position_embeddings", "n_positions"], 2048))
        self.original_max_position_embeddings = _get(
            c, "original_max_position_embeddings")
        self.partial_rotary_factor = float(_get(c, "partial_rotary_factor", 1.0))
        rs = _get(c, ["rope_scaling", "rope_parameters"])
        self.rope_scaling = rs if isinstance(rs, dict) else None

        sw = _get(c, "sliding_window", 0)
        self.sliding_window = int(sw) if sw else 0
        self.attn_logit_softcapping = float(_get(
            c, "attn_logit_softcapping",
            self.arch.attn_logit_softcapping))
        self.final_logit_softcapping = float(_get(
            c, "final_logit_softcapping",
            self.arch.final_logit_softcapping))
        self.use_qk_norm = bool(_get(
            c, "use_qk_norm", self.arch.default_use_qk_norm))
        self.logit_scale = float(_get(c, "logit_scale", 1.0))
        self.attention_multiplier = _get(c, "attention_multiplier")
        self.embedding_multiplier = float(_get(c, "embedding_multiplier", 1.0))

        self.num_experts = int(_get(
            c, ["num_local_experts", "num_experts", "n_routed_experts"], 0))
        self.num_experts_per_tok = int(_get(c, "num_experts_per_tok", 0))
        self.moe_intermediate_size = int(_get(
            c, "moe_intermediate_size", self.intermediate_size))
        self.norm_topk_prob = bool(_get(c, "norm_topk_prob", True))

        self.bos_token_id = _get(c, "bos_token_id")
        self.eos_token_id = _get(c, "eos_token_id")
        self.pad_token_id = _get(c, "pad_token_id")

        self.max_seq_len = min(self.max_position_embeddings, 0x7FFFFFFF) \
            if self.max_position_embeddings else self.max_seq_len
        # rope-scaled models advertise the scaled length already
        self.max_input_len = min(self.max_input_len, self.max_seq_len)

    def detect_quant(self):
        """Detect quantization from tensor names / quantization_config.

        EXL2 = '.q_weight' tensors; GPTQ = '.qweight' (module.py:101-151)."""
        qc = self.raw.get("quantization_config")
        tfm = self.tensor_file_map
        probe = self.arch.key_attn_q.format(l=0) if not self.arch.fused_qkv \
            else self.arch.key_fused_qkv.format(l=0)
        if tfm is not None and (probe + ".q_weight") in tfm:
            self.quant_method = "exl2"
        elif tfm is not None and (probe + ".qweight") in tfm:
            self.quant_method = "gptq"
            if qc:
                self.gptq_bits = int(qc.get("bits", 4))
                self.gptq_group_size = int(qc.get("group_size", 128))
        elif qc and qc.get("quant_method") == "gptq":
            self.quant_method = "gptq"
            self.gptq_bits = int(qc.get("bits", 4))
            self.gptq_group_size = int(qc.get("group_size", 128))
        else:
            self.quant_method = None

    @property
    def num_q_per_kv(self) -> int:
        return self.num_attention_heads // self.num_key_value_heads

    @property
    def rotary_dim(self) -> int:
        return int(self.head_dim * self.partial_rotary_factor)
