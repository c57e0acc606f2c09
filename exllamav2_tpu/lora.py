"""LoRA adapter loading and application.

Analog of exllamav2/lora.py: loads a PEFT adapter (adapter_config.json +
adapter_model.safetensors), registers per-target A/B matrices, and applies
them at runtime. TPU-first design: instead of registering adapters into
mutable module state (lora.py:80-170) and threading adapter id lists into
fused kernels, applying a LoRA wraps the targeted linears in a LoraLinear
pytree node — the jitted forward picks it up on the next call (one
recompile per attach/detach, then zero overhead; XLA fuses the rank-r
matmuls into the step).
"""

from __future__ import annotations

import dataclasses
import json
import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from exllamav2_tpu.stloader import STFile, bf16_bits_to_f32
from exllamav2_tpu.models.modules import (
    LayerWeights, MLPWeights, ModelWeights)

__all__ = ["Lora", "LoraLinear", "apply_lora", "remove_lora"]


@partial(jax.tree_util.register_dataclass,
         data_fields=["base", "a", "b"], meta_fields=["scaling"])
@dataclasses.dataclass
class LoraLinear:
    """y = base(x) + scaling * (x @ a) @ b;  a [in, r], b [r, out]."""
    base: object
    a: jax.Array
    b: jax.Array
    scaling: float


class Lora:
    """Parsed PEFT adapter (ExLlamaV2Lora analog)."""

    def __init__(self, directory: str, lora_scaling: float = 1.0):
        cfg_path = os.path.join(directory, "adapter_config.json")
        st_path = os.path.join(directory, "adapter_model.safetensors")
        with open(cfg_path) as f:
            cfg = json.load(f)
        self.lora_r = int(cfg["r"])
        self.lora_alpha = float(cfg["lora_alpha"])
        self.scaling = lora_scaling * self.lora_alpha / self.lora_r
        st = STFile(st_path)

        def get(name):
            t = st.get_tensor(name)
            if st.get_dtype(name) == "BF16":
                return bf16_bits_to_f32(t)
            return t.astype(np.float32)

        # target key -> (A [in, r], B [r, out])
        self.targets: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        for name in list(st.keys()):
            if not name.endswith("lora_A.weight"):
                continue
            prefix = name[:-len(".lora_A.weight")]
            a = get(name)                              # [r, in] (PEFT)
            b = get(prefix + ".lora_B.weight")         # [out, r]
            key = prefix.replace("base_model.model.", "")
            self.targets[key] = (a.T.copy(), b.T.copy())
        st.close()

    def pair_for(self, key: str):
        return self.targets.get(key)


def _wrap(lin, lora: Lora, key: str):
    pair = lora.pair_for(key)
    if pair is None or lin is None:
        return lin
    a, b = pair
    return LoraLinear(base=lin,
                      a=jnp.asarray(a, jnp.bfloat16),
                      b=jnp.asarray(b, jnp.bfloat16),
                      scaling=float(lora.scaling))


def apply_lora(weights: ModelWeights, lora: Lora) -> ModelWeights:
    """Return weights with targeted linears wrapped (model.load_lora)."""
    layers = []
    for l, lw in enumerate(weights.layers):
        p = f"model.layers.{l}"
        attn = dataclasses.replace(
            lw.attn,
            q=_wrap(lw.attn.q, lora, f"{p}.self_attn.q_proj"),
            k=_wrap(lw.attn.k, lora, f"{p}.self_attn.k_proj"),
            v=_wrap(lw.attn.v, lora, f"{p}.self_attn.v_proj"),
            o=_wrap(lw.attn.o, lora, f"{p}.self_attn.o_proj"))
        if isinstance(lw.mlp, MLPWeights):
            mlp = dataclasses.replace(
                lw.mlp,
                gate=_wrap(lw.mlp.gate, lora, f"{p}.mlp.gate_proj"),
                up=_wrap(lw.mlp.up, lora, f"{p}.mlp.up_proj"),
                down=_wrap(lw.mlp.down, lora, f"{p}.mlp.down_proj"))
        else:
            mlp = lw.mlp
        layers.append(LayerWeights(attn=attn, mlp=mlp))
    return dataclasses.replace(weights, layers=tuple(layers))


def remove_lora(weights: ModelWeights) -> ModelWeights:
    """Unwrap all LoraLinear nodes (model.unload_lora)."""
    def unwrap(lin):
        return lin.base if isinstance(lin, LoraLinear) else lin

    layers = []
    for lw in weights.layers:
        attn = dataclasses.replace(
            lw.attn, q=unwrap(lw.attn.q), k=unwrap(lw.attn.k),
            v=unwrap(lw.attn.v), o=unwrap(lw.attn.o))
        if isinstance(lw.mlp, MLPWeights):
            mlp = dataclasses.replace(
                lw.mlp, gate=unwrap(lw.mlp.gate), up=unwrap(lw.mlp.up),
                down=unwrap(lw.mlp.down))
        else:
            mlp = lw.mlp
        layers.append(LayerWeights(attn=attn, mlp=mlp))
    return dataclasses.replace(weights, layers=tuple(layers))
