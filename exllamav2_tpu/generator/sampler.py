"""User-facing sampler settings (reference-compatible field names).

Mirrors ExLlamaV2Sampler.Settings (generator/sampler.py:51-99) so users of
the reference can port call sites unchanged; `stack()` lowers a batch of
Settings into the on-device SamplingParams pytree consumed by
ops/sampling.sample.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from exllamav2_tpu.ops.sampling import SamplingParams

__all__ = ["Settings", "stack_settings"]


@dataclasses.dataclass
class Settings:
    token_repetition_penalty: float = 1.025
    token_repetition_range: int = -1
    token_repetition_decay: int = 0
    token_frequency_penalty: float = 0.0
    token_presence_penalty: float = 0.0
    temperature: float = 0.8
    smoothing_factor: float = 0.0
    min_temp: float = 0.0
    max_temp: float = 0.0
    temp_exponent: float = 1.0
    top_k: int = 50
    top_p: float = 0.8
    top_a: float = 0.0
    min_p: float = 0.0
    tfs: float = 0.0
    typical: float = 0.0
    skew: float = 0.0
    temperature_last: bool = False
    mirostat: bool = False
    mirostat_tau: float = 1.5
    mirostat_eta: float = 0.1
    mirostat_mu: float | None = None
    token_bias: np.ndarray | None = None      # [vocab] additive bias
    banned_tokens: list[int] | None = None
    xtc_probability: float = 0.0
    xtc_threshold: float = 0.1
    cfg_scale: float | None = None
    dry_allowed_length: int = 2
    dry_base: float = 1.75
    dry_multiplier: float = 0.0     # 0 disables
    dry_sequence_breakers: set[int] | None = None
    dry_range: int = 0
    dry_max_ngram: int = 20

    @staticmethod
    def greedy(**kwargs) -> "Settings":
        defaults = dict(temperature=1.0, token_repetition_penalty=1.0,
                        top_p=0.0, top_k=1)
        defaults.update(kwargs)
        return Settings(**defaults)

    def clone(self) -> "Settings":
        return dataclasses.replace(self)


def stack_settings(settings: list[Settings],
                   mu_state: list[float] | None = None) -> SamplingParams:
    """Stack per-job Settings into [B] device arrays."""
    n = len(settings)
    mu = mu_state if mu_state is not None else [
        (s.mirostat_mu or 0.0) for s in settings]

    # host numpy (uncommitted) so the jitted step places these wherever
    # the sharded operands live (single device or mesh)
    def f(get):
        return np.array([get(s) for s in settings], np.float32)

    def i(get):
        return np.array([get(s) for s in settings], np.int32)

    def b(get):
        return np.array([get(s) for s in settings], np.bool_)

    return SamplingParams(
        temperature=f(lambda s: s.temperature),
        smoothing_factor=f(lambda s: s.smoothing_factor),
        top_k=i(lambda s: s.top_k),
        top_p=f(lambda s: s.top_p),
        top_a=f(lambda s: s.top_a),
        min_p=f(lambda s: s.min_p),
        tfs=f(lambda s: s.tfs),
        typical=f(lambda s: s.typical),
        skew=f(lambda s: s.skew),
        temperature_last=b(lambda s: s.temperature_last),
        mirostat=b(lambda s: s.mirostat),
        mirostat_mu=np.array(mu, np.float32),
        mirostat_tau=f(lambda s: s.mirostat_tau),
        mirostat_eta=f(lambda s: s.mirostat_eta),
        min_temp=f(lambda s: s.min_temp),
        max_temp=f(lambda s: s.max_temp),
        temp_exponent=f(lambda s: s.temp_exponent),
        xtc_probability=f(lambda s: s.xtc_probability),
        xtc_threshold=f(lambda s: s.xtc_threshold),
        rep_penalty=f(lambda s: s.token_repetition_penalty),
        rep_range=i(lambda s: s.token_repetition_range),
        rep_decay=i(lambda s: s.token_repetition_decay),
        freq_penalty=f(lambda s: s.token_frequency_penalty),
        pres_penalty=f(lambda s: s.token_presence_penalty),
        dry_multiplier=f(lambda s: s.dry_multiplier),
        dry_base=f(lambda s: s.dry_base),
        dry_allowed_length=i(lambda s: s.dry_allowed_length),
        dry_range=i(lambda s: s.dry_range),
        dry_breakers=_stack_breakers(settings),
    )


def _stack_breakers(settings: list[Settings], width: int = 8):
    rows = []
    for s in settings:
        b = sorted(s.dry_sequence_breakers)[:width] \
            if s.dry_sequence_breakers else []
        rows.append(b + [-1] * (width - len(b)))
    return np.array(rows, np.int32)
