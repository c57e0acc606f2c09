"""High-level model container.

Analog of ExLlamaV2 (reference model.py:78-1054) minus device-placement
gymnastics: on TPU a model is a weight pytree + a pair of jitted step
functions (prefill / decode), with the KV cache donated between steps so
XLA updates it in place.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from exllamav2_tpu.cache import KVCache
from exllamav2_tpu.config import ModelConfig
from exllamav2_tpu.models.forward import model_forward
from exllamav2_tpu.models.loader import load_model
from exllamav2_tpu.models.modules import ModelWeights, StaticModel

__all__ = ["Model"]


@functools.partial(jax.jit, static_argnums=(1, 5), donate_argnums=(3,))
def _prefill_step(w, st, ids, cache, past_len, attn_limit):
    return model_forward(w, st, ids, cache, past_len, last_token_only=True,
                         attn_limit=attn_limit)


@functools.partial(jax.jit, static_argnums=(1, 5), donate_argnums=(3,))
def _decode_step(w, st, ids, cache, past_len, attn_limit):
    return model_forward(w, st, ids, cache, past_len, last_token_only=False,
                         attn_limit=attn_limit)


def _limit_bucket(n: int, cap: int, step: int = 256) -> int:
    """Bucket the attention span up to a multiple of `step` (bounds HBM
    reads to the live sequence without a recompile per token)."""
    return min(-(-n // step) * step, cap)


class Model:
    """Loaded model + jitted forward steps."""

    def __init__(self, weights: ModelWeights, static: StaticModel,
                 config: ModelConfig | None = None):
        self.weights = weights
        self.static = static
        self.config = config

    @classmethod
    def from_dir(cls, model_dir: str, prescale: bool | None = None,
                 **cfg_overrides) -> "Model":
        import os
        cfg = ModelConfig.from_dir(model_dir)
        for k, v in cfg_overrides.items():
            setattr(cfg, k, v)
        w, st = load_model(cfg)
        # PRODUCTION DEFAULT (round 5): decode EXL2 sqrt-encoded group
        # scales once at load into bf16 rows the fused kernel streams
        # (+4.7% decode measured on-chip, exact arithmetic; see
        # ops/dequant.precompute_scales_linear). EXL2_TPU_PRESCALE=0 or
        # prescale=False opts out (e.g. for bitwise golden comparisons
        # against the fp16 in-kernel decode).
        if prescale is None:
            prescale = os.environ.get("EXL2_TPU_PRESCALE", "1") == "1"
        if prescale:
            from exllamav2_tpu.ops.dequant import precompute_model_scales
            w = precompute_model_scales(w)
        m = cls(w, st, cfg)
        # record the opt-out so DynamicGenerator's own prescale default
        # doesn't silently re-apply what the caller explicitly disabled
        m._prescale = prescale
        return m

    def new_cache(self, batch: int = 1, max_seq: int | None = None,
                  dtype=jnp.bfloat16) -> KVCache:
        st = self.static
        max_seq = max_seq or (self.config.max_seq_len if self.config else 2048)
        return KVCache.alloc(st.num_layers, batch, max_seq,
                             st.num_kv_heads, st.head_dim, dtype)

    def forward(self, ids, cache: KVCache, past_len: int,
                last_token_only: bool = False):
        """ids [B, T] -> (logits f32, cache). Jit-cached per (T, B).

        Inputs longer than max_input_len are processed in chunks bounded
        additionally by max_attention_size (reference model.py:873-895) —
        long prompts stream through without materializing one giant
        attention problem.
        """
        ids = jnp.asarray(ids, jnp.int32)
        max_in = self.config.max_input_len if self.config else 2048
        max_attn = self.config.max_attention_size if self.config \
            else 2048 ** 2
        t = ids.shape[1]
        if t > max_in or (past_len + t) * t > max_attn:
            chunks = []
            pos = 0
            while pos < t:
                remaining = t - pos
                size = min(max_in, remaining)
                # shrink so q_len * kv_len stays under max_attention_size
                while size > 1 and (past_len + pos + size) * size > max_attn:
                    size = max(size // 2, 1)
                last = pos + size >= t
                lg, cache = self._forward_one(
                    ids[:, pos:pos + size], cache, past_len + pos,
                    last_token_only)
                if last or not last_token_only:
                    chunks.append(lg)
                pos += size
            logits = chunks[-1] if last_token_only \
                else jnp.concatenate(chunks, axis=1)
            return logits, cache
        return self._forward_one(ids, cache, past_len, last_token_only)

    def _forward_one(self, ids, cache: KVCache, past_len: int,
                     last_token_only: bool):
        limit = _limit_bucket(int(past_len) + ids.shape[1], cache.max_seq)
        step = _prefill_step if last_token_only else _decode_step
        return step(self.weights, self.static, ids, cache,
                    jnp.int32(past_len), limit)

    def forward_with_hooks(self, ids, cache: KVCache, past_len: int,
                           pre_hooks: dict | None = None,
                           post_hooks: dict | None = None):
        """Layer-stepped forward with intervention hooks (the functional
        analog of the reference's Intervention wrapper, module.py:251-291).

        pre_hooks/post_hooks map layer index -> fn(hidden [B, T, d]) ->
        hidden, applied before/after that decoder block. Runs the
        unfused layer walk (one jit per block), so hooks are ordinary
        Python/JAX functions — no recompilation of the whole model per
        hook identity.
        """
        from exllamav2_tpu.models.forward import (
            _block_forward, norm_apply)
        from exllamav2_tpu.ops.qmm import linear_apply
        pre_hooks = pre_hooks or {}
        post_hooks = post_hooks or {}
        w, st = self.weights, self.static
        ids = jnp.asarray(ids, jnp.int32)
        x = jnp.take(w.embed, ids, axis=0).astype(jnp.bfloat16)
        if st.normalize_embeddings:
            x = x * (st.hidden_size ** 0.5)
        if st.embedding_multiplier != 1.0:
            x = x * st.embedding_multiplier
        pos = jnp.arange(past_len, past_len + ids.shape[1],
                         dtype=jnp.int32)
        sin = jnp.take(w.sin, pos, axis=0)
        cos = jnp.take(w.cos, pos, axis=0)
        for layer in range(st.num_layers):
            if layer in pre_hooks:
                x = pre_hooks[layer](x)
            x, cache = _block_forward(x, w.layers[layer], st, layer, sin,
                                      cos, cache, jnp.int32(past_len))
            if layer in post_hooks:
                x = post_hooks[layer](x)
        xn = norm_apply(x, w.final_norm, st)
        logits = linear_apply(
            xn.reshape(-1, st.hidden_size), w.head).astype(jnp.float32)
        logits = logits.reshape(*ids.shape, -1)[..., :st.vocab_size]
        if st.logit_scale != 1.0:
            logits = logits * st.logit_scale
        if st.final_logit_softcap:
            c = st.final_logit_softcap
            logits = c * jnp.tanh(logits / c)
        return logits, cache

    def generate_greedy(self, prompt_ids: np.ndarray, max_new_tokens: int,
                        max_seq: int | None = None,
                        stop_token: int | None = None) -> np.ndarray:
        """Reference-free greedy loop (test_inference.py prompt-mode analog).

        prompt_ids [B, T0] -> [B, T0 + max_new]. Python loop on host; the
        serving path lives in the generator which batches/schedules jobs.
        """
        prompt_ids = np.atleast_2d(np.asarray(prompt_ids, np.int32))
        b, t0 = prompt_ids.shape
        total = t0 + max_new_tokens
        cache = self.new_cache(batch=b, max_seq=max_seq or total)
        logits, cache = self.forward(prompt_ids, cache, 0,
                                     last_token_only=True)
        out = [prompt_ids]
        tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        pos = t0
        for _ in range(max_new_tokens - 1):
            out.append(np.asarray(tok)[:, None])
            if stop_token is not None and bool((tok == stop_token).all()):
                return np.concatenate(out, axis=1)
            logits, cache = self.forward(tok[:, None], cache, pos)
            tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
            pos += 1
        out.append(np.asarray(tok)[:, None])
        return np.concatenate(out, axis=1)
