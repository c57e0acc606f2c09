"""Evaluation helpers: perplexity over token rows, strided wiki2-style.

Backs the test_inference.py CLI modes (-ed perplexity eval with cache
modes, reference test_inference.py:45-66) and the qcache_eval replication
(doc/qcache_eval.md).
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["perplexity"]


def perplexity(model, token_rows: np.ndarray, cache_kind: str = "bf16",
               batch: int = 1, progress=None) -> float:
    """Mean NLL exp over rows [R, T] (test_inference.py ppl mode).

    Evaluates with the paged cache in the requested quantization so the
    qcache quality deltas (doc/qcache_eval.md) are measurable.
    """
    from exllamav2_tpu.cache_paged import PagedKVCache
    from exllamav2_tpu.models.forward import model_forward_paged
    import functools

    rows, t = token_rows.shape
    st = model.static
    pages_per = -(-t // 256)
    cache = PagedKVCache.alloc(st.num_layers, pages_per * batch + 1,
                               st.num_kv_heads, st.head_dim, cache_kind)

    @functools.partial(jax.jit, donate_argnums=(2,))
    def score(w, ids, cache, bt, row_mask):
        logits, cache = model_forward_paged(
            w, st, ids, cache, bt, jnp.zeros((ids.shape[0],), jnp.int32))
        lsm = jax.nn.log_softmax(logits[:, :-1, :], axis=-1)
        tgt = ids[:, 1:]
        nll = -jnp.take_along_axis(lsm, tgt[..., None], axis=-1)[..., 0]
        return jnp.sum(nll * row_mask[:, None]), cache

    bt = np.arange(1, pages_per * batch + 1, dtype=np.int32).reshape(
        batch, pages_per)
    total_nll = 0.0
    total_tok = 0
    for r0 in range(0, rows, batch):
        chunk = token_rows[r0:r0 + batch]
        if chunk.shape[0] < batch:
            pad = np.repeat(chunk[-1:], batch - chunk.shape[0], axis=0)
            real = chunk.shape[0]
            chunk = np.concatenate([chunk, pad], axis=0)
        else:
            real = batch
        mask = np.zeros((batch,), np.float32)
        mask[:real] = 1.0
        nll, cache = score(model.weights, jnp.asarray(chunk), cache,
                           jnp.asarray(bt), jnp.asarray(mask))
        total_nll += float(nll)
        total_tok += real * (t - 1)
        if progress:
            progress(r0 + real, rows)
    return math.exp(total_nll / total_tok)
