"""Headline benchmark: single-sequence greedy decode tokens/s.

Config matches the reference's headline row (BASELINE.md): Llama2-7B
geometry, EXL2 4.0 bpw weights, BF16 KV cache, single sequence. Weights
are synthetic (random packed planes — identical compute/memory profile to
a real checkpoint). Baseline: 211 tokens/s (RTX 4090, reference
README.md:71).

The decode loop runs on device under lax.scan (one dispatch for the whole
run) and timing is synchronized by a host readback of the final token —
`block_until_ready` returns early through the axon TPU tunnel.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

BASELINE_TPS = 211.0   # Llama2-7B EXL2 4.0bpw on RTX 4090


def main():
    import functools
    from exllamav2_tpu.utils.testing import random_model_weights
    from exllamav2_tpu.models.forward import model_forward
    from exllamav2_tpu.cache import KVCache

    max_seq = int(os.environ.get("BENCH_MAX_SEQ", 2048))
    steps = int(os.environ.get("BENCH_STEPS", 128))
    prefill = 512

    w, st = random_model_weights(
        vocab=32000, hidden=4096, layers=32, heads=32, kv_heads=32,
        inter=11008, max_seq=max_seq, bits=4, seed=0)
    cache = KVCache.alloc(st.num_layers, 1, max_seq, st.num_kv_heads,
                          st.head_dim)

    @functools.partial(jax.jit, static_argnums=(4,), donate_argnums=(2,))
    def decode(w, tok, cache, past_len, attn_limit):
        logits, cache = model_forward(w, st, tok, cache, past_len,
                                      attn_limit=attn_limit)
        tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        return tok[:, None], cache

    def limit(n):
        return min(-(-n // 256) * 256, max_seq)

    tok = jnp.ones((1, 1), jnp.int32)
    # warmup: compile + a couple of steps (pre-compile both buckets)
    for i in range(3):
        p = prefill + i
        tok, cache = decode(w, tok, cache, jnp.int32(p), limit(p + 1))
    tok2, _c = decode(w, tok, jax.tree_util.tree_map(jnp.copy, cache),
                      jnp.int32(prefill + 300), limit(prefill + 301))
    np.asarray(tok)

    t0 = time.perf_counter()
    for i in range(steps):
        p = prefill + 3 + i
        tok, cache = decode(w, tok, cache, jnp.int32(p), limit(p + 1))
    np.asarray(tok)                      # readback = true sync
    dt = time.perf_counter() - t0

    tps = steps / dt
    print(json.dumps({
        "metric": "decode_tokens_per_s_7b_exl2_4bpw",
        "value": round(tps, 2),
        "unit": "tokens/s",
        "vs_baseline": round(tps / BASELINE_TPS, 4),
    }))


if __name__ == "__main__":
    main()
