"""Headline benchmark: single-sequence greedy decode tokens/s.

Config matches the reference's headline row (BASELINE.md): Llama2-7B
geometry, EXL2 4.0 bpw weights, BF16 KV cache, single sequence. Weights
are synthetic (random packed planes — identical compute/memory profile to
a real checkpoint). Baseline: 211 tokens/s (RTX 4090, reference
README.md:71).

The decode loop dispatches one jitted step per token and timing is
synchronized by a host readback of the final token —
`block_until_ready` returns early through the axon TPU tunnel.

Prints ONE JSON line. The headline metric is the single-sequence decode
rate; `extra` carries the BASELINE.json north-star companions measured in
the same process: prefill TTFT (512-token prompt) and batched decode
throughput (batch 8), both on the same 7B-geometry model.
"""

import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

BASELINE_TPS = 211.0   # Llama2-7B EXL2 4.0bpw on RTX 4090


def main():
    t_start = time.perf_counter()
    budget = float(os.environ.get("BENCH_BUDGET_S", 420))
    import functools
    from exllamav2_tpu.utils.testing import random_model_weights
    from exllamav2_tpu.models.forward import model_forward
    from exllamav2_tpu.cache import KVCache

    max_seq = int(os.environ.get("BENCH_MAX_SEQ", 2048))
    steps = int(os.environ.get("BENCH_STEPS", 128))
    batch_steps = int(os.environ.get("BENCH_BATCH_STEPS", 32))
    bsz = int(os.environ.get("BENCH_BATCH", 8))
    prefill = 512
    skip_extra = os.environ.get("BENCH_NO_EXTRA") == "1"

    w, st = random_model_weights(
        vocab=32000, hidden=4096, layers=32, heads=32, kv_heads=32,
        inter=11008, max_seq=max_seq, bits=4, seed=0)

    @functools.partial(jax.jit, static_argnums=(4,), donate_argnums=(2,))
    def decode(w, tok, cache, past_len, attn_limit):
        logits, cache = model_forward(w, st, tok, cache, past_len,
                                      attn_limit=attn_limit)
        tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        return tok[:, None], cache

    @functools.partial(jax.jit, static_argnums=(3,), donate_argnums=(2,))
    def prefill_step(w, ids, cache, attn_limit):
        logits, cache = model_forward(w, st, ids, cache, jnp.int32(0),
                                      last_token_only=True,
                                      attn_limit=attn_limit)
        tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        return tok[:, None], cache

    def limit(n):
        return min(-(-n // 256) * 256, max_seq)

    # ---- single-sequence decode (headline) ----
    cache = KVCache.alloc(st.num_layers, 1, max_seq, st.num_kv_heads,
                          st.head_dim)
    tok = jnp.ones((1, 1), jnp.int32)
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

    extra = {}
    # extras are best-effort: never risk the headline metric on a driver
    # timeout (each adds compiles that are slow through the tunnel)
    if not skip_extra and time.perf_counter() - t_start < budget:
        # ---- prefill TTFT: 512-token prompt -> first sampled token ----
        ids = jnp.ones((1, prefill), jnp.int32)
        cache_p = KVCache.alloc(st.num_layers, 1, max_seq, st.num_kv_heads,
                                st.head_dim)
        t, cache_p = prefill_step(w, ids, cache_p, limit(prefill))
        np.asarray(t)                    # warm the compile
        times = []
        for _ in range(3):
            cache_p = KVCache.alloc(st.num_layers, 1, max_seq,
                                    st.num_kv_heads, st.head_dim)
            t0 = time.perf_counter()
            t, cache_p = prefill_step(w, ids, cache_p, limit(prefill))
            np.asarray(t)
            times.append(time.perf_counter() - t0)
        extra["ttft_512_ms"] = round(sorted(times)[1] * 1000, 1)
        extra["prefill_tokens_per_s"] = round(
            prefill / sorted(times)[1], 1)

        # ---- batched decode throughput (batch 8, same weights) ----
        if time.perf_counter() - t_start > budget:
            raise SystemExit(_emit(tps, extra))
        cache_b = KVCache.alloc(st.num_layers, bsz, 1024, st.num_kv_heads,
                                st.head_dim)
        tok = jnp.ones((bsz, 1), jnp.int32)
        for i in range(2):
            tok, cache_b = decode(w, tok, cache_b, jnp.int32(256 + i),
                                  limit(257 + i))
        np.asarray(tok)
        t0 = time.perf_counter()
        for i in range(batch_steps):
            p = 258 + i
            tok, cache_b = decode(w, tok, cache_b, jnp.int32(p),
                                  limit(p + 1))
        np.asarray(tok)
        bdt = time.perf_counter() - t0
        extra["batched_tokens_per_s"] = round(bsz * batch_steps / bdt, 1)
        extra["batch_size"] = bsz

    _emit(tps, extra)


def _emit(tps, extra):
    out = {
        "metric": "decode_tokens_per_s_7b_exl2_4bpw",
        "value": round(tps, 2),
        "unit": "tokens/s",
        "vs_baseline": round(tps / BASELINE_TPS, 4),
    }
    if extra:
        out["extra"] = extra
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    main()
