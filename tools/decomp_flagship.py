"""Per-component accounting of the flagship W4A8 decode step.

Times each weight-stream matmul of the 7B GPTQ-gs128 merged+w4a8
config at decode shape (m=1), plus the exact lm_head and the
attention/RoPE/norm residue (full step minus the sum), against the
full jitted decode step. Confirms (or refutes) that the remaining gap
to the weight-stream bound is attention + head + fixed per-kernel
overhead rather than an unclaimed kernel win (docs/DESIGN.md round-5).

Run on the tunneled TPU: python tools/decomp_flagship.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import functools
    from exllamav2_tpu.utils.testing import random_model_weights
    from exllamav2_tpu.models.forward import model_forward
    from exllamav2_tpu.cache import KVCache
    from exllamav2_tpu.ops.dequant import (enable_w4a8,
                                           merge_serving_weights,
                                           precompute_model_scales)
    from exllamav2_tpu.ops import qmm as M
    from exllamav2_tpu.utils.timing import device_time

    w, st = random_model_weights(max_seq=2048, bits=4, seed=0, fmt="gptq")
    w = enable_w4a8(precompute_model_scales(merge_serving_weights(w)))
    layer = w.layers[0]
    qbytes = {}
    comps = {
        "qkv_merged": layer.attn.qkv if layer.attn.qkv is not None
        else layer.attn.q,
        "o_proj": layer.attn.o,
        "gate_up_merged": layer.mlp.gate_up
        if getattr(layer.mlp, "gate_up", None) is not None
        else layer.mlp.up,
        "down_proj": layer.mlp.down,
    }
    report = {}
    for name, lin in comps.items():
        x = (jnp.arange(lin.k, dtype=jnp.bfloat16)[None, :] % 7) * 0.01
        f = lambda xv, lin=lin: M.qmm(xv, lin, fused=True).astype(
            jnp.bfloat16)
        t = device_time(lambda xv, f=f: f(xv), x, iters=128)
        by = sum(int(np.prod(p.shape)) * 4 for s in lin.segments
                 for p in s.planes)
        by += sum((int(np.prod(s.scale_bf.shape)) * 2 +
                   int(np.prod(s.zs_bf.shape)) * 2)
                  if getattr(s, "scale_bf", None) is not None else
                  int(np.prod(s.scale.shape)) * 4 +
                  int(np.prod(s.zero.shape)) * 4
                  for s in lin.segments)
        qbytes[name] = by
        report[name] = (t, by)
        print(f"{name:16s} {t*1e6:8.1f} us  {by/2**20:7.1f} MiB  "
              f"{by/t/1e9:6.1f} GB/s", flush=True)

    # exact lm_head at decode shape
    head = w.head
    xh = (jnp.arange(head.k, dtype=jnp.bfloat16)[None, :] % 7) * 0.01
    th = device_time(lambda xv: M.qmm(xv, head, fused=True).astype(
        jnp.bfloat16), xh, iters=64)
    bh = sum(int(np.prod(p.shape)) * 4 for s in head.segments
             for p in s.planes)
    print(f"{'lm_head(exact)':16s} {th*1e6:8.1f} us  {bh/2**20:7.1f} MiB  "
          f"{bh/th/1e9:6.1f} GB/s", flush=True)

    # full decode step, host-timed per token (what bench.py measures)
    @functools.partial(jax.jit, static_argnums=(4,), donate_argnums=(2,))
    def decode(wv, tok, cache, past_len, attn_limit):
        logits, cache = model_forward(wv, st, tok, cache, past_len,
                                      attn_limit=attn_limit)
        tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        return tok[:, None], cache

    cache = KVCache.alloc(st.num_layers, 1, 2048, st.num_kv_heads,
                          st.head_dim)
    tok = jnp.ones((1, 1), jnp.int32)
    for i in range(3):
        tok, cache = decode(w, tok, cache, jnp.int32(512 + i), 768)
    np.asarray(tok)
    t0 = time.perf_counter()
    steps = 64
    for i in range(steps):
        tok, cache = decode(w, tok, cache, jnp.int32(515 + i), 768)
    np.asarray(tok)
    step_ms = (time.perf_counter() - t0) / steps * 1000

    L = st.num_layers
    lin_ms = sum(t for t, _ in report.values()) * 1000 * L
    head_ms = th * 1000
    resid = step_ms - lin_ms - head_ms
    tot_bytes = sum(by for _, by in report.values()) * L + bh
    print(f"\nfull step        {step_ms:8.3f} ms  ({1000/step_ms:.1f} t/s)")
    print(f"linears x{L}      {lin_ms:8.3f} ms")
    print(f"lm_head          {head_ms:8.3f} ms")
    print(f"residue          {resid:8.3f} ms  "
          f"(attn+norms+rope+sampler+dispatch)")
    print(f"weight stream    {tot_bytes/2**30:.2f} GiB/token -> bound "
          f"{tot_bytes/1e9/0.62:.1f} ms at 620 GB/s", flush=True)


if __name__ == "__main__":
    main()
