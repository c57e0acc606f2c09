"""Device timing utilities.

The axon TPU tunnel completes `block_until_ready()` before the device work
actually finishes, and a host readback carries ~tens of ms fixed latency.
`device_time` therefore times an on-device `fori_loop` chain at two iteration
counts and reports the slope, which cancels dispatch + readback overhead.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
__all__ = ["device_time"]


def _chain(f: Callable, x0: jax.Array, iters: int):
    """Run y=f(x) `iters` times with a forced sequential data dependency."""

    def body(i, x):
        y = f(x)
        # fold a full reduction of y back into x to serialize iterations; a
        # single-element probe would let XLA slice the computation down to
        # just that element
        leaves = jax.tree_util.tree_leaves(y)
        probe = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
        eps = (probe * jnp.float32(1e-30)).astype(x.dtype)
        return x + eps

    return jax.lax.fori_loop(0, iters, body, x0)


def device_time(f: Callable, x: jax.Array, iters: int = 32,
                reps: int = 3) -> float:
    """Seconds per call of f(x) on device, overhead-cancelled."""
    lo, hi = max(1, iters // 4), iters
    # return only a scalar: full-array readback over the tunnel is very slow
    g_lo = jax.jit(lambda x: jnp.ravel(_chain(f, x, lo))[0])
    g_hi = jax.jit(lambda x: jnp.ravel(_chain(f, x, hi))[0])

    def run(g):
        float(jax.device_get(g(x)))

    run(g_lo)
    run(g_hi)   # warm up compiles + caches

    def best_of(g):
        t = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            run(g)
            t = min(t, time.perf_counter() - t0)
        return t

    return (best_of(g_hi) - best_of(g_lo)) / (hi - lo)
