"""Probe Mosaic/Pallas support for low-precision ops on this TPU.

Each probe runs in a subprocess so a compiler crash doesn't kill the
harness. Results inform the fused dequant-matmul kernel design
(ops/qmm.py): int8 MXU dots, sub-word bitcasts, int4 dtype support.

Usage: python tools/probe_features.py            # run all probes
       python tools/probe_features.py <name>     # run one (in-process)
"""

import subprocess
import sys

PROBES = {}


def probe(fn):
    PROBES[fn.__name__] = fn
    return fn


@probe
def int8_dot():
    """jnp.dot(int8, int8) -> int32 on the MXU inside pallas."""
    import jax, jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import numpy as np

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.dot(a_ref[:], b_ref[:],
                           preferred_element_type=jnp.int32)

    a = jnp.asarray(np.random.randint(-8, 8, (32, 256), np.int8))
    b = jnp.asarray(np.random.randint(-8, 8, (256, 256), np.int8))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((32, 256), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b)
    ref = np.asarray(a, np.int32) @ np.asarray(b, np.int32)
    assert (np.asarray(out) == ref).all()
    return "exact"


@probe
def int8_dot_batched():
    """Batched per-group int8 dot_general [g,m,k]@[g,k,n]->[g,m,n] i32."""
    import jax, jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import numpy as np

    G, M, K, N = 8, 8, 32, 256

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)

    a = jnp.asarray(np.random.randint(-8, 8, (G, M, K), np.int8))
    b = jnp.asarray(np.random.randint(-8, 8, (G, K, N), np.int8))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((G, M, N), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b)
    ref = np.einsum("gmk,gkn->gmn", np.asarray(a, np.int64),
                    np.asarray(b, np.int64))
    assert (np.asarray(out) == ref).all()
    return "exact"


@probe
def u32_to_int8_cast():
    """u32 (values 0..15) -> int8 conversion chain in pallas."""
    import jax, jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import numpy as np

    def kernel(a_ref, o_ref):
        v = a_ref[:] & jnp.uint32(15)
        o_ref[:] = v.astype(jnp.int32).astype(jnp.int8)

    a = jnp.asarray(np.random.randint(0, 2**31, (256, 256), np.uint32))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((256, 256), jnp.int8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a)
    ref = (np.asarray(a) & 15).astype(np.int8)
    assert (np.asarray(out) == ref).all()
    return "exact"


@probe
def bitcast_u32_u16():
    """pltpu.bitcast u32 -> u16: report resulting shape/semantics."""
    import jax, jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import numpy as np

    shapes = {}

    def kernel(a_ref, o_ref):
        b = pltpu.bitcast(a_ref[:], jnp.uint16)
        shapes["out"] = b.shape
        o_ref[:] = b.astype(jnp.uint32)[:256, :]

    a = jnp.asarray(np.arange(256 * 256, dtype=np.uint32).reshape(256, 256))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((256, 256), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a)
    np.asarray(out)
    return f"shape {shapes.get('out')}"


@probe
def u16_shift_and():
    """Shift/and arithmetic on uint16 vectors (sub-word ALU)."""
    import jax, jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import numpy as np

    def kernel(a_ref, o_ref):
        v = (a_ref[:] >> 4) & jnp.uint16(15)
        o_ref[:] = v

    a = jnp.asarray(np.random.randint(0, 2**16, (256, 256)).astype(np.uint16))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((256, 256), jnp.uint16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a)
    ref = (np.asarray(a) >> 4) & 15
    assert (np.asarray(out) == ref).all()
    return "exact"


@probe
def u8_shift_and():
    """Shift/and arithmetic on uint8 vectors."""
    import jax, jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import numpy as np

    def kernel(a_ref, o_ref):
        v = (a_ref[:] >> 4) & jnp.uint8(15)
        o_ref[:] = v

    a = jnp.asarray(np.random.randint(0, 256, (256, 256)).astype(np.uint8))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((256, 256), jnp.uint8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a)
    ref = (np.asarray(a) >> 4) & 15
    assert (np.asarray(out) == ref).all()
    return "exact"


@probe
def int4_array():
    """jnp.int4 VMEM input + upcast to int8 in pallas."""
    import jax, jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import numpy as np

    def kernel(a_ref, o_ref):
        o_ref[:] = a_ref[:].astype(jnp.int8)

    a = jnp.asarray(np.random.randint(-8, 8, (256, 256)), dtype=jnp.int4)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((256, 256), jnp.int8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a)
    ref = np.asarray(a.astype(jnp.int8))
    assert (np.asarray(out) == ref).all()
    return "exact"


@probe
def int4_dot():
    """jnp.dot with an int4 operand upcast inside the kernel."""
    import jax, jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import numpy as np

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.dot(a_ref[:], b_ref[:].astype(jnp.int8),
                           preferred_element_type=jnp.int32)

    a = jnp.asarray(np.random.randint(-8, 8, (32, 256), np.int8))
    b = jnp.asarray(np.random.randint(-8, 8, (256, 256)), dtype=jnp.int4)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((32, 256), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b)
    ref = np.asarray(a, np.int32) @ np.asarray(b.astype(jnp.int32))
    assert (np.asarray(out) == ref).all()
    return "exact"


@probe
def bf16_dot_bf16_acc_f32():
    """Plain bf16 MXU dot with f32 accum (sanity control)."""
    import jax, jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import numpy as np

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.dot(a_ref[:], b_ref[:],
                           preferred_element_type=jnp.float32)

    a = jnp.asarray(np.random.randn(16, 256), jnp.bfloat16)
    b = jnp.asarray(np.random.randn(256, 256), jnp.bfloat16)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((16, 256), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b)
    assert np.isfinite(np.asarray(out)).all()
    return "ok"


@probe
def bitcast_u32_i8():
    """Nibble extract in u32 lanes -> bitcast to i8: shape + row mapping."""
    import jax, jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import numpy as np

    K, N = 64, 256

    def kernel(w_ref, o_ref):
        lo = w_ref[:] & jnp.uint32(0x0F0F0F0F)
        b = pltpu.bitcast(lo, jnp.int8)          # expect [4K, N]
        o_ref[:] = b

    w = jnp.asarray(np.random.randint(0, 2**31, (K, N)).astype(np.uint32))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((4 * K, N), jnp.int8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(w)
    o = np.asarray(out)
    wh = np.asarray(w)
    # hypothesis A: row r = 4*k + byte j  (little-endian bytes)
    hA = np.zeros((4 * K, N), np.int8)
    for j in range(4):
        hA[np.arange(K) * 4 + j] = ((wh >> (8 * j)) & 0x0F).astype(np.int8)
    # hypothesis B: row r = k + K*j (byte-planes stacked)
    hB = np.zeros((4 * K, N), np.int8)
    for j in range(4):
        hB[np.arange(K) + K * j] = ((wh >> (8 * j)) & 0x0F).astype(np.int8)
    # hypothesis C: within 8-row sublane blocks: r = 32*(k//8)+(k%8)+8*j
    hC = np.zeros((4 * K, N), np.int8)
    for j in range(4):
        hC[(np.arange(K) // 8) * 32 + (np.arange(K) % 8) + 8 * j] = \
            ((wh >> (8 * j)) & 0x0F).astype(np.int8)
    for name, h in (("A", hA), ("B", hB), ("C", hC)):
        if (o == h).all():
            return f"mapping {name}"
    return f"unknown mapping; out[0:9,0]={o[0:9,0].tolist()} w[0,0]={wh[0,0]:#x} w[1,0]={wh[1,0]:#x}"


def main():
    if len(sys.argv) > 1:
        name = sys.argv[1]
        print(name, "->", PROBES[name]())
        return
    for name in PROBES:
        r = subprocess.run(
            [sys.executable, __file__, name],
            capture_output=True, text=True, timeout=300)
        if r.returncode == 0:
            print(r.stdout.strip())
        else:
            tail = (r.stderr or r.stdout).strip().splitlines()
            print(f"{name} -> FAIL: {tail[-1] if tail else 'crash'}")


if __name__ == "__main__":
    main()
