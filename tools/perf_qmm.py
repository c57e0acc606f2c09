"""Roofline experiments for the fused dequant-matmul kernel.

Measures candidate decode-path kernel designs against the HBM roofline on
the real TPU (the committed record of the perf work VERDICT §5 asked for).
Each variant runs in a subprocess so Mosaic compile crashes don't kill the
sweep.

Shapes mirror Llama2-7B decode: [m=1..8, K] @ [K, N] for the four layer
matmuls. Reported number = effective plane GB/s (quantized bytes / time);
the fp16-model equivalent t/s target needs ~700+ GB/s.

Usage: python tools/perf_qmm.py            # all variants
       python tools/perf_qmm.py <variant>  # one, in-process
"""

import functools
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {}


def variant(fn):
    VARIANTS[fn.__name__] = fn
    return fn


SHAPES = [  # (K, N) of Llama2-7B linears
    (4096, 4096),
    (4096, 11008),
    (11008, 4096),
]
M = 8
BITS = int(os.environ.get("QMM_BITS", 4))
GR = int(os.environ.get("QMM_GROUP", 32))   # 128 = GPTQ-gs128 probe


def _report(name, per_shape):
    """per_shape: list of (qbytes, seconds)."""
    tot_b = sum(b for b, _ in per_shape)
    tot_t = sum(t for _, t in per_shape)
    gbs = tot_b / tot_t / 1e9
    detail = " ".join(f"{b/t/1e9:.0f}" for b, t in per_shape)
    print(f"{name}: {gbs:.0f} GB/s  [{detail}]")


def _mk_inputs(k, n, seed=0):
    import numpy as np
    import jax, jax.numpy as jnp
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 4)
    plane = jax.random.bits(ks[0], (k * BITS // 32, n), jnp.uint32)
    qs = jax.random.randint(ks[1], (k // GR, n), 1, 17, jnp.uint8)
    smax = jax.random.uniform(ks[2], (k // GR, 1), jnp.float32) * 3e-3
    x = jax.random.normal(ks[3], (M, k), jnp.float32)
    return plane, qs, smax, x


def _time(f, x, iters=16384):
    """Single-linear calls are ~20-50us of device work; through the axon
    tunnel the readback noise is tens of ms, so the two-point slope needs
    a large iteration delta (iters/4 .. iters) to resolve above it — 24
    iters (round 3) produced negative slopes."""
    from exllamav2_tpu.utils.timing import device_time
    return device_time(f, x, iters=iters)


@variant
def current():
    """Round-1 fused kernel (u32 planes, f32 FMA dequant, bf16 MXU)."""
    import numpy as np
    import jax.numpy as jnp
    from exllamav2_tpu.utils.testing import random_quant_linear
    from exllamav2_tpu.ops.qmm import qmm
    rng = np.random.default_rng(0)
    rows = []
    for k, n in SHAPES:
        lin = random_quant_linear(rng, k, n, bits=BITS, group_rows=GR)
        x = jnp.ones((M, k), jnp.bfloat16)
        t = _time(lambda x: qmm(x, lin, fused=True).astype(jnp.bfloat16), x)
        qbytes = sum(int(p.size) * 4 for s in lin.segments for p in s.planes)
        rows.append((qbytes, t))
    _report("current", rows)


@variant
def w4a8_prod():
    """Production W4A8 path end-to-end (ops/qmm._w4a8_segment_matmul via
    qmm, incl. in-trace activation quantization). Compare against
    gp_int8 (the isolated-probe form) to localize production overhead."""
    import numpy as np
    import jax.numpy as jnp
    from exllamav2_tpu.utils.testing import random_quant_linear
    from exllamav2_tpu.ops.qmm import qmm
    from exllamav2_tpu.ops.dequant import enable_w4a8_linear
    rng = np.random.default_rng(0)
    rows = []
    for k, n in SHAPES:
        lin = enable_w4a8_linear(
            random_quant_linear(rng, k, n, bits=BITS, group_rows=GR))
        x = jnp.ones((M, k), jnp.float32)
        t = _time(lambda x: qmm(x, lin, fused=True).astype(jnp.bfloat16), x)
        qbytes = sum(int(p.size) * 4 for s in lin.segments for p in s.planes)
        rows.append((qbytes, t))
    _report("w4a8_prod", rows)


@variant
def w4a8_kernel():
    """Production W4A8 kernel only (activation quant pre-done outside
    the timed chain — isolates the pallas kernel from the quant prep)."""
    import numpy as np
    import jax, jax.numpy as jnp
    from exllamav2_tpu.utils.testing import random_quant_linear
    from exllamav2_tpu.ops import qmm as Mq
    from exllamav2_tpu.ops.dequant import enable_w4a8_linear
    rng = np.random.default_rng(0)
    rows = []
    for k, n in SHAPES:
        lin = enable_w4a8_linear(
            random_quant_linear(rng, k, n, bits=BITS, group_rows=GR))
        seg = lin.segments[0]
        x = jnp.ones((M, k), jnp.float32)
        xp = jnp.pad(x, ((0, Mq._M_PAD - M), (0, 0)))
        if seg.rows < seg.rows_pad:
            xp = jnp.pad(xp, ((0, 0), (0, seg.rows_pad - seg.rows)))
        t = _time(lambda xv: Mq._w4a8_segment_matmul(xv, seg)
                  .astype(jnp.bfloat16), xp)
        qbytes = sum(int(p.size) * 4 for p in seg.planes)
        rows.append((qbytes, t))
    _report("w4a8_kernel", rows)


@variant
def dma_only():
    """Ceiling: stream the planes, single reduce per block (no dequant)."""
    import jax, jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows = []
    for k, n in SHAPES:
        plane, qs, smax, x = _mk_inputs(k, n)
        kq = k * BITS // 32
        kt, nt = 512, min(n, 2048)
        if n % nt:
            nt = n // 2

        def kernel(p_ref, o_ref):
            # Mosaic has no uint32->f32 convert; bitcast to int32 first
            v = pltpu.bitcast(p_ref[:], jnp.int32).astype(jnp.float32)
            s = jnp.sum(v, axis=0, keepdims=True)             # [1, nt]
            o_ref[:] = jnp.broadcast_to(s, o_ref.shape)       # [8, nt]

        def f(p):
            return pl.pallas_call(
                kernel,
                grid=(n // nt, kq // kt),
                in_specs=[pl.BlockSpec((kt, nt), lambda i, j: (j, i),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((8, nt), lambda i, j: (0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(p)

        t = _time(f, plane)
        rows.append((plane.size * 4, t))
    _report("dma_only", rows)


def _gp_kernel_factory(mode):
    """Group-partial kernels on the u32 strided-plane layout.

    mode: 'bf16' (no act quant) or 'int8' (pre-quantized activations).
    Grid (n, k); per block: unpack -> per-group batched MXU partials ->
    scale FMA -> accumulate.
    """
    import jax, jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from exllamav2_tpu.ops import dequant as D

    def build(k, n, kt, nt):
        gt = kt // GR

        def kernel(x_ref, p_ref, qs_ref, smax_ref, o_ref):
            s = D.exl2_scales(qs_ref[:], smax_ref[:])        # [gt, nt]
            vals = D.unpack_plane(p_ref[:], BITS)            # [kt, nt] i32
            if mode == "bf16":
                w = (vals - 8).astype(jnp.bfloat16)
                rhs = w.reshape(gt, GR, nt)
                lhs = x_ref[:].reshape(M, gt, GR).transpose(1, 0, 2)
                p = jax.lax.dot_general(
                    lhs, rhs, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)      # [gt, M, nt]
                acc = jnp.sum(p * s[:, None, :], axis=0)
            else:
                w8 = vals.astype(jnp.int8)
                rhs = w8.reshape(gt, GR, nt)
                xq = x_ref[:]
                lhs = xq.reshape(M, gt, GR).transpose(1, 0, 2)
                p = jax.lax.dot_general(
                    lhs, rhs, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.int32)        # [gt, M, nt]
                x1 = jnp.sum(lhs.astype(jnp.float32), axis=2)  # [gt, M]
                pc = p.astype(jnp.float32) - 8.0 * x1[:, :, None]
                acc = jnp.sum(pc * s[:, None, :], axis=0)
            j = pl.program_id(1)

            @pl.when(j == 0)
            def _():
                o_ref[:] = acc

            @pl.when(j != 0)
            def _():
                o_ref[:] = o_ref[:] + acc

        def f(args):
            x, plane, qs, smax = args
            return pl.pallas_call(
                kernel,
                grid=(n // nt, k // kt),
                in_specs=[
                    pl.BlockSpec((M, kt), lambda i, j: (0, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((kt * BITS // 32, nt), lambda i, j: (j, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((gt, nt), lambda i, j: (j, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((gt, 1), lambda i, j: (j, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((M, nt), lambda i, j: (0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((M, n), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(x, plane, qs, smax)

        return f

    return build


def _run_gp(mode, kt=1024, nt=2048):
    import jax.numpy as jnp
    build = _gp_kernel_factory(mode)
    rows = []
    for k, n in SHAPES:
        plane, qs, smax, x = _mk_inputs(k, n)
        ntt = nt if n % nt == 0 else n // 2
        # largest k-tile <= kt that divides k into a whole, 8-divisible
        # number of groups (Mosaic sublane rule on the [gt, nt] scale
        # block); full-K tile otherwise (block == array dim is legal)
        ktt = max((d for d in range(GR, kt + 1, GR)
                   if k % d == 0 and (d // GR) % 8 == 0), default=k)
        f = build(k, n, ktt, ntt)
        if mode == "int8":
            xq = jnp.clip(jnp.round(x * 12), -127, 127).astype(jnp.int8)
            args = (xq, plane, qs, smax)
        else:
            args = (x.astype(jnp.bfloat16), plane, qs, smax)

        def g(p):
            a = (args[0], p, *args[2:])
            return f(a)

        t = _time(g, plane)
        rows.append((plane.size * 4, t))
    _report(f"gp_{mode}_k{kt}_n{nt}", rows)


@variant
def gp_bf16():
    _run_gp("bf16")


@variant
def gp_int8():
    _run_gp("int8")


def _run_nibble(kt0=1024, nt0=2048, dot_mode="batched"):
    """u32 planes, nibble masks + bitcast-to-i8 extraction, int8 MXU
    group partials, zero-correction via one X1 @ s dot.

    dot_mode: 'batched' = one dot_general with group batch dim;
              'full' = single K-wide dot per parity with scales folded
                       post-hoc per group (needs P per group, so n/a) —
              kept for structure experiments.
    """
    import numpy as np
    import jax, jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from exllamav2_tpu.ops import dequant as D

    rows = []
    for k, n in SHAPES:
        plane, qs, smax, x = _mk_inputs(k, n)
        xq = jnp.clip(jnp.round(x * 12), -127, 127).astype(jnp.int8)
        x1 = jnp.sum(xq.reshape(M, k // GR, GR).astype(jnp.float32), axis=2)
        nt = nt0 if n % nt0 == 0 else n // 2
        kt = max((d for d in range(GR, kt0 + 1, GR)
                  if k % d == 0 and (d // GR) % 8 == 0), default=k)
        gt = kt // GR
        kq = kt // 8                              # u32 word rows per block

        def kernel(x_ref, x1_ref, p_ref, qs_ref, smax_ref, o_ref):
            s = D.exl2_scales(qs_ref[:], smax_ref[:])          # [gt, nt]
            w = p_ref[:]                                       # [kq, nt] u32
            lo = pltpu.bitcast(w & jnp.uint32(0x0F0F0F0F), jnp.int8)
            hi = pltpu.bitcast((w >> 4) & jnp.uint32(0x0F0F0F0F), jnp.int8)
            # lo/hi: [kt/2, nt] i8, group-contiguous blocks of GR/2 rows
            rlo = lo.reshape(gt, GR // 2, nt)
            rhi = hi.reshape(gt, GR // 2, nt)
            xh = x_ref[:].reshape(M, gt, 2, GR // 2)
            llo = xh[:, :, 0].transpose(1, 0, 2)               # [gt, M, GR/2]
            lhi = xh[:, :, 1].transpose(1, 0, 2)
            p = jax.lax.dot_general(
                llo, rlo, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)
            p = p + jax.lax.dot_general(
                lhi, rhi, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)
            acc = jnp.sum(p.astype(jnp.float32) * s[:, None, :], axis=0)
            # zero-point correction: z * (X1 @ s), one small MXU dot
            acc = acc - 8.0 * jnp.dot(x1_ref[:], s,
                                      preferred_element_type=jnp.float32)
            j = pl.program_id(1)

            @pl.when(j == 0)
            def _():
                o_ref[:] = acc

            @pl.when(j != 0)
            def _():
                o_ref[:] = o_ref[:] + acc

        def f(p):
            return pl.pallas_call(
                kernel,
                grid=(n // nt, k // kt),
                in_specs=[
                    pl.BlockSpec((M, kt), lambda i, j: (0, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((M, gt), lambda i, j: (0, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((kq, nt), lambda i, j: (j, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((gt, nt), lambda i, j: (j, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((gt, 1), lambda i, j: (j, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((M, nt), lambda i, j: (0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((M, n), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(xq, x1, p, qs, smax)

        t = _time(f, plane)
        rows.append((plane.size * 4, t))
    _report(f"nibble_i8_k{kt0}_n{nt0}", rows)


@variant
def nibble_i8():
    _run_nibble()


@variant
def nibble_i8_k2048():
    _run_nibble(kt0=2048)


@variant
def nibble_i8_n4096():
    _run_nibble(nt0=4096)


def main():
    if len(sys.argv) > 1:
        VARIANTS[sys.argv[1]]()
        return
    for name in VARIANTS:
        r = subprocess.run(
            [sys.executable, __file__, name],
            capture_output=True, text=True, timeout=900)
        out = (r.stdout or "").strip()
        if r.returncode == 0 and out:
            print(out.splitlines()[-1])
        else:
            tail = [l for l in (r.stderr or r.stdout).strip().splitlines()
                    if l.strip()
                    and "For simplicity, JAX has removed" not in l
                    and "Set JAX_TRACEBACK_FILTERING" not in l]
            print(f"{name} -> FAIL: "
                  f"{' | '.join(tail[-2:]) if tail else 'crash'}")


if __name__ == "__main__":
    main()
