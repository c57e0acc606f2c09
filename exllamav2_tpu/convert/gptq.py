"""Adaptive GPTQ quantization engine (TPU-native).

Re-implementation of the reference's conversion/adaptivegptq.py:

  * AdaptiveQuantizer.find_params (adaptivegptq.py:44-74): per-group
    4-bit sqrt-encoded column scales + p-grid error search
    (cuda/quantize.cu quantize_err);
  * AdaptiveGPTQ: Hessian accumulation (add_batch, adaptivegptq.py:196-225),
    activation-order permutation by Hessian diagonal, damped Cholesky
    factorization with re-damping retries (prepare, adaptivegptq.py:251-333),
    blockwise GPTQ error propagation (quantize, cuda/quantize.cu
    quantize_range semantics), RTN fast path for measurement
    (quantize_rtn, adaptivegptq.py:356-455).

The CUDA kernels become jnp programs: the p-grid search is a vmapped
quantize-error sweep, the per-row GPTQ recursion runs as a lax.fori_loop
over rows inside one jitted per-block call, and the trailing update is a
single MXU matmul — the sequential-but-tiny part stays on device instead
of ping-ponging to host.
"""

from __future__ import annotations

import functools
import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["AdaptiveQuantizer", "AdaptiveGPTQ"]

BLOCK = 128


class AdaptiveQuantizer:
    """Per-group scale search (adaptivegptq.py:20-74)."""

    def __init__(self, bits: int = 4, scale_bits: int = 4,
                 scale_range: float = 1.0, p_grid: int = 48,
                 min_p: float = 0.75, max_p: float = 1.25,
                 norm: float = 2.4):
        self.bits = bits
        self.scale_bits = scale_bits
        self.scale_range = scale_range
        self.maxq = 2 ** bits - 1
        self.qzero = (self.maxq + 1) / 2
        self.scale_maxq = 2 ** scale_bits - 1
        self.p_grid = p_grid
        self.min_p = min_p
        self.max_p = max_p
        self.norm = norm

    def find_params(self, x: jnp.ndarray):
        """x [rows, n] -> (scale f32 [n], qscale i16 [n], qscale_max f32).

        Scale encoding matches the packer: stored qs in [1,16],
        scale = fp16((qs^2) * fp16(qscale_max/256)).
        """
        xmax = jnp.max(jnp.abs(x), axis=0) + 1e-12
        base_scale = xmax / (self.maxq / 2)
        qscale_max = jnp.max(base_scale) * self.scale_range

        scale_tp = jnp.sqrt(base_scale / qscale_max) * (self.scale_maxq + 1)
        qscale = jnp.clip(jnp.round(scale_tp), 1, self.scale_maxq + 1)
        qscale_tw = (qscale / (self.scale_maxq + 1)) ** 2 * qscale_max

        # p-grid search: minimize sum |dq - x|^norm per column
        ps = jnp.linspace(self.min_p, self.max_p, self.p_grid + 1)

        def err_at(p):
            s = qscale_tw * p
            q = jnp.clip(jnp.round(x / s + self.qzero), 0, self.maxq)
            dq = (q - self.qzero) * s
            return jnp.sum(jnp.abs(dq - x) ** self.norm, axis=0)

        errs = jax.vmap(err_at)(ps)                  # [P+1, n]
        best_p = ps[jnp.argmin(jnp.sum(errs, axis=1))]

        qscale_max_p = qscale_max * best_p
        # fp16-rounded final scales (sanity-test parity, adaptivegptq.py:72-74)
        smax16 = (qscale_max_p.astype(jnp.float16) / np.float16(256)
                  ).astype(jnp.float16)
        scale = ((qscale * qscale).astype(jnp.float16) * smax16
                 ).astype(jnp.float32)
        return scale, qscale.astype(jnp.int16), qscale_max_p


class AdaptiveGPTQ:
    """Hessian-aware quantizer for one linear layer (W^T [K, N] f32)."""

    def __init__(self, weights_t: np.ndarray, percdamp: float = 0.12):
        self.w = jnp.asarray(weights_t, jnp.float32)       # [K, N]
        self.rows, self.columns = self.w.shape
        self.percdamp = percdamp
        self.hessian: jnp.ndarray | None = None
        self.num_batches = 0
        self.perm = None
        self.invperm = None
        self.hessian_inv = None

    def add_batch(self, inputs: np.ndarray):
        """inputs [..., K] activations; H += X^T X (adaptivegptq.py:196)."""
        x = jnp.asarray(inputs, jnp.float32).reshape(-1, self.rows)
        h = x.T @ x
        self.hessian = h if self.hessian is None else self.hessian + h
        self.num_batches += 1

    def reuse_h(self, other: "AdaptiveGPTQ"):
        """Share prepared H across q/k/v / gate/up (adaptivegptq.py:605)."""
        self.perm = other.perm
        self.invperm = other.invperm
        self.hessian_inv = other.hessian_inv
        self.w = self.w[self.perm]

    def prepare(self):
        """Act-order sort + damped Cholesky of H^-1 (adaptivegptq.py:251)."""
        if self.hessian is None or self.num_batches == 0:
            h = jnp.eye(self.rows, dtype=jnp.float32)
        else:
            h = self.hessian / self.num_batches
        diag = jnp.diagonal(h)
        self.perm = jnp.argsort(-diag)
        self.invperm = jnp.argsort(self.perm)
        h = h[self.perm][:, self.perm]
        self.w = self.w[self.perm]

        damp = jnp.maximum(self.percdamp * jnp.mean(jnp.diagonal(h)), 1e-5)
        eye = jnp.eye(self.rows, dtype=jnp.float32)
        for attempt in range(10):
            # re-damp on failure (adaptivegptq.py:318-330)
            hd = h + eye * damp * (2.0 ** attempt)
            l = jnp.linalg.cholesky(hd)
            hinv = jax.scipy.linalg.cho_solve((l, True), eye)
            # upper factor U with hinv = U^T U: U = chol(hinv)^T
            u = jnp.linalg.cholesky(hinv).T
            if not bool(jnp.any(jnp.isnan(u))):
                self.hessian_inv = u
                self.hessian = None
                return
        raise ValueError("Hessian is not invertible")

    def quantize(self, bits_groups: list[tuple[int, int, int]],
                 scale_bits: int = 4):
        """Quantize with per-group bit widths.

        bits_groups: list of (bits, row_start, row_end) covering [0, K).
        -> dict with q (uint16 [K, N] permuted order), scale/qscale/
        qscale_max arrays, qgroups-style bit list, dq (f32 [K, N]) and
        the inverse permutation.
        """
        w = self.w
        hinv = self.hessian_inv
        k, n = w.shape
        q_out = np.zeros((k, n), np.uint16)
        dq_out = np.zeros((k, n), np.float32)
        scales, qscales, qscale_maxs, group_bits = [], [], [], []

        w_cur = w
        for (bits, a, b) in bits_groups:
            quantizer = AdaptiveQuantizer(bits=bits, scale_bits=scale_bits)
            grp = w_cur[a:b]
            scale, qscale, qmax = quantizer.find_params(grp)
            scales.append(np.asarray(scale))
            qscales.append(np.asarray(qscale))
            qscale_maxs.append(float(qmax))
            group_bits.append(bits)

            q_blk, dq_blk, w_new = _gptq_quant_range(
                w_cur, hinv, scale, jnp.float32(quantizer.qzero),
                jnp.float32(quantizer.maxq), jnp.int32(a), b - a)
            q_out[a:b] = np.asarray(q_blk, np.uint16)
            dq_out[a:b] = np.asarray(dq_blk)
            w_cur = w_new

        return {
            "q": q_out,
            "dq": dq_out,
            "scale": np.stack(scales),
            "qscale": np.stack(qscales),
            "qscale_max": np.asarray(qscale_maxs, np.float32),
            "bits": group_bits,
            "perm": np.asarray(self.perm, np.int32),
            "invperm": np.asarray(self.invperm, np.int32),
        }

    def quantize_rtn(self, bits_groups: list[tuple[int, int, int]],
                     scale_bits: int = 4) -> np.ndarray:
        """Fast RTN dequant-reconstruction for measurement
        (quantize_rtn_inplace, adaptivegptq.py:356-455). -> dq [K, N] in
        permuted order."""
        dq = np.zeros((self.rows, self.columns), np.float32)
        for (bits, a, b) in bits_groups:
            quantizer = AdaptiveQuantizer(bits=bits, scale_bits=scale_bits,
                                          p_grid=16)
            grp = self.w[a:b]
            scale, _, _ = quantizer.find_params(grp)
            q = jnp.clip(jnp.round(grp / scale + quantizer.qzero),
                         0, quantizer.maxq)
            dq[a:b] = np.asarray((q - quantizer.qzero) * scale)
        return dq


@functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(6,))
def _gptq_quant_range(w, hinv, scale, qzero, maxq, a, blk):
    """GPTQ error-propagating quantization of rows [a, a+blk).

    w [K, N] current (already updated by previous groups); hinv upper
    Cholesky factor of H^-1 (hinv = U^T U). Per row i: quantize, err_i =
    (w_i - dq_i) / U[i, i]; rows j > i inside the group updated
    immediately; rows >= a+blk updated once with a single matmul
    (cuda/quantize.cu quantize_range semantics). `a` is traced so one
    compilation serves every group of the same size.
    """
    k, n = w.shape
    b = a + blk
    hblk = jax.lax.dynamic_slice(hinv, (a, a), (blk, blk))    # [blk, blk]
    wblk = jax.lax.dynamic_slice(w, (a, 0), (blk, n))

    def row(i, carry):
        wb, q, dq, errs = carry
        wi = wb[i]
        qi = jnp.clip(jnp.round(wi / scale + qzero), 0, maxq)
        dqi = (qi - qzero) * scale
        e = (wi - dqi) / hblk[i, i]
        mask = (jnp.arange(blk) > i)[:, None]
        wb = wb - jnp.where(mask, e[None, :] * hblk[i][:, None], 0.0)
        return (wb, q.at[i].set(qi), dq.at[i].set(dqi), errs.at[i].set(e))

    wb, q, dq, errs = jax.lax.fori_loop(
        0, blk, row, (wblk, jnp.zeros_like(wblk), jnp.zeros_like(wblk),
                      jnp.zeros_like(wblk)))

    # trailing update: w[b:] -= U[a:b, b:]^T @ errs (U zero left of a)
    htail = jax.lax.dynamic_slice(hinv, (a, 0), (blk, k))     # [blk, K]
    upd = htail.T @ errs                                      # [K, N]
    row_idx = jnp.arange(k)[:, None]
    w = w - jnp.where(row_idx >= b, upd, 0.0)
    w = jax.lax.dynamic_update_slice(w, dq, (a, 0))
    return q.astype(jnp.uint16), dq, w
