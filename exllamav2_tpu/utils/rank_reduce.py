"""Rank reduction of linear weights via truncated SVD (reference
linear.py:527-537 rank_reduce analog): keep the top-k singular
directions of a [K, N] weight, where k = ceil(rank_fraction * min(K,N)).

Used experimentally to test how much of a layer's behavior survives a
low-rank approximation.
"""

from __future__ import annotations

import numpy as np

from exllamav2_tpu.quant.qtensor import DenseLinear, from_dense

__all__ = ["rank_reduce_weight", "rank_reduce_linear", "rank_reduce_model"]


def rank_reduce_weight(w: np.ndarray, fraction: float) -> np.ndarray:
    """[K, N] -> same shape, top ceil(fraction * min(K, N)) singular
    directions kept."""
    assert 0.0 < fraction <= 1.0
    wf = np.asarray(w, np.float32)
    k = int(np.ceil(fraction * min(wf.shape)))
    u, s, vt = np.linalg.svd(wf, full_matrices=False)
    return (u[:, :k] * s[:k]) @ vt[:k]


def rank_reduce_linear(lin, fraction: float):
    """DenseLinear -> rank-reduced DenseLinear (quantized linears must be
    dequantized first; see ops.dequant)."""
    if not isinstance(lin, DenseLinear):
        raise TypeError("rank_reduce_linear expects DenseLinear; "
                        "dequantize QuantLinear weights first")
    w = rank_reduce_weight(np.asarray(lin.weight, np.float32), fraction)
    b = None if lin.bias is None else np.asarray(lin.bias, np.float32)
    return from_dense(w, b)


def rank_reduce_model(weights, fraction: float, which=("mlp",)):
    """Rank-reduce dense mlp and/or attn projections in-place-ish:
    returns a new ModelWeights. Quantized layers are left untouched."""
    import dataclasses

    def maybe(lin):
        if isinstance(lin, DenseLinear):
            return rank_reduce_linear(lin, fraction)
        return lin

    layers = []
    for lw in weights.layers:
        attn, mlp = lw.attn, lw.mlp
        if "attn" in which:
            attn = dataclasses.replace(
                attn, q=maybe(attn.q), k=maybe(attn.k), v=maybe(attn.v),
                o=maybe(attn.o))
        if "mlp" in which and hasattr(mlp, "down"):
            mlp = dataclasses.replace(
                mlp, gate=maybe(mlp.gate) if mlp.gate is not None else None,
                up=maybe(mlp.up), down=maybe(mlp.down))
        layers.append(dataclasses.replace(lw, attn=attn, mlp=mlp))
    return dataclasses.replace(weights, layers=tuple(layers))
