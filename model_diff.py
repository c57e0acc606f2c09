"""Layer-by-layer activation diff between two models
(reference model_diff.py analog): per-layer MSE / max-err / final KLD.

    python model_diff.py -ma <model_a_dir> -mb <model_b_dir> [-t tokens]
"""

import argparse

import numpy as np
import jax
import jax.numpy as jnp


def hidden_states(model, ids):
    """Per-layer hidden states [L+1, B, T, d] via incremental forward."""
    from exllamav2_tpu.models.forward import (
        _block_forward, norm_apply)
    from exllamav2_tpu.cache import KVCache
    w, st = model.weights, model.static
    cache = KVCache.alloc(st.num_layers, ids.shape[0], ids.shape[1] + 8,
                          st.num_kv_heads, st.head_dim)
    x = jnp.take(w.embed, jnp.asarray(ids), axis=0).astype(jnp.bfloat16)
    pos = jnp.arange(ids.shape[1], dtype=jnp.int32)
    sin = jnp.take(w.sin, pos, axis=0)
    cos = jnp.take(w.cos, pos, axis=0)
    states = [np.asarray(x, np.float32)]
    for layer in range(st.num_layers):
        x, cache = _block_forward(x, w.layers[layer], st, layer, sin, cos,
                                  cache, jnp.int32(0))
        states.append(np.asarray(x, np.float32))
    xn = norm_apply(x, w.final_norm, st)
    from exllamav2_tpu.ops.qmm import linear_apply
    logits = linear_apply(
        xn.reshape(-1, st.hidden_size), w.head).astype(jnp.float32)
    return states, np.asarray(logits)[..., :st.vocab_size]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-ma", "--model_a", required=True)
    ap.add_argument("-mb", "--model_b", required=True)
    ap.add_argument("-t", "--tokens", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from exllamav2_tpu.models.model import Model
    a = Model.from_dir(args.model_a)
    b = Model.from_dir(args.model_b)
    assert a.static.num_layers == b.static.num_layers

    rng = np.random.default_rng(args.seed)
    vocab = min(a.static.vocab_size, b.static.vocab_size)
    ids = rng.integers(0, vocab, (1, args.tokens)).astype(np.int32)

    sa, la = hidden_states(a, ids)
    sb, lb = hidden_states(b, ids)
    print(f"{'layer':>6} {'mse':>12} {'max_err':>12}")
    for i, (x, y) in enumerate(zip(sa, sb)):
        mse = float(np.mean((x - y) ** 2))
        mx = float(np.abs(x - y).max())
        name = "emb" if i == 0 else f"{i - 1}"
        print(f"{name:>6} {mse:>12.6g} {mx:>12.6g}")

    pa = jax.nn.softmax(jnp.asarray(la), axis=-1)
    logq = jax.nn.log_softmax(jnp.asarray(lb), axis=-1)
    logp = jax.nn.log_softmax(jnp.asarray(la), axis=-1)
    kld = float(jnp.mean(jnp.sum(pa * (logp - logq), axis=-1)))
    print(f"\n -- logits KLD(A||B): {kld:.6f}")
    print(f" -- top-1 agreement: "
          f"{float((la.argmax(-1) == lb.argmax(-1)).mean()) * 100:.2f}%")


if __name__ == "__main__":
    main()
