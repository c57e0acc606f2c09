"""Train a tiny REAL fixture on the bundled calibration corpus.

Round-4 verdict: every QUALITY.md table ran on random-init fixtures,
whose near-uniform attention and meaningless logits make the deltas hard
to interpret (4bpw top-1 agreement 47% says nothing without a trained
anchor). This trains a 2-layer byte-level llama a few hundred steps on
the bundled corpus (`exllamav2_tpu/convert/standard_cal.py` — the same
text the converter calibrates on; zero-egress, nothing downloaded) and
writes a standard HF-layout fp16 checkpoint that `Model.from_dir` /
`convert_model` consume like any real model.

The trainer differentiates THROUGH the serving stack's own forward
(`models/forward.model_forward`) — the fixture is trained on exactly the
arithmetic it will later be evaluated on.

    python tools/train_fixture.py --out tests/fixtures/trained_tiny \
        [--steps 600] [--seed 7]

Reference analog: none (the reference evaluates on downloaded real
checkpoints, doc/qcache_eval.md:13-34); this is the in-repo stand-in the
environment allows.
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOCAB = 384          # ByteTokenizer range (256 bytes + specials)
HIDDEN = 256
LAYERS = 2
HEADS = 8
KV_HEADS = 4
INTER = 512
# 256-token windows: greedy generation stays on-manifold through the
# positions the evals drive (SEQ=128 training derailed every completion
# past position ~128 — RoPE extrapolation into untrained territory)
SEQ = 256


def corpus_tokens() -> np.ndarray:
    from exllamav2_tpu.convert.standard_cal import STANDARD_CAL_TEXT
    from exllamav2_tpu.tokenizer import ByteTokenizer
    tok = ByteTokenizer(VOCAB)
    return np.asarray(tok.encode(STANDARD_CAL_TEXT), np.int32)


def batches(tokens: np.ndarray, rng: np.random.Generator, batch: int):
    n = len(tokens) - SEQ - 1
    while True:
        idx = rng.integers(0, n, batch)
        yield np.stack([tokens[i:i + SEQ + 1] for i in idx])


def train(steps: int = 1200, batch: int = 8, lr: float = 3e-3,
          seed: int = 7, log=print):
    import jax
    import jax.numpy as jnp
    import optax
    from exllamav2_tpu.cache import KVCache
    from exllamav2_tpu.models.model import Model
    from exllamav2_tpu.models.forward import model_forward
    from exllamav2_tpu.utils.testing import make_tiny_llama
    import tempfile

    init_dir = os.path.join(tempfile.mkdtemp(prefix="train_fix_"), "init")
    make_tiny_llama(init_dir, quant=None, vocab=VOCAB, hidden=HIDDEN,
                    layers=LAYERS, heads=HEADS, kv_heads=KV_HEADS,
                    inter=INTER, max_pos=2048, seed=seed, scale=0.03)
    model = Model.from_dir(init_dir, prescale=False)
    st = model.static
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32) if jnp.issubdtype(
            a.dtype, jnp.floating) else a, model.weights)

    opt = optax.adamw(optax.cosine_decay_schedule(lr, steps, 0.1),
                      weight_decay=0.01)
    opt_state = opt.init(params)

    def loss_fn(w, ids):
        b, t1 = ids.shape
        t = t1 - 1
        cache = KVCache.alloc(st.num_layers, b, SEQ, st.num_kv_heads,
                              st.head_dim)
        logits, _ = model_forward(w, st, ids[:, :-1], cache, jnp.int32(0),
                                  attn_limit=SEQ)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tgt = ids[:, 1:]
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)
        return jnp.mean(nll)

    @jax.jit
    def step(w, opt_state, ids):
        loss, grads = jax.value_and_grad(loss_fn)(w, ids)
        # RoPE tables are positional constants, not parameters
        grads = dataclasses.replace(
            grads, sin=jnp.zeros_like(grads.sin),
            cos=jnp.zeros_like(grads.cos))
        updates, opt_state = opt.update(grads, opt_state, w)
        return optax.apply_updates(w, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    gen = batches(corpus_tokens(), rng, batch)
    for i in range(steps):
        ids = jnp.asarray(next(gen))
        params, opt_state, loss = step(params, opt_state, ids)
        if i % 100 == 0 or i == steps - 1:
            log(f"step {i:4d}  loss {float(loss):.4f}")
    return params, float(loss)


def export(params, out_dir: str, final_loss: float):
    """Write the trained weights as a standard HF-llama fp16 checkpoint."""
    from exllamav2_tpu.stloader import write_safetensors

    os.makedirs(out_dir, exist_ok=True)
    cfg = {
        "architectures": ["LlamaForCausalLM"],
        "hidden_size": HIDDEN, "intermediate_size": INTER,
        "num_hidden_layers": LAYERS, "num_attention_heads": HEADS,
        "num_key_value_heads": KV_HEADS, "vocab_size": VOCAB,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
        "max_position_embeddings": 2048, "tie_word_embeddings": False,
        "bos_token_id": 1, "eos_token_id": 2,
        "_trained_fixture": {"corpus": "exllamav2_tpu/convert/standard_cal.py",
                             "final_loss": round(final_loss, 4),
                             "trainer": "tools/train_fixture.py"},
    }
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(cfg, f, indent=1)

    t: dict[str, np.ndarray] = {}

    def lin(key, dl):
        # DenseLinear stores [in, out]; HF stores [out, in]
        t[key + ".weight"] = np.ascontiguousarray(
            np.asarray(dl.weight, np.float32).T).astype(np.float16)

    t["model.embed_tokens.weight"] = np.asarray(
        params.embed, np.float32).astype(np.float16)
    for l, lw in enumerate(params.layers):
        p = f"model.layers.{l}"
        t[f"{p}.input_layernorm.weight"] = np.asarray(
            lw.attn.norm.weight, np.float32).astype(np.float16)
        lin(f"{p}.self_attn.q_proj", lw.attn.q)
        lin(f"{p}.self_attn.k_proj", lw.attn.k)
        lin(f"{p}.self_attn.v_proj", lw.attn.v)
        lin(f"{p}.self_attn.o_proj", lw.attn.o)
        t[f"{p}.post_attention_layernorm.weight"] = np.asarray(
            lw.mlp.norm.weight, np.float32).astype(np.float16)
        lin(f"{p}.mlp.gate_proj", lw.mlp.gate)
        lin(f"{p}.mlp.up_proj", lw.mlp.up)
        lin(f"{p}.mlp.down_proj", lw.mlp.down)
    t["model.norm.weight"] = np.asarray(
        params.final_norm.weight, np.float32).astype(np.float16)
    lin("lm_head", params.head)
    write_safetensors(os.path.join(out_dir, "model.safetensors"), t)
    return out_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="tests/fixtures/trained_tiny")
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()
    params, loss = train(steps=args.steps, batch=args.batch, lr=args.lr,
                         seed=args.seed)
    out = export(params, args.out, loss)
    print(f"wrote trained fixture to {out} (final loss {loss:.4f}; "
          f"byte-level uniform would be ln(384)={np.log(384):.2f})")


if __name__ == "__main__":
    main()
