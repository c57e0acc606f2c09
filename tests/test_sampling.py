"""Sampler semantics tests (vs hand-computed references and invariants)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from exllamav2_tpu.ops.sampling import SamplingParams, sample, apply_penalties

V = 256
B = 4


def _logits(seed=0, b=B, v=V):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((b, v)) * 3.0, jnp.float32)


def test_greedy_is_argmax():
    lg = _logits(1)
    p = SamplingParams.defaults(B, temperature=0.0)
    tok, prob, _ = sample(jax.random.PRNGKey(0), lg, p)
    assert (np.asarray(tok) == np.argmax(np.asarray(lg), -1)).all()
    assert np.allclose(np.asarray(prob), 1.0, atol=1e-5)


def test_top_k1_is_argmax():
    lg = _logits(2)
    p = SamplingParams.defaults(B, top_k=1, temperature=1.0, top_p=0.0)
    tok, _, _ = sample(jax.random.PRNGKey(3), lg, p)
    assert (np.asarray(tok) == np.argmax(np.asarray(lg), -1)).all()


def test_determinism():
    lg = _logits(3)
    p = SamplingParams.defaults(B)
    t1 = sample(jax.random.PRNGKey(7), lg, p)[0]
    t2 = sample(jax.random.PRNGKey(7), lg, p)[0]
    assert (np.asarray(t1) == np.asarray(t2)).all()


def test_top_k_restricts_support():
    lg = _logits(4, b=1)
    p = SamplingParams.defaults(1, top_k=5, top_p=0.0, temperature=1.5)
    top5 = set(np.argsort(np.asarray(lg)[0])[-5:].tolist())
    for s in range(40):
        tok = sample(jax.random.PRNGKey(s), lg, p)[0]
        assert int(tok[0]) in top5


def test_top_p_restricts_support():
    lg = jnp.asarray(np.log(np.array(
        [[0.5, 0.3, 0.1, 0.06, 0.04] + [1e-9] * (V - 5)])), jnp.float32)
    p = SamplingParams.defaults(1, top_p=0.7, top_k=0, temperature=1.0)
    # exclusive cumsum < 0.7 keeps {0.5, 0.3} (0.3 crosses)
    for s in range(40):
        tok = sample(jax.random.PRNGKey(s), lg, p)[0]
        assert int(tok[0]) in (0, 1)


def test_min_p_restricts_support():
    probs = np.full((1, V), 1e-9)
    probs[0, :4] = [0.6, 0.25, 0.1, 0.05]
    lg = jnp.asarray(np.log(probs), jnp.float32)
    p = SamplingParams.defaults(1, min_p=0.3, top_k=0, top_p=0.0,
                                temperature=1.0)
    # threshold = 0.3 * 0.6 = 0.18 -> {0, 1}
    for s in range(30):
        tok = sample(jax.random.PRNGKey(s), lg, p)[0]
        assert int(tok[0]) in (0, 1)


def test_filter_blocks_tokens():
    lg = _logits(5)
    mask = np.ones((B, V), bool)
    argm = np.argmax(np.asarray(lg), -1)
    mask[np.arange(B), argm] = False
    p = SamplingParams.defaults(B, temperature=0.0)
    tok, _, _ = sample(jax.random.PRNGKey(0), lg, p,
                       logit_filter=jnp.asarray(mask))
    assert (np.asarray(tok) != argm).all()


def test_distribution_roughly_matches():
    """With only temperature, empirical freq ~ softmax (chi-square-ish)."""
    probs = np.array([0.5, 0.3, 0.15, 0.05])
    lg = jnp.asarray(np.log(np.concatenate(
        [probs, np.full(V - 4, 1e-12)]))[None], jnp.float32)
    p = SamplingParams.defaults(1, temperature=1.0, top_k=0, top_p=0.0)
    keys = jax.random.split(jax.random.PRNGKey(0), 600)
    batched = jax.jit(jax.vmap(lambda k: sample(k, lg, p)[0][0]))
    toks = np.asarray(batched(keys))
    freq = np.bincount(toks, minlength=V)[:4] / len(toks)
    assert np.abs(freq - probs).max() < 0.08


def test_mirostat_mu_updates():
    lg = _logits(6)
    p = SamplingParams.defaults(B, mirostat=True, temperature=1.0)
    _, _, mu = sample(jax.random.PRNGKey(1), lg, p)
    assert (np.asarray(mu) != 0.0).all()
    p2 = SamplingParams.defaults(B)
    _, _, mu2 = sample(jax.random.PRNGKey(1), lg, p2)
    assert (np.asarray(mu2) == 0.0).all()   # untouched when disabled


def test_rep_penalty_exact():
    """Multiplicative rep penalty matches hand computation (no decay)."""
    lg = jnp.asarray(np.array([[1.0, -1.0, 2.0, 0.5] + [0.0] * (V - 4)]),
                     jnp.float32)
    seq = jnp.asarray(np.array([[0, 1, 1, 3]]), jnp.int32)
    p = SamplingParams.defaults(1, rep_penalty=2.0)
    out = np.asarray(apply_penalties(lg, seq, jnp.asarray([4]), p))[0]
    assert np.isclose(out[0], 1.0 / 2.0)     # positive -> divide
    assert np.isclose(out[1], -1.0 * 2.0)    # negative -> multiply
    assert np.isclose(out[2], 2.0)           # unseen -> untouched
    assert np.isclose(out[3], 0.5 / 2.0)


def test_freq_pres_penalties():
    lg = jnp.zeros((1, V), jnp.float32)
    seq = jnp.asarray(np.array([[5, 5, 5, 9]]), jnp.int32)
    p = SamplingParams.defaults(1, freq_penalty=0.1, pres_penalty=1.0)
    out = np.asarray(apply_penalties(lg, seq, jnp.asarray([4]), p))[0]
    assert np.isclose(out[5], -1.0 - 3 * 0.1)   # presence + 3x frequency
    assert np.isclose(out[9], -1.0 - 0.1)
    assert np.isclose(out[0], 0.0)


def test_rep_range_limits_window():
    lg = jnp.zeros((1, V), jnp.float32)
    seq = jnp.asarray(np.array([[7, 1, 2, 3]]), jnp.int32)
    p = SamplingParams.defaults(1, pres_penalty=1.0, rep_range=3)
    out = np.asarray(apply_penalties(lg, seq, jnp.asarray([4]), p))[0]
    assert np.isclose(out[7], 0.0)    # outside the window
    assert np.isclose(out[1], -1.0)


def test_xtc_excludes_top_tokens():
    probs = np.full((1, V), 1e-9)
    probs[0, :3] = [0.5, 0.3, 0.2]
    lg = jnp.asarray(np.log(probs), jnp.float32)
    p = SamplingParams.defaults(1, xtc_probability=1.0, xtc_threshold=0.15,
                                temperature=1.0, top_k=0, top_p=0.0)
    # all three cross threshold; with prob 1.0 the top two are excluded,
    # leaving token 2 dominant
    counts = np.zeros(3)
    for s in range(30):
        tok = int(sample(jax.random.PRNGKey(s), lg, p)[0][0])
        if tok < 3:
            counts[tok] += 1
    assert counts[2] > counts[0] and counts[2] > counts[1]


def test_return_top_probs():
    lg = _logits(8)
    p = SamplingParams.defaults(B, temperature=0.0)
    tok, prob, mu, tp, tt = sample(jax.random.PRNGKey(0), lg, p,
                                   return_top=4)
    assert tp.shape == (B, 4) and tt.shape == (B, 4)
    assert (np.asarray(tt)[:, 0] == np.argmax(np.asarray(lg), -1)).all()
