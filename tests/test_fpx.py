"""Experimental FPx emulation (experimental/fpx.py; reference
experimental/fpx.py analog)."""

import numpy as np
import jax.numpy as jnp
import pytest

from exllamav2_tpu.experimental.fpx import fpx_round, fpxify_tensor, fpxify


@pytest.mark.parametrize("ebits,mbits", [(3, 2), (2, 2), (2, 1)])
def test_fpx_round_grid(ebits, mbits):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(4096) * 3, jnp.float32)
    y = np.asarray(fpx_round(x, ebits, mbits))
    y2 = np.asarray(fpx_round(jnp.asarray(y), ebits, mbits))
    # idempotent: every output is exactly representable
    assert np.array_equal(y, y2)
    # error bounded by half the local quantum (or clamp at max normal)
    bias = (1 << (ebits - 1)) - 1
    max_normal = 2.0 ** ((1 << ebits) - 1 - bias) * (2 - 2.0 ** -mbits)
    xa = np.abs(np.asarray(x))
    inside = xa <= max_normal
    q = np.where(xa >= 2.0 ** (1 - bias),
                 2.0 ** (np.floor(np.log2(np.maximum(xa, 1e-30))) - mbits),
                 2.0 ** (1 - bias - mbits))
    err = np.abs(y - np.asarray(x))
    assert (err[inside] <= q[inside] / 2 + 1e-12).all()
    # sign preserved wherever the value didn't round to zero
    nz = y != 0
    assert (np.sign(y[nz]) == np.sign(np.asarray(x)[nz])).all()
    # exact grid values survive untouched
    exact = jnp.asarray([0.0, 1.0, -1.5, 2.0 ** (1 - bias)], jnp.float32)
    assert np.array_equal(np.asarray(fpx_round(exact, ebits, mbits)),
                          np.asarray(exact))


def test_fpxify_model_quality_ordering(tmp_path):
    """fp6_e3m2 emulation perturbs logits far less than fp4_e2m1
    (reference fpxify use case: format-quality studies)."""
    from exllamav2_tpu.models.model import Model
    from exllamav2_tpu.utils.testing import make_tiny_llama

    d = str(tmp_path / "fpx_model")
    make_tiny_llama(d, quant=None, seed=3, vocab=256, hidden=128,
                    layers=2, heads=4, kv_heads=2, inter=256, max_pos=512)
    model = Model.from_dir(d)
    ids = np.array([[3, 17, 200, 9]], np.int32)

    def logits(w):
        m = Model(w, model.static, model.config)
        cache = m.new_cache(batch=1, max_seq=16)
        lg, _ = m.forward(ids, cache, 0)
        return np.asarray(lg, np.float32)

    base = logits(model.weights)
    fp6 = logits(fpxify(model.weights, 3, 2))
    fp4 = logits(fpxify(model.weights, 2, 1))
    e6 = np.abs(fp6 - base).max()
    e4 = np.abs(fp4 - base).max()
    assert 0 < e6 < e4, (e6, e4)
    rel6 = e6 / (np.abs(base).max() + 1e-9)
    assert rel6 < 0.15, rel6
