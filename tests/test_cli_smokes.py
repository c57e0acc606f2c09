"""End-to-end smokes of the remaining user-facing CLIs (SURVEY §2.6):
model_diff.py and examples/chat.py — real script entry points on
synthetic checkpoints."""

import os
import subprocess
import sys

import pytest as _pytest

pytestmark = _pytest.mark.slow

import pytest

from exllamav2_tpu.utils.testing import make_tiny_llama

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)    # never dial the TPU tunnel
    env["JAX_PLATFORMS"] = "cpu"
    return env


@pytest.fixture(scope="module")
def model_dirs(tmp_path_factory):
    a = tmp_path_factory.mktemp("diff_a")
    b = tmp_path_factory.mktemp("diff_b")
    make_tiny_llama(str(a), quant="exl2", seed=17, vocab=384,
                    heads=8, kv_heads=4)
    make_tiny_llama(str(b), quant=None, seed=17, vocab=384,
                    heads=8, kv_heads=4)
    return str(a), str(b)


def test_model_diff_cli(model_dirs):
    a, b = model_dirs
    out = subprocess.run(
        [sys.executable, "model_diff.py", "-ma", a, "-mb", b,
         "-t", "16"],
        capture_output=True, text=True, timeout=900, cwd=REPO,
        env=_env())
    assert out.returncode == 0, out.stderr[-2000:]
    assert "kld" in out.stdout.lower() or "mse" in out.stdout.lower(), \
        out.stdout[-2000:]


def test_chat_cli_one_turn(model_dirs):
    a, _ = model_dirs
    out = subprocess.run(
        [sys.executable, "examples/chat.py", "-m", a, "-mode", "raw",
         "-l", "512", "-maxr", "8"],
        input="hello\n", capture_output=True, text=True, timeout=900,
        cwd=REPO, env=_env())
    assert out.returncode == 0, out.stderr[-2000:]
    assert "chat ready" in out.stdout, out.stdout[-1000:]
