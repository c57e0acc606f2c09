"""End-to-end smoke of the eval CLIs (SURVEY §2.6: eval/mmlu.py,
eval/humaneval.py) on a synthetic checkpoint + tiny datasets — the
scripts' real main() paths, not reimplementations."""

import csv
import json
import os
import runpy
import sys

import pytest as _pytest

pytestmark = _pytest.mark.slow

import pytest

from exllamav2_tpu.utils.testing import make_tiny_llama

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("evalcli_model")
    make_tiny_llama(str(d), quant="exl2", seed=13, vocab=384,
                    heads=8, kv_heads=4)
    return str(d)


def _run(script, argv, monkeypatch):
    monkeypatch.setattr(sys, "argv", [script] + argv)
    runpy.run_path(os.path.join(REPO, script), run_name="__main__")


def test_mmlu_cli(model_dir, tmp_path, monkeypatch, capsys):
    ds = tmp_path / "mmlu"
    ds.mkdir()
    rows = [["What is 1+1?", "1", "2", "3", "4", "B"],
            ["Color of the sky?", "blue", "red", "green", "pink", "A"],
            ["Opposite of up?", "left", "right", "down", "over", "C"],
            ["How many legs has a dog?", "two", "three", "four", "five",
             "C"]]
    with open(ds / "toy_test.csv", "w", newline="") as f:
        csv.writer(f).writerows(rows)
    _run("eval/mmlu.py",
         ["-m", model_dir, "-d", str(ds), "-fs", "2", "-l", "512"],
         monkeypatch)
    out = capsys.readouterr().out
    assert "accuracy:" in out and "on 2 questions" in out


def test_humaneval_cli(model_dir, tmp_path, monkeypatch, capsys):
    ds = tmp_path / "he.jsonl"
    problem = {
        "task_id": "Toy/0",
        "prompt": "def add(a, b):\n    ",
        "test": "def check(f):\n    assert True\n",
        "entry_point": "add",
    }
    ds.write_text(json.dumps(problem) + "\n")
    out_path = tmp_path / "out.jsonl"
    _run("eval/humaneval.py",
         ["-m", model_dir, "-d", str(ds), "-o", str(out_path),
          "--max_tokens", "8", "-l", "512"],
         monkeypatch)
    recs = [json.loads(l) for l in out_path.read_text().splitlines()]
    assert recs and recs[0]["task_id"] == "Toy/0"
    assert "completion" in recs[0]
    assert "wrote" in capsys.readouterr().out
