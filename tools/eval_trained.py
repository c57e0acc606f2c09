"""Committed end-to-end eval-CLI run on the trained fixture.

VERDICT r4 #8: `eval/mmlu.py` / `eval/humaneval.py` had zero recorded
numbers. Real benchmark datasets can't be downloaded here (zero
egress), so this drives both CLIs end-to-end on datasets the trained
fixture (tools/train_fixture.py) can meaningfully answer:

  * HumanEval-style: prompts cut from the corpus code blocks the
    fixture was trained on (quicksort / RingBuffer.push). The model
    memorized the corpus, so greedy completion reproduces working code
    and `--exec` scores a REAL pass@1 — the full sandbox-execute
    scoring path, not a smoke assert.
  * MMLU-style: 4-option questions in the standard A/B/C/D format. The
    byte-level corpus LM has never seen the format, so the honest
    expectation is chance (~25%) — recorded as such; the value of the
    row is the driven pipeline, not the score.

Writes docs/sessions/r5_eval_trained.json.

    python tools/eval_trained.py
"""

from __future__ import annotations

import csv
import io
import json
import os
import runpy
import sys
import tempfile
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIXTURE = os.path.join(REPO, "tests", "fixtures", "trained_tiny")

HUMANEVAL_PROBLEMS = [
    {
        "task_id": "Corpus/quicksort",
        "prompt": "def quicksort(items):\n    if len(items) <= 1:\n",
        "test": ("def check(f):\n"
                 "    assert f([3, 1, 2]) == [1, 2, 3]\n"
                 "    assert f([]) == []\n"
                 "    assert f([5, 5, 1]) == [1, 5, 5]\n"),
        "entry_point": "quicksort",
    },
    {
        # fuller prefix: the three near-identical comprehension lines are
        # the one place greedy decode can legitimately fork; giving them
        # in the prompt leaves the unambiguous tail to complete
        "task_id": "Corpus/quicksort_tail",
        "prompt": ("def quicksort(items):\n"
                   "    if len(items) <= 1:\n        return items\n"
                   "    pivot = items[len(items) // 2]\n"
                   "    left = [x for x in items if x < pivot]\n"
                   "    mid = [x for x in items if x == pivot]\n"),
        "test": ("def check(f):\n"
                 "    assert f([3, 1, 2]) == [1, 2, 3]\n"
                 "    assert f([9, 2, 7, 2]) == [2, 2, 7, 9]\n"),
        "entry_point": "quicksort",
    },
    {
        "task_id": "Corpus/ringbuffer_push",
        "prompt": ("class RingBuffer:\n"
                   "    def __init__(self, capacity: int):\n"
                   "        self.data = [None] * capacity\n"
                   "        self.head = 0\n"
                   "        self.size = 0\n\n"
                   "    def push(self, value):\n"),
        "test": ("def check(cls):\n"
                 "    rb = cls(2)\n"
                 "    rb.push(1); rb.push(2); rb.push(3)\n"
                 "    assert rb.size == 2\n"),
        "entry_point": "RingBuffer",
    },
]

MMLU_ROWS = [
    ["What did the keeper write in the ledger?", "the date", "a poem",
     "a recipe", "nothing", "A"],
    ["How many crates of salt are on the manifest?", "twelve", "forty",
     "seven", "none", "B"],
    ["What does the mitochondrion produce?", "DNA", "chlorophyll",
     "ATP", "keratin", "C"],
    ["What does a transformer layer apply first?", "pooling",
     "self-attention", "dropout", "convolution", "B"],
    ["At what pH were the tracing experiments run?", "7.4", "2.0",
     "11.0", "5.5", "A"],
    ["What increases surface area in the inner membrane?", "villi",
     "axons", "cristae", "alveoli", "C"],
    ["How many bits per value does the example quantization use?",
     "two", "sixteen", "eight", "four", "D"],
    ["What had gone quiet before the fog?", "the bells", "the gulls",
     "the engines", "the dogs", "B"],
]


def run_cli(script, argv):
    old = sys.argv
    sys.argv = [script] + argv
    buf = io.StringIO()
    try:
        with redirect_stdout(buf):
            runpy.run_path(os.path.join(REPO, script), run_name="__main__")
    finally:
        sys.argv = old
    out = buf.getvalue()
    print(out)
    return out


def main():
    assert os.path.exists(os.path.join(FIXTURE, "config.json")), \
        "train the fixture first: python tools/train_fixture.py"
    tmp = tempfile.mkdtemp(prefix="eval_trained_")
    res = {"model": "tests/fixtures/trained_tiny",
           "trainer": "tools/train_fixture.py"}

    he = os.path.join(tmp, "humaneval.jsonl")
    with open(he, "w") as f:
        for p in HUMANEVAL_PROBLEMS:
            f.write(json.dumps(p) + "\n")
    he_out = os.path.join(tmp, "he_out.jsonl")
    out = run_cli("eval/humaneval.py",
                  ["-m", FIXTURE, "-d", he, "-o", he_out,
                   "--max_tokens", "220", "-l", "1024", "--exec"])
    res["humaneval"] = {
        "problems": len(HUMANEVAL_PROBLEMS),
        "stdout_tail": out.strip().splitlines()[-2:],
    }
    for line in out.splitlines():
        if "pass@1" in line:
            res["humaneval"]["pass_at_1"] = line.strip()
    res["humaneval"]["completions"] = [
        json.loads(l) for l in open(he_out).read().splitlines()]

    ds = os.path.join(tmp, "mmlu")
    os.makedirs(ds)
    with open(os.path.join(ds, "corpus_test.csv"), "w", newline="") as f:
        csv.writer(f).writerows(MMLU_ROWS)
    out = run_cli("eval/mmlu.py",
                  ["-m", FIXTURE, "-d", ds, "-fs", "2", "-l", "1024"])
    res["mmlu"] = {"stdout_tail": out.strip().splitlines()[-2:]}
    for line in out.splitlines():
        if "accuracy" in line:
            res["mmlu"]["accuracy_line"] = line.strip()

    dst = os.path.join(REPO, "docs", "sessions", "r5_eval_trained.json")
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    with open(dst, "w") as f:
        json.dump(res, f, indent=1)
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
