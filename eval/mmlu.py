"""MMLU evaluation through the dynamic generator.

Analog of the reference eval/mmlu.py: thousands of 4-option multiple-choice
questions queued as jobs, answered by comparing next-token logits over the
A/B/C/D pieces. Dataset comes from a local HF "datasets" cache or a
directory of csv files (cais/mmlu layout) — this environment has no
network egress.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def format_question(q, choices, answer_idx=None, include_answer=False):
    s = q + "\n"
    for i, c in enumerate(choices):
        s += f"{'ABCD'[i]}. {c}\n"
    s += "Answer:"
    if include_answer:
        s += f" {'ABCD'[answer_idx]}\n\n"
    return s


def load_rows(path: str, subject: str | None):
    """Rows of (question, choices, answer) from csv dir or datasets dir."""
    rows = []
    if os.path.isdir(path):
        import csv
        for fn in sorted(os.listdir(path)):
            if not fn.endswith(".csv"):
                continue
            if subject and subject not in fn:
                continue
            with open(os.path.join(path, fn)) as f:
                for r in csv.reader(f):
                    rows.append((r[0], r[1:5], "ABCD".index(r[5])))
    else:
        from datasets import load_dataset
        ds = load_dataset(path, subject or "all", split="test")
        for r in ds:
            rows.append((r["question"], r["choices"], int(r["answer"])))
    return rows


def main():
    ap = argparse.ArgumentParser()
    from exllamav2_tpu import model_init
    model_init.add_args(ap)
    ap.add_argument("-d", "--dataset", required=True,
                    help="MMLU csv directory or local datasets path")
    ap.add_argument("-sub", "--subject", default=None)
    ap.add_argument("-fs", "--fewshot", type=int, default=5)
    ap.add_argument("-n", "--num_questions", type=int, default=0)
    args = ap.parse_args()

    model, tokenizer, generator = model_init.init(args, max_batch_size=16)
    rows = load_rows(args.dataset, args.subject)
    if args.num_questions:
        rows = rows[:args.num_questions]
    fewshot = "".join(format_question(q, c, a, True)
                      for q, c, a in rows[:args.fewshot])
    eval_rows = rows[args.fewshot:]

    letter_ids = [int(tokenizer.encode(" " + l)[-1]) for l in "ABCD"]

    from exllamav2_tpu.generator.dynamic import DynamicJob
    from exllamav2_tpu.generator.sampler import Settings

    correct = total = 0
    for q, choices, answer in eval_rows:
        prompt = fewshot + format_question(q, choices)
        job = generator.enqueue(DynamicJob(
            tokenizer.encode(prompt), max_new_tokens=1,
            settings=Settings.greedy()))
        while job.status != "done":
            generator.iterate()
        tok = int(job.sequence[-1])
        pred = letter_ids.index(tok) if tok in letter_ids else -1
        correct += int(pred == answer)
        total += 1
        print(f"  {correct}/{total} ({100 * correct / max(total, 1):.2f}%)",
              end="\r")
    print(f"\n -- accuracy: {100 * correct / max(total, 1):.2f}% "
          f"on {total} questions")


if __name__ == "__main__":
    main()
