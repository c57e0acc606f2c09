"""Reference-table decode sweep (reference README.md:65-75).

Runs bench.py headline-only across the published (geometry, bpw) rows
and prints one JSON line per row plus a final markdown table vs the
4090 numbers. Sequential by design: the axon tunnel serves ONE job at a
time. Run on real TPU hardware:

    python tools/bench_matrix.py [--steps 128] [--rows 7b:3,7b:4,...]
"""

import argparse
import json
import os
import subprocess
import sys

ROWS = [("7b", 3, "exl2"), ("7b", 4, "exl2"), ("7b", 5, "exl2"),
        ("1b", 3, "exl2"), ("1b", 4, "exl2"), ("13b", 4, "exl2"),
        ("7b", 4, "gptq")]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--rows", default=None,
                    help="comma list like 7b:3,1b:4 (default: all)")
    ap.add_argument("--timeout", type=int, default=1200, help="per row, s")
    args = ap.parse_args()
    def _parse(r):
        parts = r.split(":")
        return (parts[0], int(parts[1]),
                parts[2] if len(parts) > 2 else "exl2")

    rows = ([_parse(r) for r in args.rows.split(",")]
            if args.rows else ROWS)

    results = []
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for geom, bits, fmt in rows:
        env = dict(os.environ, BENCH_GEOM=str(geom), BENCH_BITS=str(bits),
                   BENCH_FORMAT=fmt, BENCH_NO_EXTRA="1",
                   BENCH_STEPS=str(args.steps))
        try:
            out = subprocess.run(
                [sys.executable, "-u", os.path.join(repo, "bench.py")],
                env=env, capture_output=True, text=True,
                timeout=args.timeout, cwd=repo)
            lines = [l for l in out.stdout.splitlines()
                     if l.startswith("{")]
            rec = json.loads(lines[-1]) if lines else {
                "metric": f"{geom}:{bits}", "error": out.stderr[-200:]}
        except subprocess.TimeoutExpired:
            rec = {"metric": f"{geom}:{bits}:{fmt}", "error": "timeout"}
        print(json.dumps(rec), flush=True)
        results.append(((geom, bits, fmt), rec))

    print("\n| model | format | bpw | TPU v5e t/s | 4090 t/s | ratio |")
    print("|---|---|---|---|---|---|")
    for (geom, bits, fmt), rec in results:
        v = rec.get("value")
        vb = rec.get("vs_baseline")
        base = (v / vb) if (v and vb) else None
        print(f"| {geom} | {fmt} | {bits}.0 | "
              f"{v if v is not None else 'ERR'} | "
              f"{round(base, 0) if base else '-'} | "
              f"{vb if vb is not None else '-'} |")


if __name__ == "__main__":
    main()
