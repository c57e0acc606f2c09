"""Convert a fixture checkpoint and serve it end-to-end, asserting greedy
equality across backends (VERDICT r3 item 6: close the "everything is
interpret-mode" gap — the reference's equivalent flow is
test_inference.py: convert, load, generate on the target device).

Flow (one invocation = one leg):
  --prepare DIR   build a tiny fp16 fixture and convert it to EXL2 4bpw
                  (act-order + mixed bitrate via the standard pipeline)
  --serve DIR     load the converted model, serve a batch of greedy jobs
                  through DynamicGenerator with a q4 paged cache, print
                  one JSON line {"backend", "texts", "tokens_per_s"}

Cross-backend greedy equality on an untrained fixture is tie-brittle
(near-flat logits + bf16-MXU vs f32-CPU rounding flips argmax ties), so
the rigorous check mirrors tests/equiv.py: serve greedy on backend A
recording per-step logits (--logits), teacher-force A's tokens through
backend B (--force), then --check asserts per-step logit agreement and
that every A token is argmax-or-tie under B's logits.

tools/r4_tpu_run.sh runs: TPU greedy -> CPU forced replay -> --check.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def prepare(root: str) -> None:
    from exllamav2_tpu.convert.pipeline import convert_model
    from exllamav2_tpu.utils.testing import make_tiny_llama

    dense = os.path.join(root, "dense")
    out = os.path.join(root, "exl2")
    make_tiny_llama(dense, quant=None, vocab=384, hidden=256, layers=2,
                    heads=8, kv_heads=4, inter=512, max_pos=2048, seed=7,
                    head_scale=6.0)
    convert_model(dense, out, bits=4.0, head_bits=6, cal_rows=4,
                  cal_len=128, progress=lambda *a, **k: None)
    print(json.dumps({"prepared": out}), flush=True)


class _ForceTokens:
    """Pin each sampled token to a fixed continuation (filter interface;
    the cross-backend teacher-forcing vehicle, same as tests/equiv.py)."""

    def __init__(self, tokens):
        self.tokens = [int(t) for t in tokens]
        self.i = 0

    def clone(self):
        import copy
        return copy.copy(self)

    def begin(self, prefix_str=""):
        pass

    def feed(self, token):
        self.i += 1

    def next(self):
        if self.i < len(self.tokens):
            return {self.tokens[self.i]}, set()
        return None, set()

    def is_completed(self):
        return False


def serve(model_dir: str, cache_kind: str = "q4", n_jobs: int = 4,
          gen_len: int = 24, logits_out: str | None = None,
          force_from: str | None = None) -> None:
    import numpy as np
    import jax
    from exllamav2_tpu.cache_paged import PagedKVCache
    from exllamav2_tpu.generator.dynamic import DynamicGenerator, DynamicJob
    from exllamav2_tpu.generator.sampler import Settings
    from exllamav2_tpu.models.model import Model
    from exllamav2_tpu.tokenizer import ByteTokenizer

    backend = jax.default_backend()
    model = Model.from_dir(model_dir)
    st = model.static
    cache = PagedKVCache.alloc(st.num_layers, 16, st.num_kv_heads,
                               st.head_dim, cache_kind, page_size=256)
    gen = DynamicGenerator(model, cache, ByteTokenizer(st.vocab_size),
                           max_batch_size=n_jobs)
    prompts = ["the quick brown fox", "tpu serving check",
               "hello world", "quantized cache"][:n_jobs]
    forced = None
    if force_from:
        with open(force_from) as f:
            forced = json.load(f)["token_ids"]
    jobs = []
    for i, p in enumerate(prompts):
        kw = {}
        if logits_out:
            kw["return_logits"] = True
        if forced is not None:
            kw["filters"] = [_ForceTokens(forced[i])]
        jobs.append(gen.enqueue(DynamicJob(
            gen.tokenizer.encode(p), max_new_tokens=gen_len,
            settings=Settings.greedy(), **kw)))
    t0 = time.perf_counter()
    new_tokens = 0
    lgs: dict[int, list] = {i: [] for i in range(n_jobs)}
    toks: dict[int, list] = {i: [] for i in range(n_jobs)}
    by_serial = {id(j): i for i, j in enumerate(jobs)}
    while any(j.status != "done" for j in jobs):
        for r in gen.iterate():
            if r.get("stage") != "streaming":
                continue
            i = by_serial.get(r.get("serial"))
            new_tokens += len(r.get("token_ids", ()))
            if i is None:
                continue
            toks[i].extend(int(t) for t in
                           np.asarray(r.get("token_ids", [])).ravel())
            if r.get("logits") is not None:
                lgs[i].append(np.asarray(r["logits"],
                                         np.float32).ravel())
    dt = time.perf_counter() - t0
    texts = [j.emitted_text.encode("utf-8", "backslashreplace").decode()
             for j in jobs]
    out = {"backend": backend, "cache": cache_kind, "texts": texts,
           "token_ids": [toks[i] for i in range(n_jobs)],
           "tokens_per_s": round(new_tokens / dt, 1)}
    print(json.dumps(out), flush=True)
    if logits_out:
        out["logits"] = [[l.tolist() for l in lgs[i]]
                         for i in range(n_jobs)]
        with open(logits_out, "w") as f:
            json.dump(out, f)


def check(a_path: str, b_path: str, tol: float) -> None:
    """a = greedy run (reference tokens); b = forced replay of a's tokens
    on the other backend. Assert per-step logit agreement within
    tol * |logits|_max (relative: cross-backend drift scales with logit
    magnitude — measured 5.2% worst-step on the q4-cache fixture) and
    argmax-or-tie consistency for every emitted token."""
    import numpy as np
    a = json.load(open(a_path))
    b = json.load(open(b_path))
    assert a["token_ids"] == b["token_ids"], "forced replay token drift"
    worst_rel = 0.0
    worst_gap = 0.0
    steps = 0
    for la_job, lb_job, t_job in zip(a["logits"], b["logits"],
                                     a["token_ids"]):
        assert len(la_job) == len(lb_job) == len(t_job)
        for la, lb, t in zip(la_job, lb_job, t_job):
            la = np.asarray(la)
            lb = np.asarray(lb)
            scale = max(1.0, float(np.abs(la).max()))
            d = float(np.abs(la - lb).max()) / scale
            worst_rel = max(worst_rel, d)
            assert d < tol, \
                f"step {steps}: relative logit delta {d:.4f} >= {tol}"
            # a's greedy choice must be argmax-or-tie under b's logits
            gap = float(lb.max() - lb[t]) / scale
            worst_gap = max(worst_gap, gap)
            assert gap < tol, \
                f"step {steps}: token {t} trails by {gap:.4f} (rel)"
            steps += 1
    print(json.dumps({"checked_steps": steps,
                      "worst_rel_logit_delta": round(worst_rel, 4),
                      "worst_rel_argmax_gap": round(worst_gap, 4),
                      "rel_tol": tol, "ok": True}), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--prepare", metavar="DIR")
    ap.add_argument("--serve", metavar="DIR")
    ap.add_argument("--cache", default="q4")
    ap.add_argument("--logits", metavar="OUT.json")
    ap.add_argument("--force", metavar="IN.json",
                    help="teacher-force token_ids from a prior --logits run")
    ap.add_argument("--check", nargs=2, metavar=("A.json", "B.json"))
    # relative: TPU bf16-MXU vs CPU f32-thunk drift measured 5.2%
    # worst-step on the q4-cache fixture; 8% bounds it with margin while
    # still catching real codec/kernel divergence (order-of-magnitude)
    ap.add_argument("--tol", type=float, default=0.08)
    args = ap.parse_args()
    if args.prepare:
        prepare(args.prepare)
    if args.serve:
        serve(os.path.join(args.serve, "exl2")
              if os.path.isdir(os.path.join(args.serve, "exl2"))
              else args.serve, cache_kind=args.cache,
              logits_out=args.logits, force_from=args.force)
    if args.check:
        check(args.check[0], args.check[1], args.tol)
