"""Constrained JSON output via a grammar-engine filter
(reference inference_lmfe.py / inference_formatron.py).

Uses lm-format-enforcer when installed; otherwise falls back to the
built-in CallableFilter with a trivial digits-only grammar so the
example runs everywhere.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exllamav2_tpu.model_init import init, add_args  # noqa: E402
from exllamav2_tpu.generator.dynamic import DynamicJob  # noqa: E402
from exllamav2_tpu.generator.sampler import Settings  # noqa: E402

ap = argparse.ArgumentParser()
add_args(ap)
args = ap.parse_args()

model, tokenizer, generator = init(args)

try:
    from lmformatenforcer import JsonSchemaParser
    from exllamav2_tpu.generator.filters.external import \
        LMFormatEnforcerFilter
    schema = {"type": "object",
              "properties": {"name": {"type": "string"},
                             "age": {"type": "integer"}},
              "required": ["name", "age"]}
    filt = LMFormatEnforcerFilter(tokenizer, JsonSchemaParser(schema))
    print("using lm-format-enforcer")
except ImportError:
    from exllamav2_tpu.generator.filters.external import CallableFilter
    digits = set()
    for t in range(tokenizer.vocab_size):
        p = tokenizer.id_to_piece(t)
        if p and all(c.isdigit() for c in p):
            digits.add(t)

    filt = CallableFilter(tokenizer, lambda fed: digits)
    print("lm-format-enforcer not installed; digits-only fallback")

job = DynamicJob(tokenizer.encode("The answer as JSON: "),
                 max_new_tokens=60, settings=Settings.greedy(),
                 filters=[filt])
generator.enqueue(job)
while job.status != "done":
    for r in generator.iterate():
        if r["stage"] == "streaming":
            print(r.get("text", ""), end="", flush=True)
print()
