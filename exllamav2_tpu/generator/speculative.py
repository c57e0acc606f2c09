"""Speculative decoding: n-gram and draft-model drafting.

Analog of the reference's iterate_ngram_gen / iterate_draftmodel_gen
(dynamic.py:1009-1135): draft k tokens cheaply, verify them with ONE
multi-token forward of the main model, accept the matching prefix plus a
bonus token. Rejected-draft KV rows are overwritten by later appends
before any query can attend to them (same invariant as chunked-prefill
padding), so no explicit rollback is needed on the TPU side — only the
host-side kv_position bookkeeping moves (the reference rolls back page
kv_positions explicitly, dynamic.py:1264-1281).

The n-gram drafter is a host-side suffix table over each job's sequence
(NGramTrie analog, dynamic.py:35-51); the draft-model drafter runs k
greedy decode steps of a small model inside one jitted call.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np

__all__ = ["NgramDrafter"]


class NgramDrafter:
    """Per-job n-gram continuation table (reference NGramTrie analog)."""

    def __init__(self, max_n: int = 4):
        self.max_n = max_n
        self.tables = {}       # job id -> {ngram tuple -> Counter}
        self.positions = {}    # job id -> tokens indexed so far

    def reset(self, job_key):
        self.tables.pop(job_key, None)
        self.positions.pop(job_key, None)

    def update(self, job_key, sequence: np.ndarray):
        """Index new tokens of the sequence into the table."""
        tab = self.tables.setdefault(job_key, defaultdict(Counter))
        start = self.positions.get(job_key, 0)
        seq = sequence.tolist()
        lo = max(1, start - self.max_n)
        for i in range(lo, len(seq)):
            for n in range(1, self.max_n):
                if i - n < 0:
                    break
                tab[tuple(seq[i - n:i])][seq[i]] += 1
        self.positions[job_key] = len(seq)

    def draft(self, job_key, sequence: np.ndarray, k: int) -> np.ndarray:
        """Greedily draft up to k continuation tokens (may return fewer)."""
        tab = self.tables.get(job_key)
        if not tab:
            return np.zeros((0,), np.int32)
        seq = sequence.tolist()
        out = []
        for _ in range(k):
            tok = None
            for n in range(self.max_n - 1, 0, -1):
                key = tuple(seq[-n:]) if n <= len(seq) else None
                if key is not None and key in tab:
                    tok = tab[key].most_common(1)[0][0]
                    break
            if tok is None:
                break
            out.append(tok)
            seq.append(tok)
        return np.asarray(out, np.int32)
