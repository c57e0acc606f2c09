"""Native C++ helper tests (with Python-fallback parity)."""

import numpy as np
import pytest

from exllamav2_tpu import native


def test_lib_compiles():
    lib = native.get_lib()
    assert lib is not None, "g++ toolchain should be available here"


def test_find_first_match():
    assert native.find_first_match("hello world", ["world", "lo "]) == (3, 1)
    assert native.find_first_match("abc", ["xyz"]) == (-1, -1)
    assert native.find_first_match("ééç--stop--", ["stop"]) == (5, 0)


def test_max_partial_overlap():
    assert native.max_partial_overlap("abc<st", ["<stop>", "xx"]) == 3
    assert native.max_partial_overlap("abc", ["xyz"]) == 0
    assert native.max_partial_overlap("ab<stop>", ["<stop>"]) == 6


def test_native_matches_python_fallback():
    rng = np.random.default_rng(0)
    import string
    for _ in range(20):
        hay = "".join(rng.choice(list(string.ascii_lowercase), 30))
        needles = ["".join(rng.choice(list(string.ascii_lowercase), 3))
                   for _ in range(4)]
        # python fallback results
        best = (-1, -1)
        for i, s in enumerate(needles):
            p = hay.find(s)
            if p >= 0 and (best[0] < 0 or p < best[0]):
                best = (p, i)
        got = native.find_first_match(hay, needles)
        assert got[0] == best[0]
        pb = 0
        for s in needles:
            for k in range(min(len(s), len(hay)), pb, -1):
                if hay.endswith(s[:k]):
                    pb = k
                    break
        assert native.max_partial_overlap(hay, needles) == pb


def test_sim_anneal_native():
    slots = [[(b * 1000, float(np.exp(-b))) for b in (2, 3, 4, 6, 8)]
             for _ in range(6)]
    choice = native.sim_anneal(slots, budget=6 * 4000)
    assert choice is not None
    cost = sum(slots[i][c][0] for i, c in enumerate(choice))
    assert cost <= 6 * 4000
    assert cost > 6 * 2000


def test_read_file_threaded(tmp_path):
    data = np.random.default_rng(0).integers(
        0, 256, 3 * 1024 * 1024 + 17).astype(np.uint8)
    p = tmp_path / "blob.bin"
    p.write_bytes(data.tobytes())
    dest = np.zeros(len(data) - 100, np.uint8)
    n = native.read_file_threaded(str(p), 100, len(dest), dest, threads=4)
    assert n == len(dest)
    assert (dest == data[100:]).all()
