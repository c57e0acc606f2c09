"""Lazy-compiled native helpers (C++ via ctypes).

Counterparts of the reference's CPU C++ layer (cpp/generator.cpp string
matching, ext_quant.cpp sim_anneal, ext_stloader.cpp threaded reads).
Compiled on first use with g++; every caller has a Python fallback, so a
missing toolchain degrades gracefully.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["get_lib", "find_first_match", "max_partial_overlap",
           "sim_anneal", "read_file_threaded"]

_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def get_lib():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        src = os.path.join(os.path.dirname(__file__), "native.cpp")
        so = os.path.join(os.path.dirname(__file__), "_native.so")
        try:
            if not os.path.exists(so) or \
                    os.path.getmtime(so) < os.path.getmtime(src):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-pthread", src, "-o", so],
                    check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(so)
            lib.find_first_match.restype = ctypes.c_int64
            lib.max_partial_overlap.restype = ctypes.c_int64
            lib.read_file_threaded.restype = ctypes.c_int64
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def _pack_needles(needles: list[str]):
    offs = [0]
    cps: list[int] = []
    for s in needles:
        cps.extend(ord(c) for c in s)
        offs.append(len(cps))
    arr = np.asarray(cps, np.uint32)
    offsets = np.asarray(offs, np.int64)
    return arr, offsets


def find_first_match(haystack: str, needles: list[str]):
    """-> (pos, needle_idx) of the earliest full match, or (-1, -1)."""
    lib = get_lib()
    if lib is None:
        best = (-1, -1)
        for i, s in enumerate(needles):
            p = haystack.find(s)
            if p >= 0 and (best[0] < 0 or p < best[0]):
                best = (p, i)
        return best
    hay = np.frombuffer(haystack.encode("utf-32-le"), np.uint32)
    nd, offs = _pack_needles(needles)
    r = lib.find_first_match(
        hay.ctypes.data_as(ctypes.c_void_p), len(hay),
        nd.ctypes.data_as(ctypes.c_void_p),
        offs.ctypes.data_as(ctypes.c_void_p), len(needles))
    if r < 0:
        return -1, -1
    return r >> 32, r & 0xFFFFFFFF


def max_partial_overlap(haystack: str, needles: list[str]) -> int:
    """Longest suffix of haystack that prefixes any needle."""
    lib = get_lib()
    if lib is None:
        best = 0
        for s in needles:
            for k in range(min(len(s), len(haystack)), best, -1):
                if haystack.endswith(s[:k]):
                    best = k
                    break
        return best
    hay = np.frombuffer(haystack.encode("utf-32-le"), np.uint32)
    nd, offs = _pack_needles(needles)
    return int(lib.max_partial_overlap(
        hay.ctypes.data_as(ctypes.c_void_p), len(hay),
        nd.ctypes.data_as(ctypes.c_void_p),
        offs.ctypes.data_as(ctypes.c_void_p), len(needles)))


def sim_anneal(slots: list[list[tuple[int, float]]], budget: int,
               iters: int = 20000, seed: int = 0) -> list[int] | None:
    """Native annealer; returns choices or None if lib unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    offs = [0]
    costs: list[int] = []
    errs: list[float] = []
    for sl in slots:
        for c, e in sl:
            costs.append(c)
            errs.append(e)
        offs.append(len(costs))
    offsets = np.asarray(offs, np.int64)
    costs_a = np.asarray(costs, np.int64)
    errs_a = np.asarray(errs, np.float32)
    choice = np.zeros(len(slots), np.int64)
    temp0 = float(max(errs) + 1e-9) if errs else 1.0
    lib.sim_anneal(
        len(slots), offsets.ctypes.data_as(ctypes.c_void_p),
        costs_a.ctypes.data_as(ctypes.c_void_p),
        errs_a.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(budget), ctypes.c_int64(iters),
        ctypes.c_uint64(seed), ctypes.c_float(temp0),
        choice.ctypes.data_as(ctypes.c_void_p))
    return choice.tolist()


def read_file_threaded(path: str, offset: int, size: int,
                       dest: np.ndarray, threads: int = 8) -> int:
    """Read file[offset:offset+size] into dest (uint8); -1 if no lib."""
    lib = get_lib()
    if lib is None:
        return -1
    return int(lib.read_file_threaded(
        path.encode(), ctypes.c_int64(offset), ctypes.c_int64(size),
        dest.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(threads)))
