"""Multi-host serving emulation: two jax.distributed processes over CPU.

SURVEY §4's testability plan: multi-host logic is CPU-testable by
launching N processes with `jax.distributed.initialize` and a shared
coordinator. Both workers run `make_multihost_mesh` + the full
DynamicGenerator serving stack (fused shard_map path) with tp spanning
the process boundary — the emulated DCN edge — and must agree with each
other and with a single-process run on the same model.

The reference has no multi-host analog (its TP backend is single-host
pinned-host-memory staging, ext_tp.cpp:129-330); this is the repo's
north-star differentiator (BASELINE.json "N-host scaling efficiency").
"""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "multihost_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch(mode: str, num_procs: int = 2, local_devices: int = 2):
    port = _free_port()
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)    # workers never dial the TPU
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)               # worker sets its own count
    # temp files, not PIPEs: workers are drained sequentially, and an
    # undrained worker that fills its pipe buffer would block inside a
    # collective and deadlock the lockstep run until the timeout
    import tempfile
    files, procs = [], []
    for i in range(num_procs):
        fo = tempfile.TemporaryFile(mode="w+")
        fe = tempfile.TemporaryFile(mode="w+")
        files.append((fo, fe))
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, str(i), str(num_procs), str(port),
             str(local_devices), mode],
            stdout=fo, stderr=fe, env=env, cwd=REPO, text=True))
    outs = []
    try:
        for p, (fo, fe) in zip(procs, files):
            try:
                p.wait(timeout=600)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise
            fo.seek(0), fe.seek(0)
            out, err = fo.read(), fe.read()
            assert p.returncode == 0, f"worker failed:\n{err[-4000:]}"
            outs.append(json.loads(out.strip().splitlines()[-1]))
    finally:
        for fo, fe in files:
            fo.close(), fe.close()
    return outs


def _single_process_reference(mode: str):
    """Same model/prompts on this process's local CPU devices (tp=4)."""
    import dataclasses
    from exllamav2_tpu.cache_paged import PagedKVCache
    from exllamav2_tpu.generator.dynamic import DynamicGenerator
    from exllamav2_tpu.generator.sampler import Settings
    from exllamav2_tpu.models.model import Model
    from exllamav2_tpu.parallel.sharding import make_mesh
    from exllamav2_tpu.tokenizer import ByteTokenizer
    from exllamav2_tpu.utils.testing import random_model_weights
    import jax

    cpu = jax.devices("cpu")
    if len(cpu) < 4:
        pytest.skip("needs 4 virtual CPU devices")
    w, st = random_model_weights(
        vocab=512, hidden=256, layers=2, heads=8, kv_heads=4,
        inter=512, max_seq=256, bits=4, seed=7)
    if mode == "gspmd":
        st = dataclasses.replace(st, fused_matmul=False)
    model = Model(w, st)
    mesh = make_mesh(4, dp=1, devices=cpu[:4])
    cache = PagedKVCache.alloc(st.num_layers, 16, st.num_kv_heads,
                               st.head_dim, "bf16", page_size=16)
    gen = DynamicGenerator(model, cache, ByteTokenizer(512), mesh=mesh)
    text = gen.generate("multi host hello", max_new_tokens=8,
                        settings=Settings.greedy())
    cache2 = PagedKVCache.alloc(st.num_layers, 4, st.num_kv_heads,
                                st.head_dim, "bf16", page_size=16)
    gen2 = DynamicGenerator(model, cache2, ByteTokenizer(512), mesh=mesh)
    out2 = gen2.generate("abc", max_new_tokens=4,
                         settings=Settings.greedy())
    return text, out2


@pytest.mark.slow
def test_two_process_fused_serving_agrees():
    """2 hosts x 2 devices, fused shard_map serving: both hosts produce
    identical completions, matching the single-process 4-device run."""
    outs = _launch("fused")
    assert outs[0]["process_count"] == 2
    assert outs[0]["devices"] == 4
    assert outs[0]["text"] == outs[1]["text"], outs
    assert outs[0]["text2"] == outs[1]["text2"], outs
    ref_text, ref2 = _single_process_reference("fused")
    assert outs[0]["text"] == ref_text, (outs[0]["text"], ref_text)
    assert outs[0]["text2"] == ref2, (outs[0]["text2"], ref2)


@pytest.mark.slow
def test_two_process_gspmd_serving_agrees():
    """Same pod emulation through the GSPMD auto-partitioned fallback."""
    outs = _launch("gspmd")
    assert outs[0]["text"] == outs[1]["text"], outs
    ref_text, _ = _single_process_reference("gspmd")
    assert outs[0]["text"] == ref_text, (outs[0]["text"], ref_text)
