"""Data-parallel serving: independent fused-TP replicas over submeshes.

The reference has no data-parallel serving at all (its TP backend is a
single pinned-host group, ext_tp.cpp). For a TPU pod the natural dp
design is NOT a dp-sharded batch axis inside one program — continuous
batching would force every dp group to lockstep its scheduler (page
allocation, prefill chunking, rewinds) through one jit, serializing the
very thing dp is meant to decouple. Instead, dp replicas are
INDEPENDENT DynamicGenerators, each running the fused shard_map TP
program over its own (1, tp) submesh of the global device grid, with a
host-side dispatcher balancing jobs across replicas. This matches how
XLA treats disjoint device sets (separate executables, zero cross-
replica collectives) and how production serving scales past one TP
group.

    mesh devices [dp * tp] -> dp submeshes of tp devices each
    DataParallelGenerator(model, tokenizer, n_pages, dp=2, tp=4)
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

__all__ = ["DataParallelGenerator"]


class DataParallelGenerator:
    """Dispatcher over dp independent fused-TP DynamicGenerator replicas.

    Exposes the DynamicGenerator surface (enqueue / iterate / generate);
    jobs are routed to the replica with the lightest load (pending +
    active), weights are placed per-submesh (sharded tp-wise inside
    each replica; replicas hold independent copies, as dp demands)."""

    def __init__(self, model, tokenizer, *, num_pages: int, dp: int,
                 tp: int | None = None, devices=None, cache_kind="bf16",
                 page_size: int = 256, **gen_kwargs):
        from exllamav2_tpu.cache_paged import PagedKVCache
        from exllamav2_tpu.generator.dynamic import DynamicGenerator

        devices = list(devices if devices is not None else jax.devices())
        tp = tp or len(devices) // dp
        assert dp * tp <= len(devices), (dp, tp, len(devices))
        self.replicas: list[DynamicGenerator] = []
        for g in range(dp):
            sub = np.asarray(devices[g * tp:(g + 1) * tp]).reshape(1, tp)
            mesh = Mesh(sub, axis_names=("dp", "tp"))
            cache = PagedKVCache.alloc(
                model.static.num_layers, num_pages,
                model.static.num_kv_heads, model.static.head_dim,
                cache_kind, page_size=page_size)
            self.replicas.append(DynamicGenerator(
                model, cache, tokenizer, mesh=mesh, **gen_kwargs))
        self.tokenizer = tokenizer
        self._jobs: dict[int, int] = {}        # id(job) -> replica idx

    @property
    def tp_fused(self) -> bool:
        return all(r._tp_fused for r in self.replicas)

    def _pick(self) -> int:
        loads = [len(r.pending) + len(r.active) for r in self.replicas]
        return int(np.argmin(loads))

    def enqueue(self, job):
        g = self._pick()
        self._jobs[id(job)] = g
        return self.replicas[g].enqueue(job)

    def iterate(self) -> list[dict]:
        results = []
        for r in self.replicas:
            if r.pending or r.active:
                results.extend(r.iterate())
        return results

    def generate(self, prompts, max_new_tokens: int = 128, **kw):
        """Batch generate across replicas (same surface as
        DynamicGenerator.generate)."""
        single = not isinstance(prompts, (list, tuple))
        plist = [prompts] if single else list(prompts)
        outs: dict[int, str] = {}
        jobs = []
        for i, p in enumerate(plist):
            g = self._pick()
            # route through the replica's own generate bookkeeping by
            # enqueueing directly (mirrors DynamicGenerator.generate)
            from exllamav2_tpu.generator.dynamic import DynamicJob
            from exllamav2_tpu.generator.sampler import Settings
            settings = kw.get("settings") or Settings()
            if isinstance(p, str):
                add_bos = kw.get("add_bos")
                if add_bos is None:
                    cfg = getattr(self.replicas[g].model, "config", None)
                    add_bos = bool(getattr(
                        getattr(cfg, "arch", None), "requires_bos", False))
                ids = self.tokenizer.encode(p, add_bos=add_bos)
            else:
                ids = np.asarray(p, np.int32)
            job = DynamicJob(ids, max_new_tokens=max_new_tokens,
                             settings=settings,
                             stop_conditions=kw.get("stop_conditions"))
            job._dp_index = i
            self.replicas[g].enqueue(job)
            jobs.append(job)
        while any(j.status != "done" for j in jobs):
            self.iterate()
        texts = [j.emitted_text for j in jobs]
        return texts[0] if single else texts
