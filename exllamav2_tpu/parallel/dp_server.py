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

    @property
    def tp_fused(self) -> bool:
        return all(r._tp_fused for r in self.replicas)

    def _pick(self) -> int:
        loads = [len(r.pending) + len(r.active) for r in self.replicas]
        return int(np.argmin(loads))

    def enqueue(self, job):
        return self.replicas[self._pick()].enqueue(job)

    def iterate(self) -> list[dict]:
        results = []
        for r in self.replicas:
            if r.pending or r.active:
                results.extend(r.iterate())
        return results

    def generate(self, prompt, max_new_tokens: int = 128,
                 settings=None, seed: int = 0, stop_conditions=None,
                 add_bos: bool | None = None, completion_only: bool = True,
                 embeddings: list | None = None,
                 encode_special_tokens: bool = False):
        """Batch generate across replicas — same surface and semantics as
        DynamicGenerator.generate (per-prompt seed offset, MM embedding
        splicing, special-token encoding, completion_only)."""
        from exllamav2_tpu.generator.dynamic import DynamicJob

        if add_bos is None:
            cfg = getattr(self.replicas[0].model, "config", None)
            add_bos = bool(cfg is not None
                           and getattr(cfg.arch, "requires_bos", False))
        prompts = prompt if isinstance(prompt, list) else [prompt]
        jobs = []
        for i, p in enumerate(prompts):
            g = self._pick()
            if embeddings and isinstance(p, str):
                ids = self.replicas[g].encode_with_embeddings(
                    p, embeddings, add_bos=add_bos,
                    encode_special_tokens=encode_special_tokens)
            elif isinstance(p, str):
                ids = self.tokenizer.encode(
                    p, add_bos=add_bos,
                    encode_special_tokens=encode_special_tokens)
            else:
                ids = np.asarray(p, np.int32)
            jobs.append(self.replicas[g].enqueue(DynamicJob(
                ids, max_new_tokens=max_new_tokens,
                settings=settings, seed=seed + i,
                stop_conditions=stop_conditions, identifier=i,
                embeddings=embeddings)))
        while any(j.status != "done" for j in jobs):
            self.iterate()
        outs = [j.emitted_text if completion_only
                else (prompts[i] + j.emitted_text)
                for i, j in enumerate(jobs)]
        return outs if isinstance(prompt, list) else outs[0]
