"""Shared CLI argument handling (reference exllamav2/model_init.py analog)."""

from __future__ import annotations

import argparse

from exllamav2_tpu.cache_paged import PagedKVCache
from exllamav2_tpu.models.model import Model
from exllamav2_tpu.tokenizer import load_tokenizer

__all__ = ["add_args", "init"]

CACHE_KINDS = {"": "bf16", "fp16": "bf16", "bf16": "bf16", "q4": "q4",
               "q6": "q6", "q8": "q8", "fp8": "fp8"}


def add_args(parser: argparse.ArgumentParser):
    parser.add_argument("-m", "--model_dir", required=True,
                        help="model directory (safetensors + config.json)")
    parser.add_argument("-l", "--length", type=int, default=None,
                        help="max sequence length")
    parser.add_argument("-cq4", "--cache_q4", action="store_true")
    parser.add_argument("-cq6", "--cache_q6", action="store_true")
    parser.add_argument("-cq8", "--cache_q8", action="store_true")
    parser.add_argument("-c8", "--cache_8bit", action="store_true")
    parser.add_argument("-tp", "--tensor_parallel", type=int, default=0,
                        help="shard serving over this many chips "
                             "(reference -tp; 0 = single chip, -1 = all)")


def cache_kind(args) -> str:
    if getattr(args, "cache_q4", False):
        return "q4"
    if getattr(args, "cache_q6", False):
        return "q6"
    if getattr(args, "cache_q8", False):
        return "q8"
    if getattr(args, "cache_8bit", False):
        return "fp8"
    return "bf16"


def init(args, max_batch_size: int = 8, draft_model_dir: str | None = None,
         num_draft_tokens: int = 4, use_ngram_draft: bool = False,
         mesh=None):
    """-> (model, tokenizer, generator) like model_init.init().

    draft_model_dir / use_ngram_draft enable speculative decoding
    (reference chat.py -dm / -ngram); mesh shards the serving stack
    (built automatically from -tp when not passed explicitly)."""
    tp = getattr(args, "tensor_parallel", 0)
    if mesh is None and tp:
        import jax
        from exllamav2_tpu.parallel.sharding import make_mesh
        n = len(jax.devices()) if tp < 0 else tp
        if n > 1:
            mesh = make_mesh(n, dp=1)
    model = Model.from_dir(args.model_dir)
    tokenizer = load_tokenizer(args.model_dir)
    max_len = args.length or model.config.max_seq_len
    pages = max(-(-max_len // 256) * max_batch_size + 1, 8)
    cache = PagedKVCache.alloc(
        model.static.num_layers, pages, model.static.num_kv_heads,
        model.static.head_dim, cache_kind(args))
    draft_model = draft_cache = None
    if draft_model_dir:
        draft_model = Model.from_dir(draft_model_dir)
        draft_cache = PagedKVCache.alloc(
            draft_model.static.num_layers, pages,
            draft_model.static.num_kv_heads,
            draft_model.static.head_dim, cache_kind(args))
    from exllamav2_tpu.generator.dynamic import DynamicGenerator
    gen = DynamicGenerator(model, cache, tokenizer,
                           max_batch_size=max_batch_size,
                           max_seq_len=max_len,
                           draft_model=draft_model,
                           draft_cache=draft_cache,
                           num_draft_tokens=num_draft_tokens,
                           use_ngram_draft=use_ngram_draft,
                           mesh=mesh)
    return model, tokenizer, gen
