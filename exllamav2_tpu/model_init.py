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


def init(args, max_batch_size: int = 8):
    """-> (model, tokenizer, generator) like model_init.init()."""
    model = Model.from_dir(args.model_dir)
    tokenizer = load_tokenizer(args.model_dir)
    max_len = args.length or model.config.max_seq_len
    pages = max(-(-max_len // 256) * max_batch_size + 1, 8)
    cache = PagedKVCache.alloc(
        model.static.num_layers, pages, model.static.num_kv_heads,
        model.static.head_dim, cache_kind(args))
    from exllamav2_tpu.generator.dynamic import DynamicGenerator
    gen = DynamicGenerator(model, cache, tokenizer,
                           max_batch_size=max_batch_size,
                           max_seq_len=max_len)
    return model, tokenizer, gen
