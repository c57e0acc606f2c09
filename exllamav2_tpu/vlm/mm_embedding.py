"""Multimodal embedding container + global token-id allocator.

Analog of the reference's generator/dynamic_embeddings.py:12-104: MM
content (image/video feature rows) gets a unique token-id range starting
at 1e9 so prompts can interleave text ids with embedding ids; the range
uniqueness also makes the paged cache's page hashes distinguish distinct
images (prompt dedup stays correct).
"""

from __future__ import annotations

import numpy as np

__all__ = ["MMEmbedding", "EMBEDDING_INDEX"]

EMBEDDING_INDEX = 1_000_000_000


class _Allocator:
    def __init__(self):
        self.next_index = EMBEDDING_INDEX

    def allocate(self, num_tokens: int) -> int:
        idx = self.next_index
        self.next_index += num_tokens
        # ids must stay int32-safe for the device-side history buffers
        assert self.next_index < 2**31 - 1, "MM token-id space exhausted"
        return idx


global_allocator = _Allocator()


class MMEmbedding:
    """One embedded image/video + metadata (dynamic_embeddings.py:39)."""

    def __init__(self, embeddings, text_alias: str | None = None,
                 thw_grid: tuple | None = None,
                 pre_tokens: int = 0, post_tokens: int = 0):
        import jax.numpy as jnp
        self.embeddings = jnp.asarray(embeddings, jnp.bfloat16)
        self.length = int(self.embeddings.shape[0])
        self.thw_grid = thw_grid
        self.pre_tokens = pre_tokens
        self.post_tokens = post_tokens
        self.metadata: dict = {}
        self.first_index = global_allocator.allocate(self.length)
        self.text_alias = text_alias or f"<$EMB_{self.first_index}$>"

    def get_ids(self) -> list[int]:
        return list(range(self.first_index, self.first_index + self.length))

    def get_ids_array(self) -> np.ndarray:
        return np.arange(self.first_index, self.first_index + self.length,
                         dtype=np.int64)

    def get_vision_token_range(self) -> tuple[int, int]:
        """Id range of the vision rows proper (excluding pre/post text
        marker rows), for MRoPE span detection."""
        return (self.first_index + self.pre_tokens,
                self.first_index + self.length - self.post_tokens)

    def get_size_in_bytes(self) -> int:
        return int(self.embeddings.size) * 2
