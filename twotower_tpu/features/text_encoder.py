"""Hashed n-gram text encoder for item/user text features.

The reference declares ``transformers>=4.35.0`` and ``max_sequence_length:
512`` but never wires any text encoder (reference: pyproject.toml:27,
configs/data_config.yaml:42; SURVEY.md §2.2 row 29 marks this optional for
metric parity). The TPU-native realization is a **hashed n-gram bag**:
deterministic stable hashing of unigrams+bigrams into a fixed bucket space,
emitted as a static-shape ``[N, max_tokens]`` int32 matrix. On device the
model mean-pools a bucket-embedding lookup over these tokens (an
embedding-bag, deliberately left to XLA's gather+reduce fusion — measured
memory-bound-optimal; see the scope note in ops/pallas_kernels.py).
No vocabulary files, no OOV path, O(1) memory in
corpus size — the right text trade-off for retrieval towers at this scale.
"""

from __future__ import annotations

import hashlib

import numpy as np

PAD_ID = 0  # token id 0 is reserved for padding; buckets are [1, num_buckets)


class HashedNgramEncoder:
    """Deterministic text -> fixed-shape hashed token ids."""

    def __init__(
        self,
        num_buckets: int = 1 << 16,
        max_tokens: int = 32,
        ngrams: tuple[int, ...] = (1, 2),
        seed: int = 42,
    ):
        if num_buckets < 2:
            raise ValueError("num_buckets must be >= 2")
        self.num_buckets = num_buckets
        self.max_tokens = max_tokens
        self.ngrams = ngrams
        self.seed = seed

    def _hash(self, token: str) -> int:
        digest = hashlib.blake2b(
            token.encode("utf-8"), digest_size=8, key=str(self.seed).encode()
        ).digest()
        # [1, num_buckets): keep 0 free for padding.
        return int.from_bytes(digest, "little") % (self.num_buckets - 1) + 1

    def encode_one(self, text: str | None) -> np.ndarray:
        out = np.full(self.max_tokens, PAD_ID, np.int32)
        if not text:
            return out
        words = str(text).lower().split()
        pos = 0
        for n in self.ngrams:
            for i in range(len(words) - n + 1):
                if pos >= self.max_tokens:
                    return out
                out[pos] = self._hash(" ".join(words[i : i + n]))
                pos += 1
        return out

    def encode(self, texts: np.ndarray) -> np.ndarray:
        """``[N]`` object array -> ``[N, max_tokens]`` int32."""
        out = np.empty((len(texts), self.max_tokens), np.int32)
        for i, t in enumerate(texts):
            out[i] = self.encode_one(t)
        return out

    def encode_per_item(
        self,
        item_idx: np.ndarray,
        texts: np.ndarray,
        num_items: int,
        titles: np.ndarray | None = None,
    ) -> np.ndarray:
        """Build the per-item token table ``[num_items, max_tokens]``.

        Each item gets the tokens of its first non-empty text occurrence
        (title preferred when available) — the item-side text feature matrix
        consumed by the candidate tower and the eval corpus encode.
        """
        table = np.full((num_items, self.max_tokens), PAD_ID, np.int32)
        filled = np.zeros(num_items, bool)
        for row in range(len(item_idx)):
            item = int(item_idx[row])
            if item < 0 or item >= num_items or filled[item]:
                continue
            text = None
            if titles is not None and titles[row]:
                text = str(titles[row])
            if texts is not None and texts[row]:
                text = (text + " " if text else "") + str(texts[row])
            if text:
                table[item] = self.encode_one(text)
                filled[item] = True
        return table
