"""Retrieval index: the serving-side candidate-search engine.

Replaces the reference's declared FAISS/Annoy ANN layer (reference:
pyproject.toml:38-39, README.md:54 "FAISS/Annoy for approximate nearest
neighbor search") with on-TPU MIPS over the precomputed item-corpus
embeddings (``ops/topk.py``), plus a native C++ CPU fallback index
(``serving/cpu_index.py``) for TPU-less deployments.

Exactness: the DEFAULT ``serving.index_type="tpu_mips"`` dispatches
``lax.approx_max_k`` (recall target 0.95 — the FAISS-equivalent ANN trade);
choose ``tpu_mips_exact`` (chunked-scan MIPS) or ``cpu_flat`` when serving
results must match evaluation metrics bit-for-bit. The resident corpus
precision is a further latency/recall dial (``serving.corpus_dtype``):
bfloat16 (auto default), or int8 with a global (``"int8"``) or per-row
(``"int8_rowscale"``) dequantization scale — see docs/serving.md for the
measured v5e latency/recall table.
"""

from __future__ import annotations

import functools
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from twotower_tpu.config import Config
from twotower_tpu.logging_utils import get_logger
from twotower_tpu.models import two_tower
from twotower_tpu.ops.topk import (
    ann_padded_rows,
    exact_padded_rows,
    quantize_corpus,
    topk_mips,
    topk_mips_approx,
)

logger = get_logger(__name__)


class RetrievalIndex:
    """User/query -> top-k item retrieval over a frozen model.

    The item corpus is encoded once at construction (chunked, on device) and
    kept resident; queries run a jitted user-tower -> exact top-k pipeline.
    Supports id-based queries (known users), embedding-based queries
    (cold-start / external towers), and item-to-item similarity.
    """

    def __init__(
        self, config: Config, params, num_users: int, num_items: int,
        item_tokens=None,
    ):
        self.config = config
        self.params = params
        self.num_users = num_users
        self.num_items = num_items
        mcfg = config.model
        tokens = jnp.asarray(item_tokens) if item_tokens is not None else None
        # Resident precision: bf16 under the ANN index halves the HBM
        # stream that dominates large-catalog search; int8 (per-row-scale
        # symmetric quantization) halves it again and runs the score matmul
        # as native s8 x s8 on the MXU (serving.corpus_dtype).
        resolved_dtype = config.serving.resolve_corpus_dtype()
        quantized = resolved_dtype.startswith("int8")
        per_row = resolved_dtype == "int8_rowscale"
        corpus_dtype = jnp.dtype("int8" if quantized else resolved_dtype)
        exact = config.serving.index_type == "tpu_mips_exact"
        # Pad the resident corpus ONCE to the search path's block layout so
        # no jit ever re-pads a multi-GB buffer per request (padding rows
        # are masked via num_valid and never surface).
        padded_rows = (
            exact_padded_rows(num_items) if exact else ann_padded_rows(num_items)
        )

        @jax.jit
        def _build(p):
            emb = two_tower.embed_item_table(p, mcfg, num_items, item_tokens=tokens)
            emb = jnp.pad(emb, ((0, padded_rows - num_items), (0, 0)))
            if quantized:
                return quantize_corpus(emb, per_row=per_row)
            return emb.astype(corpus_dtype), None

        self.corpus, self.corpus_scale = _build(params)
        jax.block_until_ready(self.corpus)
        logger.info(
            "retrieval index ready: %d items (%d padded rows) x %d dims (%s) on %s",
            num_items, padded_rows, self.corpus.shape[1], corpus_dtype.name,
            jax.default_backend(),
        )

        # Serving search: approx_max_k ANN by default (the FAISS-equivalent;
        # serving.recall_target), exact scan on request.
        recall = config.serving.recall_target

        def search(emb, corpus, scale, k):
            if exact:
                return topk_mips(emb, corpus, k, num_valid=num_items)
            return topk_mips_approx(
                emb, corpus, k, recall_target=recall, num_valid=num_items,
                item_scale=scale,
            )

        @functools.partial(jax.jit, static_argnames=("k",))
        def _query_users(params, corpus, scale, user_idx, k: int):
            emb = two_tower.embed_users(params, user_idx, mcfg, train=False)
            return search(emb, corpus, scale, k)

        @functools.partial(jax.jit, static_argnames=("k",))
        def _query_emb(corpus, scale, emb, k: int):
            return search(emb, corpus, scale, k)

        @functools.partial(jax.jit, static_argnames=("k",))
        def _query_items(corpus, scale, item_idx, k: int):
            emb = corpus[item_idx]
            if quantized:
                # Dequantize the query rows; the search path re-quantizes
                # them dynamically (round-trip stable to +-1 LSB).
                emb = emb.astype(jnp.float32)
                emb = emb * (scale[item_idx][:, None] if scale.ndim else scale)
            # k+1: the item itself always ranks first in its own neighborhood
            return search(emb, corpus, scale, k + 1)

        self._query_users = _query_users
        self._query_emb = _query_emb
        self._query_items = _query_items

    # ------------------------------------------------------------------

    def recommend(self, user_idx: np.ndarray, k: int = 100) -> tuple[np.ndarray, np.ndarray]:
        """Top-k items for known users: (scores [B,k], item_idx [B,k])."""
        user_idx = np.atleast_1d(np.asarray(user_idx, np.int32))
        if (user_idx < 0).any() or (user_idx >= self.num_users).any():
            raise ValueError("user_idx out of range")
        vals, idx = self._query_users(
            self.params, self.corpus, self.corpus_scale, jnp.asarray(user_idx), k
        )
        return np.asarray(vals), np.asarray(idx)

    def recommend_by_embedding(self, emb: np.ndarray, k: int = 100):
        """Top-k for externally-computed query embeddings [B, D]."""
        vals, idx = self._query_emb(
            self.corpus, self.corpus_scale, jnp.asarray(emb, jnp.float32), k
        )
        return np.asarray(vals), np.asarray(idx)

    def similar_items(self, item_idx: np.ndarray, k: int = 100):
        """Item-to-item neighbours (self-match removed)."""
        item_idx = np.atleast_1d(np.asarray(item_idx, np.int32))
        if (item_idx < 0).any() or (item_idx >= self.num_items).any():
            raise ValueError("item_idx out of range")
        vals, idx = self._query_items(
            self.corpus, self.corpus_scale, jnp.asarray(item_idx), k
        )
        vals, idx = np.asarray(vals), np.asarray(idx)
        out_v = np.empty((len(item_idx), k), np.float32)
        out_i = np.empty((len(item_idx), k), np.int32)
        for r in range(len(item_idx)):
            mask = idx[r] != item_idx[r]
            out_i[r] = idx[r][mask][:k]
            out_v[r] = vals[r][mask][:k]
        return out_v, out_i

    # ------------------------------------------------------------------

    def export_corpus(self, path: str | Path) -> None:
        """Persist corpus embeddings (npz) for offline/CPU-index serving."""
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        corpus = np.asarray(self.corpus[: self.num_items], np.float32)
        if self.corpus_scale is not None:
            scale = np.asarray(self.corpus_scale)
            corpus *= scale[: self.num_items, None] if scale.ndim else scale
        np.savez_compressed(path, corpus=corpus)
        logger.info("exported corpus embeddings -> %s", path)

    @classmethod
    def from_checkpoint(cls, config: Config, checkpoint_dir: str | Path) -> "RetrievalIndex":
        """Load params + vocab from a training checkpoint directory."""
        from twotower_tpu.data.vocab import VocabPair
        from twotower_tpu.evaluation.evaluate import restore_params

        ckpt_dir = Path(checkpoint_dir)
        vocab = VocabPair.load(ckpt_dir / "vocab")
        num_users, num_items = len(vocab.users), len(vocab.items)
        params, _ = restore_params(config, ckpt_dir, num_users, num_items)
        item_tokens = None
        tokens_path = ckpt_dir / "item_tokens.npz"
        if tokens_path.exists():
            with np.load(tokens_path) as data:
                item_tokens = data["tokens"]
        index = cls(config, params, num_users, num_items, item_tokens=item_tokens)
        index.vocab = vocab
        return index
