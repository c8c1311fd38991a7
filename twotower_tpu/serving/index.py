"""Retrieval index: the serving-side candidate-search engine.

Replaces the reference's declared FAISS/Annoy ANN layer (reference:
pyproject.toml:38-39, README.md:54 "FAISS/Annoy for approximate nearest
neighbor search") with on-TPU MIPS over the precomputed item-corpus
embeddings (``ops/topk.py``), plus a native C++ CPU fallback index
(``serving/cpu_index.py``) for TPU-less deployments.

Exactness: the DEFAULT ``serving.index_type="tpu_mips"`` dispatches
``lax.approx_max_k`` (recall target 0.95 — the FAISS-equivalent ANN trade);
choose ``tpu_mips_exact`` (two-pass exact MIPS) or ``cpu_flat`` when serving
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
    topk_mips_approx,
    topk_mips_twopass,
)

logger = get_logger(__name__)


class RetrievalIndex:
    """User/query -> top-k item retrieval over a frozen model.

    The item corpus is encoded once at construction (chunked, on device) and
    kept resident; queries run a jitted user-tower -> top-k pipeline.
    Supports id-based queries (known users), embedding-based queries
    (cold-start / external towers), and item-to-item similarity.

    ``mesh``: optional 1-D ``jax.sharding.Mesh`` — row-shards the resident
    corpus and embedding tables over its devices for catalogs past one
    chip's HBM; queries run the cross-shard merge search
    (``ops.topk.topk_mips_*_sharded``). Results match the single-device
    index (the only approximation remains each shard's ANN recall target).
    """

    def __init__(
        self, config: Config, params, num_users: int, num_items: int,
        item_tokens=None, mesh=None,
    ):
        self.config = config
        self.params = params
        self.num_users = num_users
        self.num_items = num_items
        self.mesh = mesh
        self.checkpoint_step: int | None = None  # set by from_checkpoint
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
        num_shards = 1
        if mesh is not None:
            # Mesh serving: corpus row-sharded over a 1-D mesh (catalogs
            # past one chip's HBM — BASELINE configs 4-5). Queries search
            # their local shard and exact-merge k candidates per shard
            # (ops.topk.topk_mips_*_sharded).
            if len(mesh.axis_names) != 1:
                raise ValueError(
                    f"serving mesh must be 1-D, got axes {mesh.axis_names}"
                )
            num_shards = mesh.devices.size
        if mesh is not None:
            # Equal shards, each padded to its local search's copy-free
            # layout (blocked ANN path / chunk-multiple exact path) — the
            # global corpus stays contiguous (row < num_items is real, the
            # pad is one global tail), so the sharded searches' num_items
            # masking is unchanged while no per-request re-pad of a
            # multi-GB shard ever happens inside the jit.
            local = -(-num_items // num_shards)
            local = exact_padded_rows(local) if exact else ann_padded_rows(local)
            padded_rows = local * num_shards
        else:
            # Pad the resident corpus ONCE to the search path's block
            # layout so no jit ever re-pads a multi-GB buffer per request
            # (padding rows are masked via num_valid and never surface).
            padded_rows = (
                exact_padded_rows(num_items) if exact else ann_padded_rows(num_items)
            )

        def _build_fn(p):
            emb = two_tower.embed_item_table(p, mcfg, num_items, item_tokens=tokens)
            emb = jnp.pad(emb, ((0, padded_rows - num_items), (0, 0)))
            if quantized:
                return quantize_corpus(emb, per_row=per_row)
            return emb.astype(corpus_dtype), None

        if mesh is None:
            self.corpus, self.corpus_scale = jax.jit(_build_fn)(params)
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            ax = mesh.axis_names[0]
            # Checkpoint-restored params arrive committed to one device;
            # distribute them over the serving mesh — embedding tables
            # row-sharded (they dominate; GSPMD turns tower gathers into
            # collectives), dense tower weights replicated.
            params = jax.device_put(
                params,
                {
                    name: NamedSharding(
                        mesh, P(ax, None) if name.endswith("_embedding") else P()
                    )
                    for name in params
                },
            )
            self.params = params
            sh_corpus = NamedSharding(mesh, P(ax, None))
            if quantized:
                sh_scale = NamedSharding(mesh, P(ax) if per_row else P())
                build = jax.jit(_build_fn, out_shardings=(sh_corpus, sh_scale))
                self.corpus, self.corpus_scale = build(params)
            else:
                build = jax.jit(lambda p: _build_fn(p)[0], out_shardings=sh_corpus)
                self.corpus, self.corpus_scale = build(params), None
        jax.block_until_ready(self.corpus)
        logger.info(
            "retrieval index ready: %d items (%d padded rows) x %d dims (%s) "
            "on %s%s",
            num_items, padded_rows, self.corpus.shape[1], corpus_dtype.name,
            jax.default_backend(),
            f", {num_shards}-way sharded" if mesh is not None else "",
        )

        # Serving search: approx_max_k ANN by default (the FAISS-equivalent;
        # serving.recall_target), exact scan on request.
        recall = config.serving.recall_target

        if mesh is None:

            def search(emb, corpus, scale, k):
                if exact:
                    # Two-pass exact (block-maxima prefilter + candidate
                    # rescore): 23.6 ms @ B=1 / 132 ms @ B=256 over 10M x 128
                    # on v5e vs 13.3 s for the plain scan (falls back to
                    # the scan internally below ~26k items).
                    return topk_mips_twopass(
                        emb, corpus, k, num_valid=num_items
                    )
                return topk_mips_approx(
                    emb, corpus, k, recall_target=recall, num_valid=num_items,
                    item_scale=scale,
                )

        else:
            from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as P

            from twotower_tpu.ops.topk import (
                topk_mips_approx_sharded,
                topk_mips_sharded,
            )

            ax = mesh.axis_names[0]
            scale_spec = P(ax) if per_row else P()

            def search(emb, corpus, scale, k):
                def body(e, c, s=None):
                    if exact:
                        return topk_mips_sharded(
                            e, c, k, axis_name=ax, num_items=num_items
                        )
                    return topk_mips_approx_sharded(
                        e, c, k, axis_name=ax, recall_target=recall,
                        num_items=num_items, item_scale_shard=s,
                    )

                in_specs = (P(), P(ax, None))
                args = (emb, corpus)
                if scale is not None:
                    in_specs += (scale_spec,)
                    args += (scale,)
                return shard_map(
                    body, mesh=mesh, in_specs=in_specs,
                    out_specs=(P(), P()), check_rep=False,
                )(*args)

        @functools.partial(jax.jit, static_argnames=("k",))
        def _query_users(params, corpus, scale, user_idx, k: int):
            emb = two_tower.embed_users(params, user_idx, mcfg, train=False)
            return search(emb, corpus, scale, k)

        @functools.partial(jax.jit, static_argnames=("k",))
        def _query_emb(corpus, scale, emb, k: int):
            return search(emb, corpus, scale, k)

        @functools.partial(jax.jit, static_argnames=("k",))
        def _query_history(corpus, scale, hist, k: int):
            # Cold-start query: mean-pool the (dequantized) corpus rows of
            # the history items, re-normalize, search. hist is [B, W]
            # padded with -1 (masked out of the pool).
            mask = hist >= 0
            safe = jnp.clip(hist, 0, None)
            rows = corpus[safe].astype(jnp.float32)
            if quantized:
                rows = rows * (scale[safe][..., None] if scale.ndim else scale)
            m = mask.astype(jnp.float32)[..., None]
            pooled = (rows * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1.0)
            norm = jnp.linalg.norm(pooled, axis=-1, keepdims=True)
            emb = pooled / jnp.maximum(norm, 1e-12)
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
        self._query_history = _query_history

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

    def recommend_by_history(
        self, hist_idx: np.ndarray, k: int = 100
    ) -> tuple[np.ndarray, np.ndarray]:
        """Cold-start retrieval from interaction history (no user id).

        ``hist_idx``: ``[B, W]`` item indices padded with ``-1``; each row's
        valid items are mean-pooled in the L2-normalized item-embedding
        space and re-normalized — the item-to-item analogue of a user
        query (the classic fallback for users unseen at training time).
        The width is bucketed up to the next power of two so jit compiles
        O(log max_history) shapes, not one per history length. Rows must
        contain at least one valid item (the service layer validates).
        """
        hist = np.atleast_2d(np.asarray(hist_idx, np.int64))
        if hist.ndim != 2:
            raise ValueError("hist_idx must be [B, W]")
        if (hist >= self.num_items).any():
            raise ValueError("history item_idx out of range")
        w = max(1, 1 << (int(hist.shape[1]) - 1).bit_length())
        if w != hist.shape[1]:
            hist = np.pad(hist, ((0, 0), (0, w - hist.shape[1])), constant_values=-1)
        vals, idx = self._query_history(
            self.corpus, self.corpus_scale, jnp.asarray(hist, jnp.int32), k
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
    def from_checkpoint(
        cls, config: Config, checkpoint_dir: str | Path, mesh=None,
        step: int | None = None,
    ) -> "RetrievalIndex":
        """Load params + vocab from a training checkpoint directory.

        ``step``: specific checkpoint step (default: latest). The restored
        step is recorded as ``index.checkpoint_step`` so the serving layer
        can report which model version is live (and hot-reload to a newer
        one — ``RecommendService.reload``)."""
        from twotower_tpu.data.vocab import VocabPair
        from twotower_tpu.evaluation.evaluate import restore_params

        ckpt_dir = Path(checkpoint_dir)
        vocab = VocabPair.load(ckpt_dir / "vocab")
        num_users, num_items = len(vocab.users), len(vocab.items)
        params, meta = restore_params(config, ckpt_dir, num_users, num_items, step=step)
        item_tokens = None
        tokens_path = ckpt_dir / "item_tokens.npz"
        if tokens_path.exists():
            with np.load(tokens_path) as data:
                item_tokens = data["tokens"]
        index = cls(
            config, params, num_users, num_items, item_tokens=item_tokens,
            mesh=mesh,
        )
        index.vocab = vocab
        index.checkpoint_step = meta.get("step")
        return index
