"""``serve-model`` CLI + HTTP serving surface.

Realizes the reference's declared serving layer (reference: pyproject.toml:68
``serve-model = src.serving.api:main``; README.md:42,54 — "FastAPI-based
..." with an 8-12 ms latency target) as a thin HTTP front over the
``RetrievalIndex``: request ids are encoded via the vocab manifest, queries
run the jitted query-tower -> exact top-k path in batches, responses carry
raw item ids + scores.

Engine: aiohttp (available in the base image) by default; a FastAPI app
factory (``create_fastapi_app``) is provided for stacks that have it —
both front the same handler core, which is framework-free and unit-testable.
"""

from __future__ import annotations

import argparse
import asyncio
import functools
import json
import os
import sys
import threading
import time
from typing import Any

import numpy as np

from twotower_tpu.config import Config, load_config_for_checkpoint, parse_cli_overrides
from twotower_tpu.logging_utils import get_logger, setup_logging

logger = get_logger(__name__)


class ServingError(ValueError):
    """Client error (HTTP 400/404)."""

    def __init__(self, message: str, status: int = 400):
        super().__init__(message)
        self.status = status


class ModelSnapshot:
    """One consistent (index, vocab, default_k) view of the live model.

    Every request takes a snapshot ONCE and uses it for validation AND
    execution, so a hot reload racing the request can never validate
    against one catalog and score against another."""

    __slots__ = ("index", "vocab", "default_k")

    def __init__(self, index, vocab, default_k: int):
        self.index = index
        self.vocab = vocab
        self.default_k = default_k


class RecommendService:
    """Framework-free handler core shared by aiohttp and FastAPI fronts."""

    def __init__(
        self, index, vocab, *, default_k: int = 100, max_batch: int = 256,
        index_factory=None, max_exclude: int = 256, max_history: int = 256,
    ):
        self.index = index
        self.vocab = vocab
        self.max_exclude = max_exclude
        self.max_history = max_history
        # Clamp to the catalog: a default wider than the corpus would 400
        # every k-less request on small deployments. Explicit k still
        # validates against the true corpus size.
        self._configured_k = default_k
        self.default_k = max(1, min(default_k, index.num_items))
        self.max_batch = max_batch
        self.started = time.time()
        self._requests = 0
        self._lock = threading.Lock()  # FastAPI front runs handlers on threads
        # Hot reload: ``index_factory(step=None) -> RetrievalIndex`` rebuilds
        # the index from the (possibly newer) checkpoint; ``reloads`` counts
        # successful swaps (surfaced in /health as the model generation).
        # ``_reload_lock`` serializes concurrent reloads on EITHER front
        # (each would otherwise run its own minutes-scale rebuild).
        self._index_factory = index_factory
        self._reload_lock = threading.Lock()
        self.reloads = 0

    @property
    def requests(self) -> int:
        return self._requests

    @property
    def configured_k(self) -> int:
        """The configured default k BEFORE catalog clamping (what
        ``default_k`` becomes after a reload to a large-enough catalog)."""
        return self._configured_k

    def _count_request(self) -> None:
        with self._lock:
            self._requests += 1

    def snapshot(self) -> ModelSnapshot:
        """Consistent per-request view of (index, vocab, default_k)."""
        with self._lock:
            if self.index is None:  # release_first reload in progress/failed
                raise ServingError("model is reloading; retry shortly", status=503)
            return ModelSnapshot(self.index, self.vocab, self.default_k)

    def reload(
        self, step: int | None = None, *, release_first: bool = False,
        pre_swap=None,
    ) -> dict[str, Any]:
        """Swap in a freshly built index (hot model update).

        Default (blue-green): builds the new index FIRST — minutes-scale
        encode for big catalogs, run off the event loop; the old index keeps
        serving — then swaps the reference atomically. Requests snapshot the
        model once (``snapshot``), so in-flight requests finish entirely on
        the model they validated against. NOTE both corpora are device-
        resident during the build: keep 2x corpus HBM headroom, or pass
        ``release_first=True`` to drop the old index before building
        (requests during the rebuild get 503 "model is reloading"; a failed
        rebuild leaves the server 503ing until a reload succeeds — the
        trade for catalogs that fill more than half of HBM).

        The vocab swaps with the index (a retrained model may have new id
        spaces) and the default k re-clamps to the new catalog size.

        ``pre_swap``: optional callable invoked with the NEW index after the
        build but before the atomic swap — the hook for warming jit shapes
        against the new index while the old one still serves (the aiohttp
        front warms its MicroBatcher buckets here, so no live request pays
        a compile in the reload window). A raising hook aborts the swap.
        """
        if self._index_factory is None:
            raise ServingError("server was started without a reloadable checkpoint", 400)
        if step is not None and not isinstance(step, int):
            raise ServingError(f"invalid step: {step!r}")
        with self._reload_lock:
            if release_first:
                with self._lock:
                    self.index = None  # snapshots now 503; old buffers free
            new_index = self._index_factory(step=step)
            if pre_swap is not None:
                pre_swap(new_index)
            with self._lock:
                self.index = new_index
                self.vocab = getattr(new_index, "vocab", self.vocab)
                self.default_k = max(1, min(self._configured_k, new_index.num_items))
                self.reloads += 1
        logger.info(
            "hot-reloaded serving index: step=%s items=%d (generation %d)",
            getattr(new_index, "checkpoint_step", None),
            new_index.num_items, self.reloads,
        )
        return {
            "status": "reloaded",
            "checkpoint_step": getattr(new_index, "checkpoint_step", None),
            "num_items": new_index.num_items,
            "num_users": new_index.num_users,
            "generation": self.reloads,
        }

    # ------------------------------------------------------------------

    @staticmethod
    def _check_payload(payload: Any) -> dict:
        if not isinstance(payload, dict):
            raise ServingError("payload must be a JSON object")
        return payload

    @staticmethod
    def _get_k(payload: dict, default_k: int) -> int:
        try:
            return int(payload.get("k", default_k))
        except (TypeError, ValueError) as e:
            raise ServingError(f"invalid k: {payload.get('k')!r}") from e

    def health(self) -> dict[str, Any]:
        with self._lock:
            index = self.index
        if index is None:
            return {
                "status": "reloading",
                "uptime_s": round(time.time() - self.started, 1),
                "requests": self.requests,
                "model_generation": self.reloads,
            }
        return {
            "status": "ok",
            "uptime_s": round(time.time() - self.started, 1),
            "requests": self.requests,
            "num_users": index.num_users,
            "num_items": index.num_items,
            "checkpoint_step": getattr(index, "checkpoint_step", None),
            "model_generation": self.reloads,
        }

    def _resolve_users(self, payload: dict, snap: ModelSnapshot) -> np.ndarray:
        if "user_idx" in payload:
            try:
                idx = np.atleast_1d(np.asarray(payload["user_idx"], np.int64))
            except (TypeError, ValueError) as e:
                raise ServingError("user_idx must be integers") from e
        elif "user_id" in payload:
            ids = payload["user_id"]
            ids = [ids] if isinstance(ids, str) else list(ids)
            idx = snap.vocab.users.encode(np.asarray(ids, object))
            unknown = [i for i, v in zip(ids, idx) if v < 0]
            if unknown:
                raise ServingError(f"unknown user ids: {unknown[:5]}", status=404)
            idx = idx.astype(np.int64)
        else:
            raise ServingError("payload must contain user_id or user_idx")
        if len(idx) == 0:
            raise ServingError("user batch must be non-empty")
        if len(idx) > self.max_batch:
            raise ServingError(f"batch too large: {len(idx)} > {self.max_batch}")
        if (idx < 0).any() or (idx >= snap.index.num_users).any():
            raise ServingError("user_idx out of range", status=404)
        return idx.astype(np.int32)

    def _resolve_exclude(self, payload: dict, snap: ModelSnapshot) -> np.ndarray:
        """Items to filter from results: ``exclude_idx`` (indices, strict)
        and/or ``exclude`` (external item ids; unknown ids are a no-op —
        excluding a retired item must not fail the request)."""
        parts = []
        if "exclude_idx" in payload:
            try:
                idx = np.atleast_1d(np.asarray(payload["exclude_idx"], np.int64))
            except (TypeError, ValueError) as e:
                raise ServingError("exclude_idx must be integers") from e
            if len(idx) and ((idx < 0).any() or (idx >= snap.index.num_items).any()):
                raise ServingError("exclude_idx out of range", status=404)
            parts.append(idx)
        if "exclude" in payload:
            ids = payload["exclude"]
            ids = [ids] if isinstance(ids, str) else list(ids)
            if ids:
                enc = snap.vocab.items.encode(np.asarray(ids, object)).astype(np.int64)
                parts.append(enc[enc >= 0])  # unknown ids: no-op
        if not parts:
            return np.empty(0, np.int32)
        excl = np.unique(np.concatenate(parts)).astype(np.int32)
        if len(excl) > self.max_exclude:
            raise ServingError(
                f"exclusion list too large: {len(excl)} > {self.max_exclude} "
                "(serving.max_exclude)"
            )
        return excl

    @staticmethod
    def search_depth(k: int, num_excluded: int, num_items: int) -> int:
        """Device-search k covering the worst case where every excluded id
        ranks above the k-th survivor.

        Round-5 p99 fix: exclusion-bearing requests used to bucket the
        depth to multiples of 32, producing up to ~(max_exclude/32)
        DISTINCT jit shapes per batch bucket that startup warmup never
        compiled — measured as second-scale p99 outliers on the real chip
        (1616 ms at c=32, benchmarks/results/serving_http_tpu_r4.jsonl:
        every outlier was a live-traffic compile). Now ANY exclusion
        snaps the depth to the power of two covering ``k + num_excluded``
        — at most ~2 depths per family in practice, all pre-compiled by
        ``MicroBatcher.warmup(ks=...)``/``warm_depths``. The plain
        (no-exclusion) path stays exactly ``k`` (the default warmed
        shape); extra depth only costs the search O(k) work and the
        filter truncates back to ``k``.
        """
        if num_excluded == 0:
            return k
        need = k + num_excluded
        return min(1 << (need - 1).bit_length(), num_items)

    def warm_depths(self, route: str, k: int, num_items: int) -> tuple[int, ...]:
        """Every search depth ``route`` can hit at default ``k``: the
        no-exclusion fast path plus the power-of-two ladder up to the
        route's worst-case exclusion count (max_exclude for /recommend,
        plus max_history seen-item exclusions for /recommend_by_history).
        The warmup compiles these per bucket so live traffic never
        compiles; a request with k above the default still compiles
        lazily (documented)."""
        cap = self.max_exclude
        if route == "recommend_by_history":
            cap += self.max_history
        depths = {k}
        e = 1
        while e <= cap:
            depths.add(self.search_depth(k, e, num_items))
            e *= 2
        depths.add(self.search_depth(k, cap, num_items))
        return tuple(sorted(depths))

    @staticmethod
    def filter_excluded(scores, items, exclude, k: int):
        """Drop excluded ids per row and truncate to k.

        ``exclude``: one shared [E] array, or a per-row list of arrays
        (history-seen filtering). Rows may come back shorter than k only
        when k + exclusions exceeded the catalog. Returns row lists."""
        out_s, out_i = [], []
        for r, (row_s, row_i) in enumerate(zip(scores, items)):
            e = exclude[r] if isinstance(exclude, list) else exclude
            if len(e):
                mask = ~np.isin(row_i, e)
                row_s, row_i = row_s[mask], row_i[mask]
            out_s.append(row_s[:k])
            out_i.append(row_i[:k])
        return out_s, out_i

    def prepare_recommend(
        self, payload: dict
    ) -> tuple[np.ndarray, int, np.ndarray, ModelSnapshot]:
        """Validate a /recommend payload -> (user_idx [B], k, exclude [E],
        snapshot). Raises ServingError on client mistakes; counts the
        request. The returned snapshot is the model the request validated
        against — run the search on IT, not on self.index (a reload may
        swap mid-flight)."""
        self._count_request()
        payload = self._check_payload(payload)
        snap = self.snapshot()
        k = self._get_k(payload, snap.default_k)
        if not 1 <= k <= snap.index.num_items:
            raise ServingError(f"k must be in [1, {snap.index.num_items}]")
        exclude = self._resolve_exclude(payload, snap)
        return self._resolve_users(payload, snap), k, exclude, snap

    @staticmethod
    def format_recommend(
        user_idx: np.ndarray, scores: np.ndarray, items: np.ndarray,
        k: int, latency_ms: float, vocab,
    ) -> dict[str, Any]:
        return {
            "results": [
                {
                    "user_idx": int(u),
                    "items": vocab.items.decode(row_i).tolist(),
                    "item_idx": row_i.tolist(),
                    "scores": [round(float(s), 6) for s in row_s],
                }
                for u, row_i, row_s in zip(user_idx, items, scores)
            ],
            "k": k,
            "latency_ms": round(latency_ms, 3),
        }

    def recommend(self, payload: dict) -> dict[str, Any]:
        """POST /recommend — {user_id|user_idx, k?, exclude?|exclude_idx?}
        -> ranked items, with the excluded (already-seen/blocked) items
        filtered out.

        Synchronous path (FastAPI front, unit tests, library callers); the
        aiohttp front routes through ``MicroBatcher`` instead so concurrent
        requests share device calls."""
        user_idx, k, exclude, snap = self.prepare_recommend(payload)
        t0 = time.perf_counter()
        scores, items = snap.index.recommend(
            user_idx, self.search_depth(k, len(exclude), snap.index.num_items)
        )
        scores, items = self.filter_excluded(scores, items, exclude, k)
        latency_ms = (time.perf_counter() - t0) * 1000
        return self.format_recommend(user_idx, scores, items, k, latency_ms, snap.vocab)

    def _resolve_history(
        self, payload: dict, snap: ModelSnapshot
    ) -> list[np.ndarray]:
        """Parse {history_idx|history} into per-row index arrays. A flat
        list is one query row; a list of lists is a batch."""
        def nested(v):
            return isinstance(v, (list, tuple)) and (
                len(v) == 0 or isinstance(v[0], (list, tuple, np.ndarray))
            )

        if "history_idx" in payload:
            raw = payload["history_idx"]
            rows_in = raw if nested(raw) else [raw]
            rows = []
            for row in rows_in:
                try:
                    idx = np.atleast_1d(np.asarray(row, np.int64))
                except (TypeError, ValueError) as e:
                    raise ServingError("history_idx must be integers") from e
                if len(idx) and ((idx < 0).any() or (idx >= snap.index.num_items).any()):
                    raise ServingError("history_idx out of range", status=404)
                rows.append(idx)
        elif "history" in payload:
            raw = payload["history"]
            rows_in = raw if nested(raw) else [raw]
            rows = []
            for row in rows_in:
                ids = [row] if isinstance(row, str) else list(row)
                enc = snap.vocab.items.encode(np.asarray(ids, object)).astype(np.int64)
                rows.append(enc[enc >= 0])  # unknown ids dropped from the pool
        else:
            raise ServingError("payload must contain history or history_idx")
        if not rows:
            raise ServingError("history batch must be non-empty")
        if len(rows) > self.max_batch:
            raise ServingError(f"batch too large: {len(rows)} > {self.max_batch}")
        for row in rows:
            if len(row) == 0:
                raise ServingError(
                    "each history row needs at least one known item", status=404
                )
            if len(row) > self.max_history:
                raise ServingError(
                    f"history too long: {len(row)} > {self.max_history} "
                    "(serving.max_history)"
                )
        return rows

    def prepare_history(
        self, payload: dict
    ) -> tuple[np.ndarray, list, int, int, ModelSnapshot]:
        """Validation half of /recommend_by_history: returns
        ``(hist [N,W] padded -1, per_row_exclude, k, search_depth, snap)``
        so the coalesced front can share the device call."""
        self._count_request()
        payload = self._check_payload(payload)
        snap = self.snapshot()
        k = self._get_k(payload, snap.default_k)
        if not 1 <= k <= snap.index.num_items:
            raise ServingError(f"k must be in [1, {snap.index.num_items}]")
        rows = self._resolve_history(payload, snap)
        exclude = self._resolve_exclude(payload, snap)
        exclude_seen = bool(payload.get("exclude_seen", True))
        width = max(len(r) for r in rows)
        hist = np.full((len(rows), width), -1, np.int64)
        for r, row in enumerate(rows):
            hist[r, : len(row)] = row
        per_row = [
            np.union1d(exclude, row) if exclude_seen else exclude for row in rows
        ]
        depth = self.search_depth(
            k, max(len(e) for e in per_row), snap.index.num_items
        ) if any(len(e) for e in per_row) else k
        return hist, per_row, k, depth, snap

    def format_history(
        self, scores, items, per_row, k: int, latency_ms: float, vocab
    ) -> dict[str, Any]:
        """Response half of /recommend_by_history (post-search filter +
        encode)."""
        scores, items = self.filter_excluded(scores, items, per_row, k)
        return {
            "results": [
                {
                    "items": vocab.items.decode(np.asarray(row_i)).tolist(),
                    "item_idx": np.asarray(row_i).tolist(),
                    "scores": [round(float(s), 6) for s in row_s],
                }
                for row_i, row_s in zip(items, scores)
            ],
            "k": k,
            "latency_ms": round(latency_ms, 3),
        }

    def recommend_by_history(self, payload: dict) -> dict[str, Any]:
        """POST /recommend_by_history — {history|history_idx, k?,
        exclude?|exclude_idx?, exclude_seen?=true} -> ranked items.

        Cold-start retrieval for users unseen at training time: each row's
        query is the re-normalized mean of its history items' corpus
        embeddings (``RetrievalIndex.recommend_by_history``). By default
        the history items themselves are filtered from the results.

        Synchronous path (FastAPI front, unit tests, library callers); the
        aiohttp front coalesces concurrent calls through a MicroBatcher."""
        hist, per_row, k, depth, snap = self.prepare_history(payload)
        t0 = time.perf_counter()
        scores, items = snap.index.recommend_by_history(hist, depth)
        latency_ms = (time.perf_counter() - t0) * 1000
        return self.format_history(scores, items, per_row, k, latency_ms, snap.vocab)

    def prepare_similar(
        self, payload: dict
    ) -> tuple[np.ndarray, int, ModelSnapshot]:
        """Validation half of /similar_items: ``(item_idx, k, snap)``."""
        self._count_request()
        payload = self._check_payload(payload)
        snap = self.snapshot()
        k = self._get_k(payload, snap.default_k)
        # k+1 is searched (self-match removed), so k caps at num_items - 1.
        # The k-less default gets the same small-catalog clamp /recommend
        # gets (one item tighter); an explicit k still validates strictly.
        limit = snap.index.num_items - 1
        if "k" not in payload:
            k = max(1, min(k, limit))
        if not 1 <= k <= limit:
            raise ServingError(f"k must be in [1, {limit}]")
        if "item_idx" in payload:
            try:
                idx = np.atleast_1d(np.asarray(payload["item_idx"], np.int64))
            except (TypeError, ValueError) as e:
                raise ServingError("item_idx must be integers") from e
        elif "item_id" in payload:
            ids = payload["item_id"]
            ids = [ids] if isinstance(ids, str) else list(ids)
            idx = snap.vocab.items.encode(np.asarray(ids, object)).astype(np.int64)
            if (idx < 0).any():
                raise ServingError("unknown item ids", status=404)
        else:
            raise ServingError("payload must contain item_id or item_idx")
        if len(idx) == 0:
            raise ServingError("item batch must be non-empty")
        if (idx < 0).any() or (idx >= snap.index.num_items).any():
            raise ServingError("item_idx out of range", status=404)
        if len(idx) > self.max_batch:
            raise ServingError(f"batch too large: {len(idx)} > {self.max_batch}")
        return idx, k, snap

    @staticmethod
    def format_similar(idx, scores, items, k: int, vocab) -> dict[str, Any]:
        """Response half of /similar_items."""
        return {
            "results": [
                {
                    "item_idx": int(i),
                    "items": vocab.items.decode(row_i).tolist(),
                    "scores": [round(float(s), 6) for s in row_s],
                }
                for i, row_i, row_s in zip(idx, items, scores)
            ],
            "k": k,
        }

    def similar_items(self, payload: dict) -> dict[str, Any]:
        """POST /similar_items — {item_id|item_idx, k?} -> neighbours.

        Synchronous path (FastAPI front, unit tests, library callers); the
        aiohttp front coalesces concurrent calls through a MicroBatcher."""
        idx, k, snap = self.prepare_similar(payload)
        scores, items = snap.index.similar_items(idx.astype(np.int32), k)
        return self.format_similar(idx, scores, items, k, snap.vocab)


class MicroBatcher:
    """Coalesces concurrent search traffic into shared device calls.

    Under concurrency, per-request device dispatch wastes the chip: a 1-row
    and a 256-row query cost nearly the same (the corpus stream dominates —
    see ``ops/topk.py``). Handlers enqueue ``(queries, k)`` and await a
    future; a single worker task drains the queue for up to
    ``window_ms`` (or until ``max_batch`` rows), issues ONE
    ``index.<method>`` over the concatenated query rows in an executor
    thread (the event loop stays free to accept requests), and scatters
    sliced results back to each waiter. Batches are padded up to
    power-of-two buckets so the jitted search compiles O(log max_batch)
    shapes, not one per traffic pattern.

    One batcher serves one endpoint family: ``method`` names the index
    entry point (``recommend`` for user queries, ``similar_items`` for
    item-to-item, ``recommend_by_history`` for cold-start pooled queries —
    the aiohttp front runs one batcher per family, so all three POST
    routes coalesce). ``pad_value``/``pad_width`` control the filler rows:
    user/item ids pad with a valid id 0; history rows pad with all ``-1``
    (masked empty history) at the fixed ``pad_width`` so every group
    shares one compiled width bucket.

    The window is ADAPTIVE: it only applies when other requests are already
    queued. A lone request dispatches immediately (zero added latency at
    low concurrency); under load, requests arriving during the in-flight
    device call accumulate and the next group coalesces them.
    """

    def __init__(
        self, index, *, max_batch: int = 256, window_ms: float = 2.0,
        method: str = "recommend", pad_value: int = 0,
        pad_width: int | None = None, query_dtype=np.int32,
    ):
        self.index = index
        self.max_batch = max_batch
        self.window_s = window_ms / 1e3
        self.method = method
        self.pad_value = pad_value
        self.pad_width = pad_width  # fixed trailing dim for 2-D queries
        self.query_dtype = query_dtype
        self.batches = 0  # device calls issued (observability)
        self._queue: asyncio.Queue | None = None
        self._worker: asyncio.Task | None = None

    async def submit(self, queries: np.ndarray, k: int, index=None):
        """Coalesced equivalent of ``index.<method>(queries, k)``.

        ``index``: the model snapshot the request was VALIDATED against
        (defaults to the batcher's current index). Requests pinned to
        different index objects are never coalesced into one device call,
        so a hot reload mid-window cannot score a request on a model it
        did not validate against."""
        if self.pad_width is not None:
            # Fixed width bucket: every group concatenates cleanly and
            # compiles ONE trailing shape (history pooling on padded -1
            # columns is masked and costs nothing vs the corpus stream).
            q = np.full(
                (len(queries), self.pad_width), self.pad_value, self.query_dtype
            )
            q[:, : queries.shape[1]] = queries
            queries = q
        loop = asyncio.get_running_loop()
        if self._worker is None or self._worker.done():
            self._queue = asyncio.Queue()
            self._worker = loop.create_task(self._run(self._queue))
        fut: asyncio.Future = loop.create_future()
        self._queue.put_nowait((queries, k, fut, index or self.index))
        return await fut

    async def recommend(self, user_idx: np.ndarray, k: int, index=None):
        """Back-compat alias for the /recommend family's :meth:`submit`."""
        return await self.submit(user_idx, k, index)

    def _bucket(self, n: int) -> int:
        # Clamped to max_batch: a non-power-of-two max_batch (say 100) must
        # not round a 65-100-row group up to an unwarmed 128 bucket — that
        # would be a live-traffic compile the warmup exists to prevent.
        b = 1
        while b < n:
            b *= 2
        return min(b, self.max_batch)

    def _device_call(self, queries: np.ndarray, k: int, index=None):
        n = len(queries)
        if n > self.max_batch:  # HTTP fronts validate earlier; direct callers
            raise ServingError(f"batch too large: {n} > {self.max_batch}")
        padded = self._bucket(n)
        if padded != n:  # pad with valid filler rows; sliced off below
            filler = np.full(
                (padded - n,) + queries.shape[1:], self.pad_value, queries.dtype
            )
            queries = np.concatenate([queries, filler])
        target = index if index is not None else self.index
        scores, items = getattr(target, self.method)(queries, k)
        return scores[:n], items[:n]

    def warmup(self, k: int, index=None, *, extra_ks: tuple = ()) -> int:
        """Compile every (bucket, depth) shape live traffic can hit.

        Without this the first request to hit each shape pays a jit
        compile (second-scale on the tunneled chip) in live traffic —
        measured as 1616 ms p99 outliers at c=32 in
        ``benchmarks/results/serving_http_tpu_r4.jsonl``. ``extra_ks``
        extends the default-``k`` grid with the exclusion-widened search
        depths (``RecommendService.warm_depths``) so the exclude /
        seen-item paths are warm too. Call at server startup (the aiohttp
        front does, via ``on_startup``); on hot reload pass the NEW index
        explicitly via ``index=`` from the reload's pre-swap hook, so its
        shapes compile while the old index still serves. Returns the
        number of shapes compiled. Non-default request ``k`` values still
        compile lazily.
        """
        target = index if index is not None else self.index
        # Clamp to what the index can actually answer: default_k may exceed
        # a small catalog, and per-request validation is bypassed here.
        # similar_items searches k+1 internally (self-match), so its family
        # clamps one tighter.
        limit = target.num_items - (1 if self.method == "similar_items" else 0)
        ks = sorted({max(1, min(kk, limit)) for kk in (k, *extra_ks)})
        sizes = []
        b = 1
        while b < self.max_batch:
            sizes.append(b)
            b *= 2
        sizes.append(self.max_batch)  # the clamp bucket (non-power-of-two too)
        shape_tail = (self.pad_width,) if self.pad_width is not None else ()
        for b in sizes:
            for kk in ks:
                self._device_call(
                    np.full(
                        (b,) + shape_tail, self.pad_value, self.query_dtype
                    ),
                    kk,
                    target,
                )
        return len(sizes) * len(ks)

    async def _run(self, queue: asyncio.Queue):
        # ``queue`` is this worker's own (recommend() may install a fresh one
        # for a replacement worker; the shutdown drain below must not touch it)
        loop = asyncio.get_running_loop()
        carry = None  # request that would overflow the current group
        group: list = []  # current group (function scope: drained on exit)
        try:
            while True:
                first = carry if carry is not None else await queue.get()
                carry = None
                group = [first]
                total = len(first[0])
                group_index = first[3]
                # Adaptive window: a lone request (empty queue) dispatches
                # immediately — waiting out window_ms would add it to every
                # low-concurrency request's latency for nothing. Batching
                # under load needs no timer: while the device call runs,
                # new arrivals accumulate in the queue, so the NEXT group
                # starts non-empty and coalesces up to the window/max_batch.
                deadline = (
                    loop.time() + self.window_s if not queue.empty()
                    else loop.time()
                )
                while total < self.max_batch:
                    timeout = deadline - loop.time()
                    if timeout <= 0:
                        break
                    try:
                        nxt = await asyncio.wait_for(queue.get(), timeout)
                    except asyncio.TimeoutError:
                        break
                    if total + len(nxt[0]) > self.max_batch or nxt[3] is not group_index:
                        # Would exceed max_batch (the padded shape would be an
                        # unwarmed 2*max_batch bucket — a live-traffic compile)
                        # OR was validated against a different model snapshot
                        # (hot reload mid-window). Start the next group with it.
                        carry = nxt
                        break
                    group.append(nxt)
                    total += len(nxt[0])
                try:
                    users = np.concatenate([g[0] for g in group])
                    kmax = max(g[1] for g in group)
                    scores, items = await loop.run_in_executor(
                        None, self._device_call, users, kmax, group_index
                    )
                    self.batches += 1
                    off = 0
                    for u, k, fut, _ in group:
                        n = len(u)
                        if not fut.done():
                            fut.set_result(
                                (scores[off : off + n, :k], items[off : off + n, :k])
                            )
                        off += n
                except Exception as e:  # propagate to every waiter, keep serving
                    for _, _, fut, _ in group:
                        if not fut.done():
                            fut.set_exception(e)
        finally:
            # Worker is exiting (cancellation at app teardown, or a bug): fail
            # the in-flight group and every still-queued waiter so no HTTP
            # request hangs forever. Completed futures are skipped.
            leftovers = list(group) + ([carry] if carry is not None else [])
            while not queue.empty():
                leftovers.append(queue.get_nowait())
            for _, _, fut, _ in leftovers:
                if not fut.done():
                    fut.set_exception(RuntimeError("serving batcher stopped"))


# ---------------------------------------------------------------------------
# aiohttp front (default engine)
# ---------------------------------------------------------------------------

def _admin_authorized(headers, admin_token: str) -> bool:
    """Constant-time check of the admin token against either header form."""
    import hmac

    presented = headers.get("X-Admin-Token", "")
    auth = headers.get("Authorization", "")
    if auth.startswith("Bearer "):
        presented = presented or auth[len("Bearer "):]
    return hmac.compare_digest(presented, admin_token)


_BATCHER_KEY = None
_BATCHERS_KEY = None


def batcher_key():
    """The app key under which :func:`create_app` exposes its /recommend
    MicroBatcher (None when coalescing is off) — for tests and
    observability hooks."""
    global _BATCHER_KEY
    if _BATCHER_KEY is None:
        from aiohttp import web

        _BATCHER_KEY = web.AppKey("batcher", object)
    return _BATCHER_KEY


def batchers_key():
    """App key for the full per-endpoint-family batcher dict
    ({route_name -> MicroBatcher}; empty when coalescing is off)."""
    global _BATCHERS_KEY
    if _BATCHERS_KEY is None:
        from aiohttp import web

        _BATCHERS_KEY = web.AppKey("batchers", object)
    return _BATCHERS_KEY


def create_app(
    service: RecommendService, *, coalesce: bool = True, window_ms: float = 2.0,
    admin_token: str | None = None,
):
    """Build the aiohttp application.

    ``coalesce`` routes /recommend through a :class:`MicroBatcher` so
    concurrent requests share device calls. Every handler that touches the
    device (coalesced or not, /similar_items included) runs in an executor
    thread — the event loop only parses/validates, so a burst of searches
    or a cold jit compile can never stall /health or new connections.

    ``admin_token``: when set, POST /admin/reload requires it (via
    ``Authorization: Bearer <token>`` or ``X-Admin-Token``) — without a
    token the mutating admin surface would be open to anything that can
    reach the Service (model rollback / release-first denial of service).
    """
    from aiohttp import web

    batcher = None
    batchers: dict[str, MicroBatcher] = {}
    if coalesce:
        batcher = MicroBatcher(
            service.index, max_batch=service.max_batch, window_ms=window_ms
        )
        # Fixed history width bucket: one compiled trailing shape for the
        # whole family (pooling over padded -1 columns is masked and free
        # next to the corpus stream).
        hist_width = max(1, 1 << (int(service.max_history) - 1).bit_length())
        batchers = {
            "recommend": batcher,
            "similar_items": MicroBatcher(
                service.index, max_batch=service.max_batch,
                window_ms=window_ms, method="similar_items",
            ),
            "recommend_by_history": MicroBatcher(
                service.index, max_batch=service.max_batch,
                window_ms=window_ms, method="recommend_by_history",
                pad_value=-1, pad_width=hist_width, query_dtype=np.int64,
            ),
        }

    async def health(_request):
        body = service.health()
        if batcher is not None:
            body["coalesced_batches"] = sum(b.batches for b in batchers.values())
        # 503 while the model is unloaded (release-first reload in progress
        # or failed): readiness probes must pull the pod from rotation while
        # every query would 503, not keep routing to it.
        status = 200 if body["status"] == "ok" else 503
        return web.json_response(body, status=status)

    async def recommend_coalesced(payload):
        user_idx, k, exclude, snap = service.prepare_recommend(payload)
        t0 = time.perf_counter()
        # Pin the device call to the snapshot's index: a reload finishing
        # mid-window must not score this request on a model it did not
        # validate against.
        scores, items = await batcher.recommend(
            user_idx,
            service.search_depth(k, len(exclude), snap.index.num_items),
            index=snap.index,
        )
        scores, items = service.filter_excluded(scores, items, exclude, k)
        latency_ms = (time.perf_counter() - t0) * 1000
        return service.format_recommend(
            user_idx, scores, items, k, latency_ms, snap.vocab
        )

    async def similar_coalesced(payload):
        idx, k, snap = service.prepare_similar(payload)
        scores, items = await batchers["similar_items"].submit(
            idx.astype(np.int32), k, index=snap.index
        )
        return service.format_similar(idx, scores, items, k, snap.vocab)

    async def history_coalesced(payload):
        hist, per_row, k, depth, snap = service.prepare_history(payload)
        t0 = time.perf_counter()
        scores, items = await batchers["recommend_by_history"].submit(
            hist, depth, index=snap.index
        )
        latency_ms = (time.perf_counter() - t0) * 1000
        return service.format_history(
            scores, items, per_row, k, latency_ms, snap.vocab
        )

    def wrap(handler):
        is_async = asyncio.iscoroutinefunction(handler)

        async def route(request):
            try:
                payload = await request.json()
            except json.JSONDecodeError:
                return web.json_response({"error": "invalid JSON body"}, status=400)
            try:
                if is_async:
                    body = await handler(payload)
                else:
                    # Sync handlers (the un-coalesced POST routes) run the
                    # full-corpus device search and any cold jit compile —
                    # off the event loop, like the batchers do.
                    body = await asyncio.get_running_loop().run_in_executor(
                        None, handler, payload
                    )
                return web.json_response(body)
            except ServingError as e:
                return web.json_response({"error": str(e)}, status=e.status)
            except (TypeError, ValueError, KeyError) as e:
                return web.json_response({"error": f"bad request: {e}"}, status=400)
            except Exception:  # noqa: BLE001 — JSON 500 contract + log
                # Unexpected failures (device runtime errors, a cancelled
                # batcher) must still honor the JSON error contract — the
                # aiohttp default is an unparseable HTML 500 — and be logged.
                logger.exception("unhandled serving error")
                return web.json_response({"error": "internal error"}, status=500)

        return route

    reload_lock = asyncio.Lock()

    async def admin_reload(request):
        """POST /admin/reload — hot-swap the model from its checkpoint dir.

        Body (optional): {"step": N} to pin a checkpoint step. The rebuild
        runs in an executor (old index keeps serving) and reloads are
        serialized; the batcher's bucket shapes are warmed against the NEW
        index BEFORE the swap (pre_swap hook), so no live request in the
        reload window pays a jit compile."""
        if admin_token is not None and not _admin_authorized(
            request.headers, admin_token
        ):
            return web.json_response({"error": "unauthorized"}, status=401)
        try:
            payload = await request.json() if request.can_read_body else {}
        except json.JSONDecodeError:
            return web.json_response({"error": "invalid JSON body"}, status=400)
        step = payload.get("step") if isinstance(payload, dict) else None
        release_first = bool(
            payload.get("release_first", False) if isinstance(payload, dict) else False
        )
        loop = asyncio.get_running_loop()
        pre_swap = None
        if batcher is not None:
            def pre_swap(new_index):
                # configured_k (not the old catalog-clamped default_k): that
                # is what default_k becomes after the swap on a big catalog,
                # and warmup re-clamps it to the new index itself. Every
                # endpoint family's (bucket x depth) shapes warm against
                # the NEW index before the swap.
                for name, b in batchers.items():
                    b.warmup(
                        service.configured_k,
                        index=new_index,
                        extra_ks=service.warm_depths(
                            name, service.configured_k, new_index.num_items
                        ),
                    )
        async with reload_lock:
            if release_first and batcher is not None:
                # Drop the batchers' pins too — otherwise the old corpus's
                # device buffers stay referenced through the whole rebuild,
                # defeating the point of release-first (HBM headroom).
                for b in batchers.values():
                    b.index = None
            try:
                info = await loop.run_in_executor(
                    None,
                    functools.partial(
                        service.reload, step,
                        release_first=release_first, pre_swap=pre_swap,
                    ),
                )
            except ServingError as e:
                return web.json_response({"error": str(e)}, status=e.status)
            except FileNotFoundError as e:
                return web.json_response({"error": str(e)}, status=404)
            except Exception as e:  # keep the JSON error contract on 500s
                logger.exception("hot reload failed")
                return web.json_response(
                    {"error": f"reload failed: {e}"}, status=500
                )
            if batcher is not None:
                for b in batchers.values():
                    b.index = service.index  # shapes already warmed pre-swap
        return web.json_response(info)

    async def livez(_request):
        # Liveness: process-alive only, ALWAYS 200. /health 503s for the
        # whole duration of a release-first reload (minutes at large
        # catalogs) — a liveness probe pointed there would kill the pod
        # mid-rebuild and turn a recoverable 503 into a crash loop.
        return web.json_response({"status": "alive"})

    app = web.Application()
    app[batcher_key()] = batcher  # exposed for tests/observability; may be None
    app[batchers_key()] = batchers  # per-endpoint-family batchers ({} if off)
    app.router.add_get("/health", health)
    app.router.add_get("/livez", livez)
    app.router.add_post(
        "/recommend",
        wrap(recommend_coalesced if batcher is not None else service.recommend),
    )
    app.router.add_post(
        "/similar_items",
        wrap(similar_coalesced if batcher is not None else service.similar_items),
    )
    app.router.add_post(
        "/recommend_by_history",
        wrap(
            history_coalesced if batcher is not None
            else service.recommend_by_history
        ),
    )
    app.router.add_post("/admin/reload", admin_reload)

    if batcher is not None:

        async def _warm(_app):
            loop = asyncio.get_running_loop()

            def warm_all() -> int:
                n_items = service.index.num_items
                return sum(
                    b.warmup(
                        service.default_k,
                        extra_ks=service.warm_depths(
                            name, service.default_k, n_items
                        ),
                    )
                    for name, b in batchers.items()
                )

            t0 = time.perf_counter()
            shapes = await loop.run_in_executor(None, warm_all)
            logger.info(
                "serving warmup: %d (bucket x depth) shapes compiled in "
                "%.1fs (incl. exclusion-widened search depths)",
                shapes, time.perf_counter() - t0,
            )

        app.on_startup.append(_warm)
    return app


def create_fastapi_app(service: RecommendService, *, admin_token: str | None = None):
    """FastAPI front for parity with the reference's declared stack
    (reference: pyproject.toml:36, README.md:54). Import-gated."""
    from fastapi import FastAPI, HTTPException, Request, Response

    app = FastAPI(title="twotower-tpu serving")

    @app.get("/health")
    def health(response: Response):
        body = service.health()
        if body["status"] != "ok":  # readiness: pull the pod while reloading
            response.status_code = 503
        return body

    @app.get("/livez")
    def livez():
        # Liveness (always 200): see the aiohttp front's note — /health
        # 503s throughout a release-first rebuild.
        return {"status": "alive"}

    @app.post("/recommend")
    def recommend(payload: dict):
        try:
            return service.recommend(payload)
        except ServingError as e:
            raise HTTPException(status_code=e.status, detail=str(e)) from e

    @app.post("/recommend_by_history")
    def recommend_by_history(payload: dict):
        try:
            return service.recommend_by_history(payload)
        except ServingError as e:
            raise HTTPException(status_code=e.status, detail=str(e)) from e

    @app.post("/similar_items")
    def similar_items(payload: dict):
        try:
            return service.similar_items(payload)
        except ServingError as e:
            raise HTTPException(status_code=e.status, detail=str(e)) from e

    @app.post("/admin/reload")
    def admin_reload(request: Request, payload: dict | None = None):
        if admin_token is not None and not _admin_authorized(
            request.headers, admin_token
        ):
            raise HTTPException(status_code=401, detail="unauthorized")
        step = (payload or {}).get("step")
        release_first = bool((payload or {}).get("release_first", False))
        try:
            # reload() validates the step type and serializes concurrent
            # reloads internally (thread lock), so this front needs no
            # extra guard.
            return service.reload(step, release_first=release_first)
        except ServingError as e:
            raise HTTPException(status_code=e.status, detail=str(e)) from e
        except FileNotFoundError as e:
            raise HTTPException(status_code=404, detail=str(e)) from e
        except Exception as e:  # keep the JSON error contract on 500s
            logger.exception("hot reload failed")
            raise HTTPException(status_code=500, detail=f"reload failed: {e}") from e

    return app


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="serve-model", description="Serve two-tower retrieval over HTTP"
    )
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--override", nargs="*", default=[], metavar="KEY=VALUE")
    p.add_argument("--checkpoint-dir", type=str, required=True)
    p.add_argument("--host", type=str, default=None)
    p.add_argument("--port", type=int, default=None)
    p.add_argument(
        "--shard-corpus", action="store_true",
        help="row-shard the item corpus over all local devices (catalogs "
        "past one chip's HBM; cross-shard ANN merge per query)",
    )
    p.add_argument(
        "--admin-token", type=str,
        default=os.environ.get("TWOTOWER_ADMIN_TOKEN") or None,
        help="require this token on POST /admin/reload (Authorization: "
        "Bearer or X-Admin-Token header); defaults to $TWOTOWER_ADMIN_TOKEN. "
        "Unset = admin routes open (trusted-network deployments only)",
    )
    return p


def build_service(
    config: Config, checkpoint_dir: str, shard_corpus: bool = False
) -> RecommendService:
    from twotower_tpu.serving.index import RetrievalIndex

    mesh = None
    if shard_corpus:
        import jax
        from jax.sharding import Mesh

        mesh = Mesh(np.asarray(jax.devices()), (config.mesh.model_axis,))

    def factory(step: int | None = None) -> RetrievalIndex:
        return RetrievalIndex.from_checkpoint(config, checkpoint_dir, mesh=mesh, step=step)

    index = factory()
    return RecommendService(
        index,
        index.vocab,
        default_k=config.serving.top_k,
        max_batch=config.serving.max_batch_size,
        index_factory=factory,
        max_exclude=config.serving.max_exclude,
        max_history=config.serving.max_history,
    )


def main(argv: list[str] | None = None) -> int:
    from twotower_tpu.utils.platform import respect_env_platform

    respect_env_platform()
    setup_logging()
    args = build_argparser().parse_args(argv)
    config = load_config_for_checkpoint(
        args.checkpoint_dir, args.config, parse_cli_overrides(args.override)
    )
    service = build_service(config, args.checkpoint_dir, shard_corpus=args.shard_corpus)
    window = config.serving.coalesce_window_ms
    app = create_app(
        service, coalesce=window > 0, window_ms=window,
        admin_token=args.admin_token,
    )
    if args.admin_token is None:
        logger.warning(
            "admin routes are UNAUTHENTICATED (--admin-token / "
            "$TWOTOWER_ADMIN_TOKEN not set): anything that can reach this "
            "port can trigger model reloads"
        )
    host = args.host or config.serving.host
    port = args.port or config.serving.port
    logger.info("serving on http://%s:%d", host, port)
    from aiohttp import web

    web.run_app(app, host=host, port=port, print=None)
    return 0


if __name__ == "__main__":
    sys.exit(main())
