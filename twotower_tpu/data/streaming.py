"""Out-of-core preprocessing: the streaming twin of ``data.preprocess``.

The in-memory ``Preprocessor`` holds every column in RAM — fine for the
100k-per-category artifacts but not for the full 571M-review corpus
(reference README.md:45-47; SURVEY.md §7 hard part 4: streaming k-core).
This module runs the SAME pipeline (dedupe-keep-latest, text clean + length
gate, rating filter, iterative k-core, vocab encode) as multiple bounded
passes over parquet chunks:

  pass 1  dedupe winners: stream all rows through a vectorized 128-bit
          (user,item) fingerprint, hash-partition (fingerprint, ts, row)
          triples to disk, and sort each partition independently to find
          the max-timestamp row per pair (ties -> larger row index,
          matching the in-memory keep-latest semantics of
          ``Preprocessor.basic_cleaning``); winners become a 1-byte/row
          keep mask — no per-unique-pair dict
  pass 2  filter + factorize: stream again, keep only winner rows passing
          the rating and cleaned-text length gates, assign provisional
          integer codes to user/item ids, and spill the surviving rows —
          cleaned text and code columns included — to a temp parquet
  k-core  iterate over the temp parquet's two code COLUMNS only:
          ``np.bincount`` per pass, threshold, repeat to fixpoint (exact
          two-pass-per-iteration counting — SURVEY hard part 4's plan)
  pass 3  re-encode against the final vocab (sorted surviving ids — identical
          to ``Vocabulary.build`` on the surviving rows) and write the final
          ``combined_interactions.parquet`` + vocab + stats chunk by chunk

Bounded state, by design: row buffers are capped at ``batch_rows`` rows
(dedupe spill buffers at 4x that); the only whole-corpus state is the
per-UNIQUE-entity id/count maps, two 1-byte-per-row keep masks, and one
hash partition (~1/256th of the corpus) in RAM during dedupe — the
standard out-of-core contract (row data >> key data).

Equality with the in-memory pipeline is asserted in
tests/test_streaming.py on a >10-chunk corpus.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Iterator

import numpy as np

from twotower_tpu.config import PreprocessingConfig
from twotower_tpu.data import schema
from twotower_tpu.data.schema import Interactions
from twotower_tpu.data.text import TextProcessor
from twotower_tpu.data.vocab import Vocabulary, VocabPair
from twotower_tpu.logging_utils import get_logger

logger = get_logger(__name__)


def stream_interactions(
    paths: list[Path], batch_rows: int
) -> Iterator[Interactions]:
    """Yield schema-normalized ``Interactions`` chunks of <= batch_rows."""
    import pyarrow.parquet as pq

    for path in paths:
        pf = pq.ParquetFile(path)
        for batch in pf.iter_batches(batch_size=batch_rows):
            yield schema.from_dataframe(batch.to_pandas())


class StreamingPreprocessor:
    """Multi-pass out-of-core preprocessing with bounded row buffers."""

    def __init__(
        self,
        config: PreprocessingConfig | None = None,
        *,
        batch_rows: int = 262_144,
    ):
        self.config = config or PreprocessingConfig()
        self.text_processor = TextProcessor(self.config)
        self.batch_rows = int(batch_rows)
        self.vocab: VocabPair | None = None
        self.chunks_processed = 0

    # ------------------------------------------------------------------

    def _chunks(self, paths: list[Path]) -> Iterator[Interactions]:
        for chunk in stream_interactions(paths, self.batch_rows):
            self.chunks_processed += 1
            yield chunk

    # -- external dedupe -------------------------------------------------

    _NUM_PARTITIONS = 256

    @staticmethod
    def _hash128(strings: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Vectorized 128-bit polynomial hash of a string column.

        Codepoint columns beyond each row's length are skipped (``\\x00``
        marks '<U' padding; ids cannot contain it — the same assumption the
        in-memory dedupe's ``\\x00``-joined pair keys make), so the hash is
        independent of the chunk-local fixed width."""
        s = strings.astype("U")
        n = len(s)
        width = s.dtype.itemsize // 4
        if n == 0 or width == 0:
            z = np.zeros(n, np.uint64)
            return z, z.copy()
        buf = np.ascontiguousarray(s).view(np.uint32).reshape(n, width)
        m1, m2 = np.uint64(0x9E3779B97F4A7C15), np.uint64(0xC2B2AE3D27D4EB4F)
        h1 = np.full(n, np.uint64(0x243F6A8885A308D3))
        h2 = np.full(n, np.uint64(0x13198A2E03707344))
        with np.errstate(over="ignore"):
            for c in range(width):
                col = buf[:, c].astype(np.uint64)
                live = col != 0
                n1 = (h1 * m1 + col) ^ ((h1 * m1 + col) >> np.uint64(29))
                n2 = (h2 * m2 + col) ^ ((h2 * m2 + col) >> np.uint64(31))
                h1 = np.where(live, n1, h1)
                h2 = np.where(live, n2, h2)
        return h1, h2

    @classmethod
    def _pair_hash_columns(
        cls, user_id: np.ndarray, item_id: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """128-bit (user, item) pair fingerprint from per-entity hashes."""
        u1, u2 = cls._hash128(user_id)
        i1, i2 = cls._hash128(item_id)
        rot = np.uint64(17)
        with np.errstate(over="ignore"):
            p1 = (u1 ^ ((i1 << rot) | (i1 >> np.uint64(64 - 17)))) * np.uint64(
                0x9E3779B97F4A7C15
            )
            p2 = (u2 ^ ((i2 << rot) | (i2 >> np.uint64(64 - 17)))) * np.uint64(
                0xC2B2AE3D27D4EB4F
            )
        return p1, p2

    @staticmethod
    def _group_winners(
        p1: np.ndarray, p2: np.ndarray, ts: np.ndarray, rows: np.ndarray
    ) -> np.ndarray:
        """Winning global row per (p1, p2) group: max ts, ties -> later row
        (NaN timestamps sort last and win — matching the in-memory
        ``basic_cleaning`` stable-argsort semantics)."""
        order = np.lexsort((rows, ts, p2, p1))
        sp1, sp2 = p1[order], p2[order]
        last = np.flatnonzero(
            np.r_[(sp1[1:] != sp1[:-1]) | (sp2[1:] != sp2[:-1]), True]
        )
        return rows[order[last]]

    def _dedupe_keep_mask(self, paths: list[Path], tmp_dir: Path) -> np.ndarray | None:
        """Global boolean keep mask for dedupe-keep-latest, or None when
        duplicate removal is disabled.

        Two regimes, switched by whether the stream fits the row buffer
        (4x ``batch_rows``):

        - in-RAM: one sequential dict pass over the buffered rows — the
          fastest exact method at small scale (a vectorized sort/gather
          pass measured 0.2x the dict on 1M rows: winner selection is
          random-access bound, which favors the cache-resident dict).
        - spilled: rows stream through a vectorized 128-bit pair
          fingerprint and (hash, ts, row) triples land in 256 hash
          partitions on disk; each partition (~1/256th of the corpus) is
          sorted independently and its per-pair winners set bits in the
          keep mask. Bounded state — spill buffers, ONE partition in RAM,
          1 byte/row for the mask — where a per-unique-pair dict would be
          ~100 GB at the 571M-review scale (SURVEY hard part 4). Pair
          identity is the 128-bit fingerprint: two DISTINCT pairs alias
          with probability ~n^2/2^129 (~1e-21 at 571M rows).
        """
        if not self.config.filtering.remove_duplicates:
            return None
        k = self._NUM_PARTITIONS
        shift = np.uint64(56)  # top 8 bits of p1 -> partition id
        spill_dir = tmp_dir / "_dedupe_spill"
        # Buffered raw columns: (user_id, item_id, ts, base). Hashing is
        # deferred until the first overflow proves the stream is large.
        buffers: list[tuple[np.ndarray, np.ndarray, np.ndarray, int]] = []
        buffered = 0
        spilled = False
        seq = 0

        def flush() -> None:
            nonlocal buffers, buffered, spilled, seq
            if not buffered:
                return
            parts_p1, parts_p2, parts_ts, parts_rows = [], [], [], []
            for u, i, ts, b in buffers:
                p1, p2 = self._pair_hash_columns(u, i)
                parts_p1.append(p1)
                parts_p2.append(p2)
                parts_ts.append(ts)
                parts_rows.append(np.arange(b, b + len(u), dtype=np.int64))
            p1 = np.concatenate(parts_p1)
            p2 = np.concatenate(parts_p2)
            ts = np.concatenate(parts_ts)
            rows = np.concatenate(parts_rows)
            part = (p1 >> shift).astype(np.int64)
            order = np.argsort(part, kind="stable")
            bounds = np.searchsorted(part[order], np.arange(k + 1))
            spill_dir.mkdir(parents=True, exist_ok=True)
            for p in range(k):
                sl = order[bounds[p] : bounds[p + 1]]
                if not len(sl):
                    continue
                np.savez(
                    spill_dir / f"part{p:03d}_{seq:04d}.npz",
                    p1=p1[sl], p2=p2[sl], ts=ts[sl], rows=rows[sl],
                )
            buffers, buffered, spilled, seq = [], 0, True, seq + 1

        base = 0
        for chunk in self._chunks(paths):
            n = len(chunk)
            if n == 0:
                continue
            ts = np.asarray(chunk.timestamp)
            if ts.dtype.kind == "f":
                # NaN -> +inf so plain comparisons and the partition sort
                # agree with the in-memory argsort's NaN-sorts-last rule.
                ts = np.where(np.isnan(ts), np.inf, ts)
            buffers.append((chunk.user_id, chunk.item_id, ts, base))
            buffered += n
            base += n
            if buffered >= 4 * self.batch_rows:
                flush()
        total_rows = base

        keep = np.zeros(total_rows, bool)
        if not spilled:
            # Everything fit in the buffer: sequential dict dedupe, no disk.
            winners: dict = {}
            for u, i, ts, b in buffers:
                for off in range(len(u)):
                    key = (u[off], i[off])
                    t = ts[off]
                    prev = winners.get(key)
                    if prev is None or t >= prev[0]:
                        winners[key] = (t, b + off)
            for _, idx in winners.values():
                keep[idx] = True
            return keep
        flush()
        try:
            for p in range(k):
                files = sorted(spill_dir.glob(f"part{p:03d}_*.npz"))
                if not files:
                    continue
                cols = {key: [] for key in ("p1", "p2", "ts", "rows")}
                for f in files:
                    with np.load(f) as z:
                        for key in cols:
                            cols[key].append(z[key])
                keep[
                    self._group_winners(
                        *(np.concatenate(cols[key]) for key in ("p1", "p2", "ts", "rows"))
                    )
                ] = True
        finally:
            for f in spill_dir.glob("part*.npz"):
                f.unlink(missing_ok=True)
            if spill_dir.exists():
                spill_dir.rmdir()
        return keep

    def _row_filters(self, chunk: Interactions) -> tuple[np.ndarray, Interactions]:
        """Rating gate + text clean/length gate for one chunk (stateless)."""
        f = self.config.filtering
        mask = (chunk.rating >= f.min_rating) & (chunk.rating <= f.max_rating)
        if chunk.text is not None:
            cleaned = self.text_processor.clean_array(chunk.text)
            chunk = chunk.with_columns(text=cleaned)
            mask &= self.text_processor.length_mask(cleaned)
        return mask, chunk

    def process_parquet(self, source, out_dir) -> dict:
        """Run the full out-of-core pipeline; writes
        ``combined_interactions.parquet``, the vocab manifest, and
        ``dataset_stats.json`` under ``out_dir``. Returns the stats dict."""
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        paths = (
            [Path(p) for p in source]
            if isinstance(source, (list, tuple))
            else [Path(source)]
        )
        out_dir = Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        tmp_path = out_dir / "_streaming_tmp.parquet"

        # ---- pass 1: dedupe winners over ALL rows (same order as the
        # in-memory pipeline: dedupe happens before the text/rating gates).
        winners_mask = self._dedupe_keep_mask(paths, out_dir)

        # ---- pass 2: filter + factorize + spill to temp parquet.
        u_codes: dict = {}
        i_codes: dict = {}
        writer = None
        base = 0
        n_kept = 0
        has_text = False
        try:
            for chunk in self._chunks(paths):
                n = len(chunk)
                keep = (
                    winners_mask[base : base + n].copy()
                    if winners_mask is not None
                    else np.ones(n, bool)
                )
                base += n
                fmask, chunk = self._row_filters(chunk)
                keep &= fmask
                sub = chunk.select(keep)
                if len(sub) == 0:
                    continue
                # Per-row dict.setdefault beats np.unique factorization here
                # (measured 0.6-1.0x for unique->dict at 1.3-130x id
                # repetition: numpy string sorts cost more than the loop).
                uc = np.fromiter(
                    (
                        u_codes.setdefault(str(u), len(u_codes))
                        for u in sub.user_id
                    ),
                    np.int64,
                    count=len(sub),
                )
                ic = np.fromiter(
                    (
                        i_codes.setdefault(str(i), len(i_codes))
                        for i in sub.item_id
                    ),
                    np.int64,
                    count=len(sub),
                )
                frame = {
                    "user_id": sub.user_id.astype(str),
                    "parent_asin": sub.item_id.astype(str),
                    "rating": sub.rating,
                    "timestamp": sub.timestamp,
                    "u_code": uc,
                    "i_code": ic,
                }
                if sub.text is not None:
                    frame["text"] = sub.text.astype(str)
                    has_text = True
                if sub.title is not None:
                    frame["title"] = sub.title.astype(str)
                table = pa.Table.from_pandas(
                    pd.DataFrame(frame), preserve_index=False
                )
                if writer is None:
                    writer = pq.ParquetWriter(tmp_path, table.schema)
                writer.write_table(table)
                n_kept += len(sub)
        finally:
            if writer is not None:
                writer.close()
        if n_kept == 0:
            raise ValueError("all interactions filtered out before k-core")

        # ---- k-core iterations over the temp code columns only.
        min_u = self.config.min_interactions_per_user
        min_i = self.config.min_interactions_per_item
        keep_mask = np.ones(n_kept, bool)
        n_users, n_items = len(u_codes), len(i_codes)
        pf = pq.ParquetFile(tmp_path)
        for iteration in range(self.config.max_kcore_iterations):
            u_counts = np.zeros(n_users, np.int64)
            i_counts = np.zeros(n_items, np.int64)
            pos = 0
            for batch in pf.iter_batches(
                batch_size=self.batch_rows, columns=["u_code", "i_code"]
            ):
                uc = batch.column("u_code").to_numpy()
                ic = batch.column("i_code").to_numpy()
                m = keep_mask[pos : pos + len(uc)]
                u_counts += np.bincount(uc[m], minlength=n_users)
                i_counts += np.bincount(ic[m], minlength=n_items)
                pos += len(uc)
            new_mask = np.empty_like(keep_mask)
            pos = 0
            for batch in pf.iter_batches(
                batch_size=self.batch_rows, columns=["u_code", "i_code"]
            ):
                uc = batch.column("u_code").to_numpy()
                ic = batch.column("i_code").to_numpy()
                sl = slice(pos, pos + len(uc))
                new_mask[sl] = (
                    keep_mask[sl]
                    & (u_counts[uc] >= min_u)
                    & (i_counts[ic] >= min_i)
                )
                pos += len(uc)
            if new_mask.sum() == keep_mask.sum():
                logger.info("streaming k-core converged after %d iterations", iteration + 1)
                break
            keep_mask = new_mask
            if not keep_mask.any():
                break
        if not keep_mask.any():
            raise ValueError("all interactions filtered out; relax k-core thresholds")

        # ---- final vocab: sorted surviving ids == Vocabulary.build on the
        # surviving rows (same sorted-unique contract).
        u_id_by_code = np.empty(n_users, object)
        for k, v in u_codes.items():
            u_id_by_code[v] = k
        i_id_by_code = np.empty(n_items, object)
        for k, v in i_codes.items():
            i_id_by_code[v] = k
        # Recount over the FINAL mask (the loop's counts may predate the
        # last threshold pass).
        u_final = np.zeros(n_users, np.int64)
        i_final = np.zeros(n_items, np.int64)
        pos = 0
        for batch in pf.iter_batches(
            batch_size=self.batch_rows, columns=["u_code", "i_code"]
        ):
            uc = batch.column("u_code").to_numpy()
            ic = batch.column("i_code").to_numpy()
            m = keep_mask[pos : pos + len(uc)]
            u_final += np.bincount(uc[m], minlength=n_users)
            i_final += np.bincount(ic[m], minlength=n_items)
            pos += len(uc)

        def build_vocab(id_by_code, counts):
            alive = counts > 0
            ids = id_by_code[alive].astype(str)
            order = np.argsort(ids)
            sorted_ids = ids[order]
            sorted_counts = counts[alive][order]
            # code -> final contiguous index (or -1 for dropped entities)
            code_to_final = np.full(len(counts), -1, np.int32)
            code_to_final[np.flatnonzero(alive)[order]] = np.arange(
                alive.sum(), dtype=np.int32
            )
            return (
                Vocabulary(
                    ids=sorted_ids.astype(object),
                    counts=sorted_counts.astype(np.int64),
                ),
                code_to_final,
            )

        users, u_map = build_vocab(u_id_by_code, u_final)
        items, i_map = build_vocab(i_id_by_code, i_final)
        self.vocab = VocabPair(users=users, items=items)

        # ---- pass 3: final artifact, re-encoded, chunk by chunk.
        out_path = out_dir / "combined_interactions.parquet"
        writer = None
        pos = 0
        n_final = 0
        rating_sum = 0.0
        rating_hist: dict[str, int] = {}
        try:
            for batch in pf.iter_batches(batch_size=self.batch_rows):
                df = batch.to_pandas()
                m = keep_mask[pos : pos + len(df)]
                pos += len(df)
                df = df[m]
                if not len(df):
                    continue
                df["user_idx"] = u_map[df.pop("u_code").to_numpy()]
                df["item_idx"] = i_map[df.pop("i_code").to_numpy()]
                table = pa.Table.from_pandas(df, preserve_index=False)
                if writer is None:
                    writer = pq.ParquetWriter(out_path, table.schema)
                writer.write_table(table)
                n_final += len(df)
                rating_sum += float(df["rating"].sum())
                r, c = np.unique(
                    df["rating"].to_numpy().astype(np.int64), return_counts=True
                )
                for rv, cv in zip(r.tolist(), c.tolist()):
                    rating_hist[str(rv)] = rating_hist.get(str(rv), 0) + int(cv)
        finally:
            if writer is not None:
                writer.close()
        tmp_path.unlink(missing_ok=True)

        self.vocab.save(out_dir / "vocab")
        denom = len(users) * len(items)
        stats = {
            "num_interactions": n_final,
            "num_users": len(users),
            "num_items": len(items),
            "sparsity": 1.0 - (n_final / denom) if denom else 0.0,
            "rating_mean": rating_sum / max(n_final, 1),
            "rating_distribution": rating_hist,
            "chunks_processed": self.chunks_processed,
            "has_text": has_text,
        }
        (out_dir / "dataset_stats.json").write_text(json.dumps(stats, indent=2))
        logger.info(
            "streaming prepare: %d rows, %d users, %d items (%d chunk reads)",
            n_final, len(users), len(items), self.chunks_processed,
        )
        return stats
