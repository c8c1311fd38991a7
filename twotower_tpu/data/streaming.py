"""Out-of-core preprocessing: the streaming twin of ``data.preprocess``.

The in-memory ``Preprocessor`` holds every column in RAM — fine for the
100k-per-category artifacts but not for the full 571M-review corpus
(reference README.md:45-47; SURVEY.md §7 hard part 4: streaming k-core).
This module runs the SAME pipeline (dedupe-keep-latest, text clean + length
gate, rating filter, iterative k-core, vocab encode) as multiple bounded
passes over parquet chunks:

  pass 1  dedupe winners: stream all rows, track per-(user,item) pair the
          max-timestamp row (ties -> larger row index, matching the
          in-memory keep-latest semantics of ``Preprocessor.basic_cleaning``)
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

Bounded state, by design: row buffers are capped at ``batch_rows`` rows;
the only whole-corpus state is per-UNIQUE-entity maps (pair winners, id
codes, count vectors) and a 1-byte-per-surviving-row keep mask — the
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

    def _dedupe_winners(self, paths: list[Path]) -> dict:
        """pair -> winning global row index (max timestamp, ties -> later
        row), or None when duplicate removal is disabled."""
        if not self.config.filtering.remove_duplicates:
            return {}
        winners: dict = {}
        base = 0
        for chunk in self._chunks(paths):
            ts = chunk.timestamp
            for off in range(len(chunk)):
                key = (chunk.user_id[off], chunk.item_id[off])
                t = ts[off]
                prev = winners.get(key)
                if prev is None or t >= prev[0]:
                    winners[key] = (t, base + off)
            base += len(chunk)
        return {k: idx for k, (_, idx) in winners.items()}

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
        winners = self._dedupe_winners(paths)
        dedupe = bool(winners)

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
                keep = np.ones(n, bool)
                if dedupe:
                    keep = np.fromiter(
                        (
                            winners.get((chunk.user_id[o], chunk.item_id[o]))
                            == base + o
                            for o in range(n)
                        ),
                        bool,
                        count=n,
                    )
                base += n
                fmask, chunk = self._row_filters(chunk)
                keep &= fmask
                sub = chunk.select(keep)
                if len(sub) == 0:
                    continue
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
