"""Data engine tests (reference analog: tests/unit/test_preprocessor.py)."""

import json

import numpy as np
import pytest

from twotower_tpu.config import PreprocessingConfig
from twotower_tpu.data.preprocess import InteractionFilter, Preprocessor
from twotower_tpu.data.schema import Interactions, SchemaError, from_columns
from twotower_tpu.data.synthetic import generate_interactions
from twotower_tpu.data.text import TextProcessor
from twotower_tpu.data.vocab import Vocabulary, VocabPair


def make_interactions(users, items, ratings=None, timestamps=None, **kw):
    n = len(users)
    return Interactions(
        user_id=np.array(users, dtype=object),
        item_id=np.array(items, dtype=object),
        rating=np.array(ratings if ratings is not None else [5.0] * n, dtype=np.float32),
        timestamp=np.array(timestamps if timestamps is not None else range(n), dtype=np.int64),
        **kw,
    )


# ---------------------------------------------------------------------------
# Schema
# ---------------------------------------------------------------------------


class TestSchema:
    def test_from_columns_required(self):
        with pytest.raises(SchemaError):
            from_columns({"user_id": ["a"], "rating": [5.0]})

    def test_from_columns_normalizes(self):
        data = from_columns(
            {
                "user_id": ["u1", "u2", "u3"],
                "parent_asin": ["i1", "i2", "i3"],
                "rating": ["5", "bad", "3"],
                "timestamp": [1600000000000, 1600000001000, 1600000002000],  # ms
            }
        )
        # 'bad' rating row dropped; ms -> s
        assert len(data) == 2
        assert data.timestamp[0] == 1600000000
        assert data.rating.dtype == np.float32

    def test_select_and_concat(self):
        d = make_interactions(["a", "b", "c"], ["x", "y", "z"])
        sub = d.select(np.array([True, False, True]))
        assert list(sub.user_id) == ["a", "c"]
        both = sub.concat(sub)
        assert len(both) == 4

    def test_sparsity(self):
        d = make_interactions(["a", "a", "b"], ["x", "y", "x"])
        assert d.num_users == 2 and d.num_items == 2
        assert d.sparsity == pytest.approx(1 - 3 / 4)


# ---------------------------------------------------------------------------
# Text processing (reference: test_preprocessor.py TextProcessor tests)
# ---------------------------------------------------------------------------


class TestTextProcessor:
    def test_clean_basic(self):
        tp = TextProcessor()
        assert tp.clean_text("Hello <b>World</b>!") == "hello world!"
        assert tp.clean_text("Visit https://example.com now") == "visit now"
        assert tp.clean_text("  lots   of\tspace ") == "lots of space"
        assert tp.clean_text("") == ""

    def test_html_entities(self):
        tp = TextProcessor()
        assert tp.clean_text("a &amp; b") == "a b" or "&" not in tp.clean_text("a &amp; b")

    def test_keeps_basic_punctuation(self):
        tp = TextProcessor()
        out = tp.clean_text("Great, really great! 10/10?")
        assert "," in out and "!" in out and "?" in out

    def test_length_gate(self):
        cfg = PreprocessingConfig()
        tp = TextProcessor(cfg)
        assert not tp.validate_text_length("short")
        assert tp.validate_text_length("x" * 100)
        assert not tp.validate_text_length("x" * 3000)

    def test_clean_array(self):
        tp = TextProcessor()
        out = tp.clean_array(np.array(["A B", None, "C"], dtype=object))
        assert list(out) == ["a b", "", "c"]

    def test_clean_array_matches_per_row(self):
        """The joined-corpus fast path is bit-identical to clean_text per
        row, including on sentinel-hostile inputs (config-combo coverage
        lives in the implementation's build-time validation script)."""
        texts = np.array(
            [
                "", None, "plain text", "  spaced   out  ",
                "<b>Bold</b> and <i>italic</i>", "<unclosed tag never ends",
                "ends with open <", "starts with close > here",
                "R&D department", "&amp; escaped &lt;tag&gt;",
                "&amp no semicolon", "&#38; numeric", "&#0; null charref",
                "visit https://example.com/path?q=1&r=2 now",
                "UPPER Case MiXeD", "special $#@%^&*()[]{} chars",
                "keep .,!?'- these", "tab\there\nnewline\r\nmix",
                "unicode café naïve 日本語", "a<b and c>d math",
                "trailing space ", " leading", "nbsp\xa0here",
                "\t\n  ", "x",
            ],
            dtype=object,
        )
        tp = TextProcessor()
        batch = tp.clean_array(texts)
        per_row = np.array(
            [tp.clean_text(t) if t else "" for t in texts], dtype=object
        )
        assert list(batch) == list(per_row)
        assert tp.clean_array(np.array([], dtype=object)).shape == (0,)
        # Inputs that alias the sentinel take the per-row fallback.
        hostile = np.array(["literal \x00 inside", "ok"], dtype=object)
        assert list(tp.clean_array(hostile)) == [
            tp.clean_text(hostile[0]), "ok"
        ]


# ---------------------------------------------------------------------------
# k-core filtering (reference: preprocessor.py:192-211 semantics)
# ---------------------------------------------------------------------------


class TestInteractionFilter:
    def cfg(self, k=2):
        return PreprocessingConfig(
            min_interactions_per_user=k, min_interactions_per_item=k
        )

    def test_rating_filter(self):
        f = InteractionFilter(self.cfg(1))
        d = make_interactions(["a", "b"], ["x", "y"], ratings=[0.5, 3.0])
        out = f.filter_by_rating(d)
        assert len(out) == 1 and out.rating[0] == 3.0

    def test_kcore_iterative_cascade(self):
        # u1 has 2 items but one of them (i2) is only hers -> removing i2
        # drops u1 below threshold -> cascade removes u1 entirely.
        users = ["u1", "u1", "u2", "u3", "u2", "u3"]
        items = ["i1", "i2", "i1", "i1", "i3", "i3"]
        f = InteractionFilter(self.cfg(2))
        out = f.filter_by_frequency(make_interactions(users, items))
        assert set(out.user_id) == {"u2", "u3"}
        assert set(out.item_id) == {"i1", "i3"}

    def test_kcore_matches_pandas_reference(self, rng):
        """Golden test: bincount k-core == the reference's pandas fixpoint."""
        import pandas as pd

        n = 2000
        users = rng.integers(0, 120, n).astype(str)
        items = rng.integers(0, 80, n).astype(str)
        d = make_interactions(users, items)
        out = InteractionFilter(self.cfg(3)).filter_by_frequency(d)

        # Reference algorithm (preprocessor.py:192-211), straight pandas.
        df = pd.DataFrame({"u": users, "i": items})
        for _ in range(10):
            before = len(df)
            uc = df["u"].value_counts()
            df = df[df["u"].isin(uc[uc >= 3].index)]
            ic = df["i"].value_counts()
            df = df[df["i"].isin(ic[ic >= 3].index)]
            if len(df) == before:
                break
        assert len(out) == len(df)
        assert sorted(zip(out.user_id, out.item_id)) == sorted(zip(df["u"], df["i"]))

    def test_empty_result(self):
        f = InteractionFilter(self.cfg(5))
        out = f.filter(make_interactions(["a", "b"], ["x", "y"]))
        assert len(out) == 0


# ---------------------------------------------------------------------------
# Vocabulary
# ---------------------------------------------------------------------------


class TestVocabulary:
    def test_build_deterministic_sorted(self):
        v = Vocabulary.build(np.array(["b", "a", "b", "c"], dtype=object))
        assert list(v.ids) == ["a", "b", "c"]
        assert list(v.counts) == [1, 2, 1]

    def test_encode_decode_roundtrip(self):
        v = Vocabulary.build(np.array(["b", "a", "c"], dtype=object))
        idx = v.encode(np.array(["c", "a", "zzz"], dtype=object))
        assert list(idx) == [2, 0, -1]
        assert list(v.decode([0, 1])) == ["a", "b"]

    def test_frequencies_sum_to_one(self):
        v = Vocabulary.build(np.array(["a"] * 3 + ["b"], dtype=object))
        assert v.frequencies.sum() == pytest.approx(1.0)
        assert v.frequencies[0] == pytest.approx(0.75)

    def test_shard_bounds_aligned(self):
        v = Vocabulary.build(np.array([f"i{j}" for j in range(1000)], dtype=object))
        bounds = v.shard_bounds(num_shards=4, pad_multiple=128)
        assert len(bounds) == 4
        sizes = [e - s for s, e in bounds]
        assert len(set(sizes)) == 1 and sizes[0] % 128 == 0
        assert bounds[-1][1] >= 1000

    def test_save_load(self, tmp_path):
        pair = VocabPair(
            users=Vocabulary.build(np.array(["u1", "u2"], dtype=object)),
            items=Vocabulary.build(np.array(["i1"], dtype=object)),
        )
        pair.save(tmp_path / "vocab")
        loaded = VocabPair.load(tmp_path / "vocab")
        assert list(loaded.users.ids) == ["u1", "u2"]
        assert list(loaded.items.counts) == [1]


# ---------------------------------------------------------------------------
# Preprocessor end-to-end + splits
# ---------------------------------------------------------------------------


class TestPreprocessor:
    def test_dedupe_keeps_latest(self):
        p = Preprocessor(PreprocessingConfig(min_interactions_per_user=1, min_interactions_per_item=1))
        d = make_interactions(
            ["u", "u"], ["i", "i"], ratings=[1.0, 5.0], timestamps=[10, 20]
        )
        out = p.basic_cleaning(d)
        assert len(out) == 1 and out.rating[0] == 5.0

    def test_full_pipeline(self):
        cfg = PreprocessingConfig(min_interactions_per_user=2, min_interactions_per_item=2)
        p = Preprocessor(cfg)
        data = generate_interactions(num_users=50, num_items=30, num_interactions=1500)
        out = p.process(data)
        assert out.user_idx is not None and out.item_idx is not None
        assert out.user_idx.min() >= 0
        assert p.vocab is not None
        assert out.user_idx.max() + 1 == len(p.vocab.users)

    def test_temporal_split_ordering(self):
        cfg = PreprocessingConfig(min_interactions_per_user=1, min_interactions_per_item=1)
        p = Preprocessor(cfg)
        data = generate_interactions(num_users=20, num_items=10, num_interactions=500)
        splits = p.split_data(data, method="temporal")
        assert len(splits.train) == 400 and len(splits.val) == 50
        assert splits.train.timestamp.max() <= splits.val.timestamp.min()
        assert splits.val.timestamp.max() <= splits.test.timestamp.min()

    def test_random_split_sizes_and_disjoint(self):
        cfg = PreprocessingConfig(min_interactions_per_user=1, min_interactions_per_item=1)
        p = Preprocessor(cfg)
        data = generate_interactions(num_users=20, num_items=10, num_interactions=1000)
        splits = p.split_data(data, method="random", seed=7)
        total = len(splits.train) + len(splits.val) + len(splits.test)
        assert total == 1000
        assert abs(len(splits.train) - 800) <= 5

    def test_unknown_split_method(self):
        p = Preprocessor()
        with pytest.raises(ValueError):
            p.split_data(generate_interactions(10, 5, 20), method="bogus")


# ---------------------------------------------------------------------------
# Batch pipeline
# ---------------------------------------------------------------------------


class TestBatchPipeline:
    def make_encoded(self, n=100):
        data = generate_interactions(num_users=20, num_items=10, num_interactions=n)
        p = Preprocessor(PreprocessingConfig(min_interactions_per_user=1, min_interactions_per_item=1))
        return p.encode_ids(data)

    def test_fixed_shapes_drop_remainder(self):
        from twotower_tpu.data.pipeline import BatchPipeline

        pipe = BatchPipeline(self.make_encoded(105), batch_size=32)
        batches = list(pipe.epoch(0))
        assert len(batches) == 3
        for b in batches:
            assert b["user_idx"].shape == (32,)
            assert b["weight"].sum() == 32

    def test_padding_when_not_dropping(self):
        from twotower_tpu.data.pipeline import BatchPipeline

        pipe = BatchPipeline(self.make_encoded(40), batch_size=32, drop_remainder=False)
        batches = list(pipe.epoch(0))
        assert len(batches) == 2
        assert batches[1]["user_idx"].shape == (32,)
        assert batches[1]["weight"].sum() == 8

    def test_shuffle_deterministic_per_epoch(self):
        from twotower_tpu.data.pipeline import BatchPipeline

        pipe = BatchPipeline(self.make_encoded(64), batch_size=32, seed=3)
        a = list(pipe.epoch(1))
        b = list(pipe.epoch(1))
        c = list(pipe.epoch(2))
        assert np.array_equal(a[0]["user_idx"], b[0]["user_idx"])
        assert not np.array_equal(a[0]["user_idx"], c[0]["user_idx"])

    def test_prefetcher(self):
        from twotower_tpu.data.pipeline import BatchPipeline, DevicePrefetcher

        pipe = BatchPipeline(self.make_encoded(96), batch_size=32)
        seen = list(DevicePrefetcher(pipe.epoch(0), put=lambda b: b, depth=2))
        assert len(seen) == 3

    def test_prefetcher_propagates_errors(self):
        from twotower_tpu.data.pipeline import DevicePrefetcher

        def bad_iter():
            yield {"user_idx": np.zeros(1)}
            raise RuntimeError("boom")

        pf = DevicePrefetcher(bad_iter(), put=lambda b: b)
        next(pf)
        with pytest.raises(RuntimeError):
            next(pf)

    def test_requires_encoding(self):
        from twotower_tpu.data.pipeline import BatchPipeline

        raw = generate_interactions(10, 5, 20)
        with pytest.raises(ValueError):
            BatchPipeline(raw, batch_size=4)


class TestReferenceMigration:
    """migrate-reference-artifacts: mappings.pkl -> pickle-free vocab."""

    @staticmethod
    def _reference_artifacts(tmp_path, sorted_ids=True):
        import pickle

        import pandas as pd

        rng = np.random.default_rng(0)
        users = [f"U{i:03d}" for i in range(20)]
        items = [f"B{i:03d}" for i in range(10)]
        rows = {
            "user_id": rng.choice(users, 200),
            "parent_asin": rng.choice(items, 200),
            "rating": rng.integers(1, 6, 200).astype(np.float64),
            "timestamp": rng.integers(1_500_000_000, 1_600_000_000, 200),
        }
        df = pd.DataFrame(rows)
        # The reference maps sorted uniques -> contiguous ints
        # (prepare_training_data.py:113-123).
        u_sorted = sorted(df["user_id"].unique())
        i_sorted = sorted(df["parent_asin"].unique())
        if not sorted_ids:
            u_sorted = list(reversed(u_sorted))
        user_to_idx = {u: i for i, u in enumerate(u_sorted)}
        item_to_idx = {v: i for i, v in enumerate(i_sorted)}
        df["user_idx"] = df["user_id"].map(user_to_idx)
        df["item_idx"] = df["parent_asin"].map(item_to_idx)
        pq = tmp_path / "combined_interactions.parquet"
        df.to_parquet(pq, index=False)
        mappings = {
            "user_to_idx": user_to_idx,
            "item_to_idx": item_to_idx,
            "idx_to_user": {v: k for k, v in user_to_idx.items()},
            "idx_to_item": {v: k for k, v in item_to_idx.items()},
        }
        mp = tmp_path / "mappings.pkl"
        with open(mp, "wb") as f:
            pickle.dump(mappings, f)
        return mp, pq, df

    def test_cli_migrates_and_matches_preprocessor(self, tmp_path):
        from twotower_tpu.data.migrate import main as migrate_main
        from twotower_tpu.data.schema import from_dataframe
        from twotower_tpu.data.vocab import VocabPair

        mp, pq, df = self._reference_artifacts(tmp_path)
        out = tmp_path / "migrated"
        rc = migrate_main(
            ["--mappings", str(mp), "--interactions", str(pq),
             "--output-dir", str(out)]
        )
        assert rc == 0
        vocab = VocabPair.load(out / "vocab")
        report = json.loads((out / "migration_report.json").read_text())
        assert report["sorted_contiguous"] is True

        # The migrated encoding agrees with the reference's precomputed
        # columns AND with this framework's own vocab build.
        enc = vocab.users.encode(df["user_id"].to_numpy(object))
        np.testing.assert_array_equal(enc, df["user_idx"].to_numpy())
        enc_i = vocab.items.encode(df["parent_asin"].to_numpy(object))
        np.testing.assert_array_equal(enc_i, df["item_idx"].to_numpy())

        from twotower_tpu.data.vocab import Vocabulary

        ours = Vocabulary.build(from_dataframe(df).user_id)
        np.testing.assert_array_equal(
            ours.ids.astype(str), vocab.users.ids.astype(str)
        )
        np.testing.assert_array_equal(ours.counts, vocab.users.counts)

    def test_migrated_dir_is_a_complete_prepared_dir(self, tmp_path):
        """The reference switch-over journey with zero manual file moves:
        migrate-reference-artifacts output feeds train-model
        --prepared-dir directly (parquet copied in, stats sidecar
        written, vocab manifest loadable by PreparedDataset)."""
        from twotower_tpu.data.migrate import main as migrate_main
        from twotower_tpu.data.prepared import PreparedDataset

        mp, pq, df = self._reference_artifacts(tmp_path)
        out = tmp_path / "migrated"
        rc = migrate_main(
            ["--mappings", str(mp), "--interactions", str(pq),
             "--output-dir", str(out)]
        )
        assert rc == 0
        report = json.loads((out / "migration_report.json").read_text())
        assert report["prepared_dir_ready"] is True

        ds = PreparedDataset(out, batch_rows=64)
        assert ds.num_rows == len(df)
        assert (ds.num_users, ds.num_items) == (20, 10)
        rule = ds.temporal_rule(0.8, 0.1)
        splits = ds.load_splits(rule, ("train", "val", "test"))
        assert sum(len(s["user_idx"]) for s in splits.values()) == len(df)
        # Encoded columns round-trip through the migrated vocab.
        np.testing.assert_array_equal(
            np.sort(np.unique(splits["train"]["user_idx"])),
            np.unique(splits["train"]["user_idx"]),
        )
        assert ds.log_q().shape == (10,)

    def test_unsorted_mapping_not_marked_prepared_ready(self, tmp_path):
        from twotower_tpu.data.migrate import main as migrate_main

        mp, pq, _ = self._reference_artifacts(tmp_path, sorted_ids=False)
        out = tmp_path / "migrated"
        rc = migrate_main(
            ["--mappings", str(mp), "--interactions", str(pq),
             "--output-dir", str(out)]
        )
        assert rc == 0
        report = json.loads((out / "migration_report.json").read_text())
        assert report["prepared_dir_ready"] is False
        assert not (out / "combined_interactions.parquet").exists()

    def test_unsorted_mapping_flagged_but_migrates(self, tmp_path):
        from twotower_tpu.data.migrate import main as migrate_main
        from twotower_tpu.data.vocab import VocabPair

        mp, pq, df = self._reference_artifacts(tmp_path, sorted_ids=False)
        out = tmp_path / "migrated_unsorted"
        rc = migrate_main(
            ["--mappings", str(mp), "--interactions", str(pq),
             "--output-dir", str(out)]
        )
        assert rc == 0
        report = json.loads((out / "migration_report.json").read_text())
        assert report["sorted_contiguous"] is False
        # Order is preserved from the pickle, so the reference's columns
        # still row-align with the migrated vocab.
        vocab = VocabPair.load(out / "vocab")
        enc = vocab.users.encode(df["user_id"].to_numpy(object))
        np.testing.assert_array_equal(enc, df["user_idx"].to_numpy())

    def test_mismatched_artifacts_rejected(self, tmp_path):
        from twotower_tpu.data.migrate import main as migrate_main

        mp, pq, df = self._reference_artifacts(tmp_path)
        import pickle

        with open(mp, "rb") as f:
            mappings = pickle.load(f)
        del mappings["user_to_idx"][next(iter(mappings["user_to_idx"]))]
        # Re-index densely so the failure is the cross-check, not density.
        mappings["user_to_idx"] = {
            u: i for i, u in enumerate(sorted(mappings["user_to_idx"]))
        }
        with open(mp, "wb") as f:
            pickle.dump(mappings, f)
        rc = migrate_main(
            ["--mappings", str(mp), "--interactions", str(pq),
             "--output-dir", str(tmp_path / "bad")]
        )
        assert rc == 1

    def test_counts_optional_without_parquet(self, tmp_path):
        from twotower_tpu.data.migrate import main as migrate_main
        from twotower_tpu.data.vocab import VocabPair

        mp, _, df = self._reference_artifacts(tmp_path)
        out = tmp_path / "no_counts"
        rc = migrate_main(["--mappings", str(mp), "--output-dir", str(out)])
        assert rc == 0
        vocab = VocabPair.load(out / "vocab")
        assert len(vocab.users) == df["user_id"].nunique()
        assert (vocab.users.counts == 0).all()
