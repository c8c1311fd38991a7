"""Tests: feature engineering parity, Amazon loader (mocked HF, like the
reference's tests — reference tests/unit/test_amazon_loader.py:65 patches
load_dataset), and the prepare/download/explore data CLIs offline."""

import json
from unittest.mock import MagicMock, patch

import numpy as np
import pandas as pd
import pytest

from twotower_tpu.config import DatasetConfig
from twotower_tpu.data.amazon import AmazonReviewsLoader, AmazonReviewsValidator
from twotower_tpu.data.schema import Interactions
from twotower_tpu.features.engineer import FeatureEngineer


@pytest.fixture()
def small_interactions() -> Interactions:
    # Two users, three items; known timestamps (2021-01-01 + offsets).
    base = 1609459200  # Fri 2021-01-01 00:00:00 UTC
    return Interactions(
        user_id=np.array(["u1", "u1", "u2", "u2", "u1"], object),
        item_id=np.array(["i1", "i2", "i1", "i3", "i3"], object),
        rating=np.array([5, 3, 4, 1, 2], np.float32),
        timestamp=np.array(
            [base, base + 86400, base + 2 * 86400, base + 3 * 86400, base + 90000],
            np.int64,
        ),
        text=np.array(["Great!", "ok", "LOVE IT!!", "bad?", ""], object),
        title=np.array(["a", "b", "c", "d", "e"], object),
    )


class TestFeatureEngineer:
    def test_temporal(self, small_interactions):
        fe = FeatureEngineer()
        out = fe.create_temporal_features(small_interactions)
        assert out.extra["year"].tolist() == [2021] * 5
        assert out.extra["month"].tolist() == [1] * 5
        assert out.extra["day"].tolist() == [1, 2, 3, 4, 2]
        # 2021-01-01 is a Friday -> dayofweek 4 (pandas Mon=0 convention)
        assert out.extra["day_of_week"][0] == 4
        # Jan 1 2021 Fri, Jan 2 Sat, Jan 3 Sun, Jan 4 Mon, Jan 2 Sat
        assert out.extra["is_weekend"].tolist() == [0, 1, 1, 0, 1]
        assert out.extra["days_since_start"].tolist() == [0, 1, 2, 3, 1]
        ref = pd.to_datetime(small_interactions.timestamp, unit="s")
        np.testing.assert_array_equal(out.extra["day_of_week"], ref.dayofweek.values)

    def test_text(self, small_interactions):
        out = FeatureEngineer().create_text_features(small_interactions)
        assert out.extra["text_length"].tolist() == [6, 2, 9, 4, 0]
        assert out.extra["text_exclamation_count"].tolist() == [1, 0, 2, 0, 0]
        assert out.extra["text_question_count"].tolist() == [0, 0, 0, 1, 0]
        assert out.extra["text_word_count"].tolist() == [1, 1, 2, 1, 0]
        np.testing.assert_allclose(out.extra["text_caps_ratio"][2], 6 / 9, rtol=1e-6)

    def test_user_aggregates(self, small_interactions):
        out = FeatureEngineer().create_user_features(small_interactions)
        # u1 has ratings [5, 3, 2]; u2 has [4, 1]
        assert out.extra["user_rating_count"].tolist() == [3, 3, 2, 2, 3]
        np.testing.assert_allclose(out.extra["user_rating_mean"][0], 10 / 3, rtol=1e-6)
        np.testing.assert_allclose(out.extra["user_rating_mean"][2], 2.5, rtol=1e-6)
        assert out.extra["user_rating_min"].tolist() == [2, 2, 1, 1, 2]
        assert out.extra["user_rating_max"].tolist() == [5, 5, 4, 4, 5]

    def test_item_aggregates_with_meta(self, small_interactions):
        meta = {
            "parent_asin": np.array(["i1", "i3"], object),
            "main_category": np.array(["Beauty", "Games"], object),
            "average_rating": np.array([4.5, 2.0]),
            "rating_number": np.array([10, 5]),
        }
        out = FeatureEngineer().create_item_features(small_interactions, meta)
        # i1 rated by both users: [5, 4]
        assert out.extra["item_rating_count"].tolist() == [2, 1, 2, 2, 2]
        assert out.extra["item_main_category"][0] == "Beauty"
        assert out.extra["item_main_category"][1] == ""  # i2 not in meta
        np.testing.assert_allclose(out.extra["item_average_rating"][3], 2.0)

    def test_engineer_features_all(self, small_interactions):
        out = FeatureEngineer().engineer_features(small_interactions)
        for col in ("year", "text_length", "user_rating_mean", "item_rating_count"):
            assert col in out.extra

    def test_matches_pandas_groupby(self, rng):
        # Golden check of the bincount aggregation against pandas.
        n = 500
        users = rng.choice([f"u{i}" for i in range(40)], n)
        data = Interactions(
            user_id=users.astype(object),
            item_id=rng.choice([f"i{i}" for i in range(30)], n).astype(object),
            rating=rng.integers(1, 6, n).astype(np.float32),
            timestamp=rng.integers(1.5e9, 1.7e9, n).astype(np.int64),
        )
        out = FeatureEngineer().create_user_features(data)
        df = pd.DataFrame({"u": data.user_id, "r": data.rating})
        g = df.groupby("u")["r"]
        np.testing.assert_allclose(
            out.extra["user_rating_mean"],
            df["u"].map(g.mean()).values,
            rtol=1e-5,
        )
        np.testing.assert_array_equal(
            out.extra["user_rating_count"], df["u"].map(g.count()).values
        )


def _fake_reviews_df():
    return pd.DataFrame(
        {
            "user_id": ["u1", "u2", "u1"],
            "parent_asin": ["a1", "a2", "a2"],
            "rating": [5.0, 3.0, 4.0],
            "title": ["t1", "t2", "t3"],
            "text": ["good", "bad", "fine"],
            "timestamp": [1600000000000, 1600000010000, 1600000020000],
        }
    )


class TestValidator:
    def test_valid_frame(self):
        r = AmazonReviewsValidator().validate(_fake_reviews_df())
        assert r.ok and not r.warnings

    def test_missing_columns(self):
        r = AmazonReviewsValidator().validate(pd.DataFrame({"user_id": []}))
        assert not r.ok

    def test_bad_ratings_warn(self):
        df = _fake_reviews_df()
        df.loc[0, "rating"] = 9.0
        r = AmazonReviewsValidator().validate(df)
        assert r.ok and any("outside" in w for w in r.warnings)

    def test_duplicates_warn(self):
        df = _fake_reviews_df()
        df.loc[1, ["user_id", "parent_asin"]] = ["u1", "a1"]
        r = AmazonReviewsValidator().validate(df)
        assert any("duplicate" in w for w in r.warnings)


class TestAmazonLoader:
    def _mock_dataset(self, df):
        ds = MagicMock()
        ds.__getitem__.return_value.to_pandas.return_value = df
        return ds

    def test_download_and_cache(self, tmp_path):
        loader = AmazonReviewsLoader(DatasetConfig(cache_dir=str(tmp_path)))
        with patch("datasets.load_dataset") as mock_ld:
            mock_ld.return_value = self._mock_dataset(_fake_reviews_df())
            df1 = loader.load_category("All_Beauty")
            assert mock_ld.call_count == 1
            # Second load hits the parquet cache: no new download.
            df2 = loader.load_category("All_Beauty")
            assert mock_ld.call_count == 1
        assert len(df1) == len(df2) == 3
        assert (tmp_path / "All_Beauty_reviews.parquet").exists()

    def test_sampling_deterministic(self, tmp_path):
        loader = AmazonReviewsLoader(DatasetConfig(cache_dir=str(tmp_path), seed=42))
        big = pd.concat([_fake_reviews_df()] * 10, ignore_index=True)
        with patch("datasets.load_dataset") as mock_ld:
            mock_ld.return_value = self._mock_dataset(big)
            a = loader.load_category("X", sample_size=5)
        b = loader.load_category("X", sample_size=5)  # cache path
        assert a.index.tolist() == b.index.tolist()

    def test_multi_category_fault_tolerant(self, tmp_path):
        loader = AmazonReviewsLoader(DatasetConfig(cache_dir=str(tmp_path)))

        def side_effect(source, config, **kw):
            if "Bad" in config:
                raise RuntimeError("network down")
            return self._mock_dataset(_fake_reviews_df())

        with patch("datasets.load_dataset", side_effect=side_effect):
            out = loader.load_multiple_categories(["Good", "Bad_One"])
        assert set(out) == {"Good"}

    def test_load_concats_with_category_column(self, tmp_path):
        cfg = DatasetConfig(cache_dir=str(tmp_path), categories=["A", "B"])
        loader = AmazonReviewsLoader(cfg)
        with patch("datasets.load_dataset") as mock_ld:
            mock_ld.return_value = self._mock_dataset(_fake_reviews_df())
            df = loader.load()
        assert len(df) == 6
        assert set(df["category"]) == {"A", "B"}

    def test_statistics(self, tmp_path):
        loader = AmazonReviewsLoader(DatasetConfig(cache_dir=str(tmp_path)))
        with patch("datasets.load_dataset") as mock_ld:
            mock_ld.return_value = self._mock_dataset(_fake_reviews_df())
            stats = loader.get_dataset_statistics("All_Beauty")
        assert stats["num_reviews"] == 3
        assert stats["num_users"] == 2
        assert stats["date_range"][0].startswith("2020")


class TestDataCLIs:
    def _write_raw(self, tmp_path, n=400):
        rng = np.random.default_rng(0)
        df = pd.DataFrame(
            {
                "user_id": rng.choice([f"u{i}" for i in range(30)], n),
                "parent_asin": rng.choice([f"a{i}" for i in range(20)], n),
                "rating": rng.integers(1, 6, n).astype(float),
                "timestamp": rng.integers(1.5e9, 1.7e9, n),
                "text": ["some review text here ok"] * n,
                "title": ["t"] * n,
            }
        )
        (tmp_path / "raw").mkdir()
        df.to_parquet(tmp_path / "raw" / "TestCat_5core.parquet")
        return df

    def test_prepare_then_explore(self, tmp_path):
        from twotower_tpu.data.explore import main as explore_main
        from twotower_tpu.data.prepare import main as prepare_main

        self._write_raw(tmp_path)
        rc = prepare_main(
            [
                "--data-dir", str(tmp_path / "raw"),
                "--output-dir", str(tmp_path / "out"),
                "--features",
                "--override",
                "preprocessing.min_interactions_per_user=2",
                "preprocessing.min_interactions_per_item=2",
                "preprocessing.filtering.min_text_length=1",
            ]
        )
        assert rc == 0
        out = tmp_path / "out"
        assert (out / "combined_interactions.parquet").exists()
        assert (out / "vocab" / "user_vocab.npz").exists()
        stats = json.loads((out / "dataset_stats.json").read_text())
        assert stats["num_interactions"] > 0

        df = pd.read_parquet(out / "combined_interactions.parquet")
        assert {"user_idx", "item_idx", "user_rating_mean"} <= set(df.columns)

        rc = explore_main(
            ["--data-dir", str(tmp_path / "raw"), "--output-dir", str(tmp_path / "eda")]
        )
        assert rc == 0
        assert (tmp_path / "eda" / "eda_summary.csv").exists()

    def test_prepared_artifact_feeds_training(self, tmp_path):
        from twotower_tpu.data.prepare import main as prepare_main
        from twotower_tpu.training.train import main as train_main

        self._write_raw(tmp_path)
        prepare_main(
            [
                "--data-dir", str(tmp_path / "raw"),
                "--output-dir", str(tmp_path / "out"),
                "--override",
                "preprocessing.min_interactions_per_user=2",
                "preprocessing.min_interactions_per_item=2",
                "preprocessing.filtering.min_text_length=1",
            ]
        )
        rc = train_main(
            [
                "--data", str(tmp_path / "out" / "combined_interactions.parquet"),
                "--checkpoint-dir", str(tmp_path / "ckpt"),
                "--no-eval",
                "--override", "training.epochs=1", "training.batch_size=32",
                "model.embedding_dim=16", "model.user_tower_dims=[16]",
                "model.item_tower_dims=[16]",
                "preprocessing.min_interactions_per_user=1",
                "preprocessing.min_interactions_per_item=1",
                "preprocessing.filtering.min_text_length=1",
            ]
        )
        assert rc == 0

    def test_download_kcore_mocked(self, tmp_path):
        from twotower_tpu.data.download import main as download_main

        ds = MagicMock()
        ds.keys.return_value = ["train", "valid", "test"]
        ds.__getitem__.return_value.to_pandas.return_value = _fake_reviews_df()
        with patch("datasets.load_dataset", return_value=ds):
            rc = download_main(
                [
                    "--categories", "All_Beauty",
                    "--output-dir", str(tmp_path / "dl"),
                    "--mode", "kcore", "--combine",
                ]
            )
        assert rc == 0
        assert (tmp_path / "dl" / "All_Beauty_5core.parquet").exists()
        assert (tmp_path / "dl" / "combined_5core.parquet").exists()
        report = json.loads((tmp_path / "dl" / "download_report.json").read_text())
        assert report["All_Beauty"]["rows"] == 9

    def test_download_discover_mocked(self, capsys):
        from twotower_tpu.data.download import main as download_main

        sib = lambda name: MagicMock(rfilename=name)  # noqa: E731
        info = MagicMock(
            siblings=[
                sib("raw/review_categories/All_Beauty.jsonl"),
                sib("raw/review_categories/Video_Games.jsonl"),
                sib("raw/meta_categories/All_Beauty.jsonl"),  # not a review cat
            ]
        )
        with patch("huggingface_hub.HfApi") as api:
            api.return_value.dataset_info.return_value = info
            rc = download_main(["--discover"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["categories"] == ["All_Beauty", "Video_Games"]


class TestOrchestratePipeline:
    """orchestrate-pipeline: the reference README's quick-start entry point
    (README.md:33-35 references scripts/data_processing/orchestrate_pipeline.py,
    which its tree never shipped). download -> prepare as ONE resumable run."""

    _OVERRIDES = [
        "--override",
        "preprocessing.min_interactions_per_user=2",
        "preprocessing.min_interactions_per_item=2",
        "preprocessing.filtering.min_text_length=1",
    ]

    def _rich_df(self, n=400):
        rng = np.random.default_rng(0)
        return pd.DataFrame(
            {
                "user_id": rng.choice([f"u{i}" for i in range(30)], n),
                "parent_asin": rng.choice([f"a{i}" for i in range(20)], n),
                "rating": rng.integers(1, 6, n).astype(float),
                "timestamp": rng.integers(1.5e9, 1.7e9, n) * 1000,
                "text": ["some review text here ok"] * n,
                "title": ["t"] * n,
            }
        )

    def _run(self, tmp_path, extra=()):
        from twotower_tpu.data.orchestrate import main as orchestrate_main

        ds = MagicMock()
        ds.keys.return_value = ["train"]
        ds.__getitem__.return_value.to_pandas.return_value = self._rich_df()
        with patch("datasets.load_dataset", return_value=ds):
            rc = orchestrate_main(
                [
                    "--raw-dir", str(tmp_path / "raw"),
                    "--processed-dir", str(tmp_path / "proc"),
                    "--categories", "All_Beauty",
                    "--mode", "kcore",
                    *extra,
                    *self._OVERRIDES,
                ]
            )
        report = json.loads(
            (tmp_path / "proc" / "pipeline_report.json").read_text()
        )
        return rc, report

    def test_full_pipeline_then_resume_skips(self, tmp_path):
        rc, report = self._run(tmp_path)
        assert rc == 0 and report["ok"]
        assert report["stages"]["download"]["status"] == "ok"
        assert report["stages"]["prepare"]["status"] == "ok"
        proc = tmp_path / "proc"
        assert (proc / "combined_interactions.parquet").exists()
        assert (proc / "vocab" / "user_vocab.npz").exists()
        df = pd.read_parquet(proc / "combined_interactions.parquet")
        assert {"user_idx", "item_idx"} <= set(df.columns) and len(df) > 0

        # Second run: both stages detect their artifacts and skip.
        rc, report = self._run(tmp_path)
        assert rc == 0 and report["ok"]
        assert report["stages"]["download"]["status"] == "skipped"
        assert report["stages"]["prepare"]["status"] == "skipped"

        # --force rebuilds even with artifacts present.
        rc, report = self._run(tmp_path, extra=("--force",))
        assert rc == 0
        assert report["stages"]["prepare"]["status"] == "ok"

    def test_skip_download_offline(self, tmp_path):
        from twotower_tpu.data.orchestrate import main as orchestrate_main

        (tmp_path / "raw").mkdir()
        self._rich_df().to_parquet(tmp_path / "raw" / "Books_5core.parquet")
        rc = orchestrate_main(
            [
                "--skip-download",
                "--raw-dir", str(tmp_path / "raw"),
                "--processed-dir", str(tmp_path / "proc"),
                *self._OVERRIDES,
            ]
        )
        assert rc == 0
        assert (tmp_path / "proc" / "combined_interactions.parquet").exists()

    def test_skip_download_without_data_fails(self, tmp_path):
        from twotower_tpu.data.orchestrate import main as orchestrate_main

        rc = orchestrate_main(
            [
                "--skip-download",
                "--raw-dir", str(tmp_path / "empty"),
                "--processed-dir", str(tmp_path / "proc"),
            ]
        )
        assert rc == 1
