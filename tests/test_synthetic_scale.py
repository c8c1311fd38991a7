"""Tests for the out-of-core synthetic corpus generator.

The config-3 lifecycle run (PARITY.md) depends on these properties: the
shards must satisfy the prepare-data input contract, be deterministic,
temporally ordered, power-law skewed, and actually drift over time.
"""

from pathlib import Path

import numpy as np
import pytest

from twotower_tpu.data import schema
from twotower_tpu.data.synthetic_scale import ClusterCatalog, generate_parquet

pq = pytest.importorskip("pyarrow.parquet")


def _generate(tmp_path, **kw):
    params = dict(
        num_interactions=120_000,
        num_users=8_000,
        num_items=6_000,
        num_clusters=64,
        chunk_rows=25_000,
        rows_per_file=50_000,
        use_jax=False,
    )
    params.update(kw)
    out = tmp_path / "corpus"
    stats = generate_parquet(out, **params)
    import pandas as pd

    df = pd.concat(
        [pq.read_table(out / f).to_pandas() for f in stats["files"]],
        ignore_index=True,
    )
    return stats, df


def test_schema_contract_and_order(tmp_path):
    stats, df = _generate(tmp_path)
    # prepare-data input contract: required columns, parseable by the shared
    # schema normalizer
    inter = schema.from_dataframe(df)
    assert len(inter) == stats["num_interactions"] == 120_000
    assert (np.diff(df["timestamp"].to_numpy()) >= 0).all()
    assert df["rating"].between(1, 5).all()
    # shard split honors rows_per_file
    assert len(stats["files"]) == 3  # 120k rows / 50k per file


def test_deterministic(tmp_path):
    _, df1 = _generate(tmp_path / "a")
    _, df2 = _generate(tmp_path / "b")
    assert df1.equals(df2)


def test_power_law_and_kcore_survival(tmp_path):
    stats, df = _generate(tmp_path)
    counts = df["parent_asin"].value_counts().to_numpy()
    # strong head (top 1% of items carries >5% of interactions) ...
    top = counts[: max(1, len(counts) // 100)].sum()
    assert top / len(df) > 0.05
    # ... but the tail still mostly survives a 5-core filter: >=60% of
    # touched items have >=5 interactions (the within-cluster law is
    # calibrated to keep the post-k-core catalog near the nominal size)
    assert (counts >= 5).mean() > 0.6
    # catalog growth: some items exist only late
    assert stats["items_touched"] <= stats["num_items"]


def test_temporal_drift(tmp_path):
    _, df = _generate(tmp_path)
    n = len(df)
    head = df.iloc[: n // 4]["parent_asin"].value_counts()
    tail = df.iloc[-n // 4 :]["parent_asin"].value_counts()
    top_head = set(head.head(20).index)
    top_tail = set(tail.head(20).index)
    # era rank rotation + catalog growth: the popularity head moves between
    # the first and last quarter of the time range
    assert len(top_head & top_tail) < 15


def test_cluster_catalog_partition():
    rng = np.random.default_rng(0)
    cat = ClusterCatalog(1000, 16, rng)
    sizes = cat.cluster_sizes()
    assert sizes.sum() == 1000
    assert (sizes >= 1).all()
    # item ids are a permutation: every item belongs to exactly one cluster
    assert np.array_equal(np.sort(cat.item_of_slot), np.arange(1000))
    # catalog growth monotone per cluster
    a = cat.alive_counts(0.5)
    b = cat.alive_counts(1.0)
    assert (b >= a).all() and (b == sizes).all()
