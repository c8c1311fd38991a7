"""Oracle-teacher generation + exact Bayes-ceiling evaluation
(data/synthetic_scale.py --oracle, evaluation/oracle.py — VERDICT r4 #1)."""

import json

import numpy as np
import pytest

from twotower_tpu.data import synthetic_scale as sc
from twotower_tpu.evaluation.oracle import (
    OracleTeacher,
    exact_ranks,
    metrics_from_ranks,
)


@pytest.fixture(scope="module")
def oracle_corpus(tmp_path_factory):
    out = tmp_path_factory.mktemp("oracle_gen")
    stats = sc.generate_parquet(
        out,
        num_interactions=40_000,
        num_users=300,
        num_items=200,
        num_clusters=16,
        latent_dim=8,
        chunk_rows=10_000,
        rows_per_file=50_000,
        seed=7,
        use_jax=False,
        oracle=True,
    )
    return out, stats


class TestOracleGeneration:
    def test_teacher_artifact_written(self, oracle_corpus):
        out, stats = oracle_corpus
        assert (out / "oracle_teacher.npz").exists()
        assert stats["params"]["oracle"] is True
        t = OracleTeacher(out / "oracle_teacher.npz")
        assert t.num_users == 300 and t.num_items == 200
        # log_pop is a proper within-cluster distribution
        for c in range(16):
            mask = t.item_cluster == c
            np.testing.assert_allclose(
                np.exp(t.log_pop[mask].astype(np.float64)).sum(), 1.0,
                rtol=1e-5,
            )
        # cluster mass sums to 1
        np.testing.assert_allclose(t.cluster_mass.sum(), 1.0, rtol=1e-5)

    def test_empirical_law_matches_teacher(self, oracle_corpus):
        """The sampled corpus must follow the closed-form P(i|u): compare
        empirical per-item counts for the heaviest users' pooled draws
        against the teacher probabilities (chi-square-ish loose bound)."""
        import pyarrow.parquet as pq

        out, stats = oracle_corpus
        t = OracleTeacher(out / "oracle_teacher.npz")
        tables = [pq.read_table(out / f) for f in stats["files"]]
        users = np.concatenate(
            [np.char.lstrip(np.asarray(tb.column("user_id"), str), "U").astype(int)
             for tb in tables]
        )
        items = np.concatenate(
            [np.char.lstrip(np.asarray(tb.column("parent_asin"), str), "I").astype(int)
             for tb in tables]
        )
        # Pool all rows: the marginal item law is mean_u P(i|u) over the
        # uniform user draw — compare against the empirical marginal.
        scores = t.item_scores(np.arange(t.num_users))
        marginal = np.exp(scores.astype(np.float64))
        marginal = marginal.mean(axis=0)
        marginal /= marginal.sum()
        emp = np.bincount(items, minlength=t.num_items).astype(np.float64)
        emp /= emp.sum()
        # head items carry enough counts for a tight-ish comparison
        head = np.argsort(-marginal)[:20]
        np.testing.assert_allclose(emp[head], marginal[head], rtol=0.25)
        # distribution-level agreement: total variation well under random
        tv = 0.5 * np.abs(emp - marginal).sum()
        assert tv < 0.15, tv

    def test_exact_ranks_match_bruteforce(self, oracle_corpus):
        out, _ = oracle_corpus
        t = OracleTeacher(out / "oracle_teacher.npz")
        rng = np.random.default_rng(0)
        u = rng.integers(0, t.num_users, 64)
        i = rng.integers(0, t.num_items, 64).astype(np.int64)
        ranks = exact_ranks(t, u, i, batch_size=16, chunk=64)
        scores = t.item_scores(u)
        for r in range(64):
            s = scores[r]
            st = s[i[r]]
            expect = int(
                (s > st).sum() + ((s == st) & (np.arange(len(s)) < i[r])).sum()
            )
            assert ranks[r] == expect, r

    def test_metrics_from_ranks_formulas(self):
        rank = np.array([0, 4, 9, 10, 250])
        m = metrics_from_ranks(rank, (1, 5, 10), mrr_cap=10)
        assert m["recall@1"] == pytest.approx(0.2)
        assert m["recall@5"] == pytest.approx(0.4)
        assert m["recall@10"] == pytest.approx(0.6)
        assert m["mrr"] == pytest.approx((1.0 + 1 / 5 + 1 / 10) / 5)

    def test_teacher_beats_random_by_construction(self, oracle_corpus):
        """Ceiling sanity: on rows SAMPLED from the teacher, the teacher
        ranker must dominate a random ranker by a wide margin."""
        import pyarrow.parquet as pq

        out, stats = oracle_corpus
        t = OracleTeacher(out / "oracle_teacher.npz")
        tb = pq.read_table(out / stats["files"][0])
        users = np.char.lstrip(
            np.asarray(tb.column("user_id"), str), "U"
        ).astype(int)[:4000]
        items = np.char.lstrip(
            np.asarray(tb.column("parent_asin"), str), "I"
        ).astype(int)[:4000]
        ranks = exact_ranks(t, users, items, batch_size=1024)
        m = metrics_from_ranks(ranks, (10,))
        random_r10 = 10 / t.num_items
        assert m["recall@10"] > 5 * random_r10

    def test_plugin_skyline_approaches_teacher_with_data(self, oracle_corpus):
        """The plug-in skyline (teacher's family fitted to samples) must
        approach the exact teacher as data grows — it is the
        achievable-from-data yardstick the parity report uses."""
        import pyarrow.parquet as pq

        from twotower_tpu.evaluation.oracle import plugin_ranks

        out, stats = oracle_corpus
        t = OracleTeacher(out / "oracle_teacher.npz")
        tables = [pq.read_table(out / f) for f in stats["files"]]
        users = np.concatenate([
            np.char.lstrip(np.asarray(tb.column("user_id"), str), "U").astype(int)
            for tb in tables
        ])
        items = np.concatenate([
            np.char.lstrip(np.asarray(tb.column("parent_asin"), str), "I").astype(int)
            for tb in tables
        ])
        # holdout = last 4000 rows; train = the rest (36k draws, 120/user)
        tr_u, tr_i = users[:-4000], items[:-4000]
        te_u, te_i = users[-4000:], items[-4000:]
        exact = metrics_from_ranks(
            exact_ranks(t, te_u, te_i, batch_size=1024), (10,)
        )
        plug = metrics_from_ranks(
            plugin_ranks(t, tr_u, tr_i, te_u, te_i, batch_size=1024), (10,)
        )
        # with ~120 draws/user over 16 clusters the fitted mixture is sharp
        assert plug["recall@10"] >= 0.8 * exact["recall@10"], (plug, exact)
