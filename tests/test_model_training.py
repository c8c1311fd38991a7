"""Model + training-loop tests: shapes, determinism, learning, early stopping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from twotower_tpu.config import Config
from twotower_tpu.data import BatchPipeline, Preprocessor, generate_interactions
from twotower_tpu.evaluation import Evaluator, metrics_at_k, rank_of_true_item
from twotower_tpu.models import two_tower
from twotower_tpu.training import EarlyStopping, Trainer


class TestModel:
    def test_shapes_and_padding(self, tiny_config):
        cfg = tiny_config.model
        params = two_tower.init_params(jax.random.PRNGKey(0), cfg, 100, 50)
        assert params["user_embedding"].shape == (128, cfg.embedding_dim)
        assert params["item_embedding"].shape == (128, cfg.embedding_dim)
        u = two_tower.embed_users(params, jnp.arange(10), cfg)
        v = two_tower.embed_items(params, jnp.arange(10), cfg)
        assert u.shape == (10, cfg.output_dim)
        assert v.shape == (10, cfg.output_dim)

    def test_normalized_outputs(self, tiny_config):
        cfg = tiny_config.model
        params = two_tower.init_params(jax.random.PRNGKey(0), cfg, 100, 50)
        u = two_tower.embed_users(params, jnp.arange(32), cfg)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(u), axis=1), 1.0, rtol=1e-4
        )

    def test_eval_mode_deterministic(self, tiny_config):
        cfg = tiny_config.model
        params = two_tower.init_params(jax.random.PRNGKey(0), cfg, 100, 50)
        a = two_tower.embed_users(params, jnp.arange(8), cfg, train=False)
        b = two_tower.embed_users(params, jnp.arange(8), cfg, train=False)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_dropout_active_in_train(self, tiny_config):
        cfg = tiny_config.model
        params = two_tower.init_params(jax.random.PRNGKey(0), cfg, 100, 50)
        r1, r2 = jax.random.split(jax.random.PRNGKey(1))
        a = two_tower.embed_users(params, jnp.arange(8), cfg, train=True, dropout_rng=r1)
        b = two_tower.embed_users(params, jnp.arange(8), cfg, train=True, dropout_rng=r2)
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_embed_item_table_matches_batched(self, tiny_config):
        cfg = tiny_config.model
        params = two_tower.init_params(jax.random.PRNGKey(0), cfg, 100, 50)
        table = two_tower.embed_item_table(params, cfg, 50, chunk_size=16)
        direct = two_tower.embed_items(params, jnp.arange(50), cfg)
        assert table.shape == (50, cfg.output_dim)
        np.testing.assert_allclose(np.asarray(table), np.asarray(direct), rtol=2e-2, atol=2e-2)


class TestMetrics:
    def test_rank_of_true_item(self):
        topk = jnp.asarray([[3, 1, 2], [9, 9, 9], [5, 6, 0]])
        true = jnp.asarray([1, 4, 0])
        np.testing.assert_array_equal(np.asarray(rank_of_true_item(topk, true)), [1, 3, 2])

    def test_metrics_at_k_golden(self):
        # ranks: 0, 1, miss
        topk = jnp.asarray([[0, 1], [2, 3], [4, 5]])
        true = jnp.asarray([0, 3, 9])
        m = metrics_at_k(topk, true, (1, 2))
        np.testing.assert_allclose(float(m["recall@1"]), 1 / 3, rtol=1e-6)
        np.testing.assert_allclose(float(m["recall@2"]), 2 / 3, rtol=1e-6)
        expected_ndcg2 = (1.0 + 1.0 / np.log2(3)) / 3
        np.testing.assert_allclose(float(m["ndcg@2"]), expected_ndcg2, rtol=1e-4)
        np.testing.assert_allclose(float(m["mrr"]), (1.0 + 0.5) / 3, rtol=1e-4)


class TestTraining:
    def _setup(self, tiny_config):
        cfg = tiny_config.with_overrides(
            {"training.epochs": 6, "training.log_every_steps": 1000}
        )
        # affinity_scale=3 keeps the oracle recall@10 ceiling high (~0.68)
        # under the honest mixture generator (at scale=1 it is 0.29, putting
        # a 2x-random bar at the Bayes limit of the data itself).
        data = generate_interactions(
            num_users=300, num_items=120, num_interactions=8000, noise=0.2,
            affinity_scale=3.0,
        )
        pp = Preprocessor(cfg.preprocessing)
        data = pp.process(data)
        splits = pp.split_data(data)
        return cfg, pp, splits

    def test_loss_decreases_and_learns(self, tiny_config):
        cfg, pp, splits = self._setup(tiny_config)
        log_q = np.log(pp.vocab.items.frequencies + 1e-12)
        ev = Evaluator(cfg, len(pp.vocab.items), batch_size=256)
        trainer = Trainer(
            cfg,
            log_q=log_q,
            evaluate_fn=ev.make_evaluate_fn(splits.val.user_idx, splits.val.item_idx),
        )
        state = trainer.init_state(len(pp.vocab.users), len(pp.vocab.items))
        pipe = BatchPipeline(splits.train, cfg.training.batch_size)
        res = trainer.fit(state, pipe)
        losses = [h["loss"] for h in res.history if "loss" in h]
        assert losses[-1] < losses[0]
        # latent-structure synthetic data: model must beat random by far
        # (deterministic seed; measured 0.195 vs the 0.167 bar)
        random_recall = 10 / len(pp.vocab.items)
        assert res.best_metric > 2 * random_recall
        # Throughput decomposition: e2e <= train-phase (train time excludes
        # eval/checkpoint), and steady-state is the best epoch's rate.
        assert 0 < res.examples_per_sec <= res.train_examples_per_sec
        per_epoch = [h["examples_per_sec"] for h in res.history]
        assert res.steady_examples_per_sec == pytest.approx(max(per_epoch))

    def test_dropped_ids_surfaces_as_warning(self, caplog):
        """a2a capacity overflow must WARN the operator, not hide in a
        metric (VERDICT r03 UX): dropped rows silently lose gradients."""
        import logging

        from twotower_tpu.training.loop import warn_dropped_ids

        with caplog.at_level(logging.WARNING, logger="twotower_tpu"):
            warn_dropped_ids({"dropped_ids": 0.0, "loss": 1.0}, epoch=0, step=1)
            assert not caplog.records
            warn_dropped_ids({"dropped_ids": 3.0, "loss": 1.0}, epoch=0, step=2)
        assert any("a2a_capacity_factor" in r.message for r in caplog.records)

    def test_strided_subsample(self):
        """--val-rows cap (full-corpus-scale runs): deterministic, evenly
        spread over the index range (a temporal split stays representative),
        identity when the cap covers the split."""
        from twotower_tpu.training.train import strided_subsample

        sel = strided_subsample(1_000_000, 1000)
        assert len(sel) == 1000
        assert sel[0] == 0 and sel[-1] == 999_999
        assert np.all(np.diff(sel) > 0)  # strictly increasing, no dups
        # evenly spread: stride variance is at most one index
        strides = np.diff(sel)
        assert strides.max() - strides.min() <= 1
        np.testing.assert_array_equal(sel, strided_subsample(1_000_000, 1000))
        np.testing.assert_array_equal(strided_subsample(10, 50), np.arange(10))
        np.testing.assert_array_equal(strided_subsample(10, 10), np.arange(10))

    def test_train_cli_val_rows_cap(self, tmp_path, monkeypatch):
        """--val-rows subsamples per-epoch validation without touching the
        final full-split metrics path (train CLI e2e, tiny synthetic)."""
        from twotower_tpu.evaluation.evaluator import Evaluator
        from twotower_tpu.training.train import main as train_main

        bound_sizes = []
        orig = Evaluator.make_evaluate_fn

        def spy(self, user_idx, item_idx):
            bound_sizes.append(len(user_idx))
            return orig(self, user_idx, item_idx)

        monkeypatch.setattr(Evaluator, "make_evaluate_fn", spy)
        rc = train_main(
            [
                "--synthetic", "--synthetic-users", "120",
                "--synthetic-items", "60",
                "--synthetic-interactions", "3000",
                "--checkpoint-dir", str(tmp_path / "ckpt"),
                "--val-rows", "64",
                "--override", "training.epochs=1",
                "training.batch_size=64", "model.embedding_dim=16",
                "model.user_tower_dims=[16]", "model.item_tower_dims=[16]",
                "preprocessing.min_interactions_per_user=2",
                "preprocessing.min_interactions_per_item=2",
            ]
        )
        assert rc == 0
        # the per-epoch validation hook was bound to exactly the capped
        # subsample (the full held-out split is larger)
        assert bound_sizes == [64]

    def test_finalize_throughput(self):
        from twotower_tpu.training.loop import TrainResult

        res = TrainResult(state=None)
        res.history = [
            {"epoch": 0.0, "examples_per_sec": 100.0},
            {"epoch": 1.0, "examples_per_sec": 400.0},
        ]
        res.finalize_throughput(examples_seen=1000, train_time=4.0, total_time=10.0)
        assert res.examples_per_sec == pytest.approx(100.0)
        assert res.train_examples_per_sec == pytest.approx(250.0)
        assert res.steady_examples_per_sec == pytest.approx(400.0)
        # No per-epoch records -> steady falls back to the train-phase rate.
        empty = TrainResult(state=None)
        empty.finalize_throughput(examples_seen=1000, train_time=4.0, total_time=10.0)
        assert empty.steady_examples_per_sec == pytest.approx(250.0)

    @pytest.mark.slow
    def test_golden_seeded_recall_band(self):
        """Pinned synthetic-affinity golden run (VERDICT r1 item 7).

        The offline stand-in for the unreachable Amazon metric parity
        (BASELINE.md Recall@10 0.34): a fixed-seed latent-factor dataset
        trained for 5 epochs must land best recall@10 inside a band pinned
        from a reference run (0.181 on CPU, jax 0.9.x) — catching
        training-QUALITY regressions, not just numeric-parity regressions.
        Random recall@10 here is 0.05; the band floor is ~3x random.
        """
        cfg = Config().with_overrides(
            {
                "model.embedding_dim": 32,
                "model.user_tower_dims": [64, 32],
                "model.item_tower_dims": [64, 32],
                "training.epochs": 5,
                "training.batch_size": 256,
                "training.log_every_steps": 10000,
            }
        )
        data = generate_interactions(
            num_users=400, num_items=200, num_interactions=12000, noise=0.2, seed=42
        )
        pp = Preprocessor(cfg.preprocessing)
        data = pp.process(data)
        splits = pp.split_data(data)
        log_q = np.log(pp.vocab.items.frequencies + 1e-12)
        ev = Evaluator(cfg, len(pp.vocab.items), batch_size=256)
        trainer = Trainer(
            cfg,
            log_q=log_q,
            evaluate_fn=ev.make_evaluate_fn(splits.val.user_idx, splits.val.item_idx),
        )
        state = trainer.init_state(len(pp.vocab.users), len(pp.vocab.items))
        pipe = BatchPipeline(splits.train, cfg.training.batch_size)
        res = trainer.fit(state, pipe)
        assert 0.14 < res.best_metric < 0.23, (
            f"golden recall@10 {res.best_metric:.4f} outside pinned band "
            "(reference run: 0.181)"
        )

    def test_small_corpus_not_padded_to_full_chunk(self, tiny_config):
        """Exact-mode auto chunking clamps to the corpus size (ADVICE r03):
        a 120-item corpus must encode to ~120 rows, not a 131072-row
        pre-pad that streams 1000x more matmul work per eval batch."""
        import jax

        from twotower_tpu.models import two_tower

        cfg, pp, splits = self._setup(tiny_config)
        num_items = len(pp.vocab.items)
        params = two_tower.init_params(
            jax.random.PRNGKey(3), cfg.model, len(pp.vocab.users), num_items
        )
        ev = Evaluator(cfg, num_items, batch_size=256)  # eval_exact default
        assert ev.corpus_chunk_size <= -(-num_items // 64) * 64
        corpus = ev._encode_corpus(params)
        assert corpus.shape[0] < num_items + 64
        # and the clamped evaluator still scores correctly
        m = ev.evaluate(params, splits.val.user_idx, splits.val.item_idx)
        assert 0.0 <= m["recall@10"] <= 1.0

    def test_segment_steps_matches_per_step_loop(self, tiny_config):
        """training.segment_steps (scan S stacked batches per dispatch) must
        follow the same trajectory as per-step dispatch: same seeded
        pipeline, same rng folding by state.step — with a segment size that
        does NOT divide the epoch's batch count (tail segment retrace)."""
        from twotower_tpu.data import BatchPipeline

        cfg, pp, splits = self._setup(tiny_config)
        cfg = cfg.with_overrides({"training.epochs": 2})
        nu, ni = len(pp.vocab.users), len(pp.vocab.items)
        log_q = np.log(pp.vocab.items.frequencies + 1e-12)
        results = {}
        for seg in (0, 6):
            c = cfg.with_overrides({"training.segment_steps": seg})
            trainer = Trainer(c, log_q=log_q, num_items=ni)
            state = trainer.init_state(nu, ni)
            pipe = BatchPipeline(splits.train, c.training.batch_size)
            assert seg == 0 or len(pipe) % seg != 0  # exercise the tail
            results[seg] = trainer.fit(state, pipe)
        import jax

        p0 = jax.device_get(results[0].state.params)
        p5 = jax.device_get(results[6].state.params)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-6, atol=2e-7),
            p0, p5,
        )
        assert int(results[0].state.step) == int(results[6].state.step)

    @pytest.mark.parametrize("exact", [True, False])
    def test_eval_scan_matches_per_batch_loop(self, tiny_config, exact):
        """The device-resident lax.scan evaluation (single metrics fetch)
        must reproduce the per-batch host loop bit-for-bit in both search
        modes, including the ragged final batch."""
        import jax

        from twotower_tpu.models import two_tower

        cfg, pp, splits = self._setup(tiny_config)
        cfg = cfg.with_overrides({"retrieval.eval_exact": exact})
        num_items = len(pp.vocab.items)
        params = two_tower.init_params(
            jax.random.PRNGKey(3), cfg.model, len(pp.vocab.users), num_items
        )
        # batch 256 over a ~600-row split: >1 scan step + a ragged tail
        u, it = splits.val.user_idx, splits.val.item_idx
        scan_ev = Evaluator(cfg, num_items, batch_size=256)
        m_scan = scan_ev.evaluate(params, u, it)
        assert scan_ev._scan_ok is True
        loop_ev = Evaluator(cfg, num_items, batch_size=256)
        loop_ev._scan_ok = False  # force the per-batch fallback path
        m_loop = loop_ev.evaluate(params, u, it)
        assert set(m_scan) == set(m_loop)
        for key in m_scan:
            assert m_scan[key] == pytest.approx(m_loop[key], abs=1e-6), key

    def test_eval_scan_segmentation_matches(self, tiny_config):
        """Time-budgeted scan segmentation (the 60 s watchdog fix): a
        near-zero budget forces many small segments whose host-merged
        metrics must match the single-program scan and the per-batch
        loop. batch 32 over a ~600-row split => ~19 batches: probes +
        multiple segments + zero-weight padded tail."""
        import jax

        from twotower_tpu.models import two_tower

        cfg, pp, splits = self._setup(tiny_config)
        num_items = len(pp.vocab.items)
        params = two_tower.init_params(
            jax.random.PRNGKey(3), cfg.model, len(pp.vocab.users), num_items
        )
        u, it = splits.val.user_idx, splits.val.item_idx
        seg_ev = Evaluator(
            cfg.with_overrides({"retrieval.eval_scan_budget_s": 1e-9}),
            num_items, batch_size=32,
        )
        m_seg = seg_ev.evaluate(params, u, it)
        assert seg_ev._scan_ok is True
        one_ev = Evaluator(
            cfg.with_overrides({"retrieval.eval_scan_budget_s": 0}),
            num_items, batch_size=32,
        )
        m_one = one_ev.evaluate(params, u, it)
        for key in m_one:
            assert m_seg[key] == pytest.approx(m_one[key], rel=1e-5), key

    def test_plan_segments(self):
        # 100 batches at 2 s/batch under a 30 s budget, 8 already probed:
        # 92 remaining -> S_max 15 -> 7 segments of ceil(92/7)=14
        assert Evaluator.plan_segments(100, 2.0, 30.0, 8) == (14, 7)
        # everything fits one segment
        assert Evaluator.plan_segments(20, 0.001, 30.0, 8) == (12, 1)
        # nothing left after the probes
        assert Evaluator.plan_segments(8, 2.0, 30.0, 8) == (0, 0)
        # pathological: per-batch slower than the whole budget -> capped
        # near probe size (evenly split, never zero)
        s, n = Evaluator.plan_segments(20, 120.0, 30.0, 8)
        assert (s, n) == (6, 2)

    def test_bf16_eval_corpus_matches_f32_within_tolerance(self, tiny_config):
        """retrieval.eval_corpus_dtype=bfloat16 (approx validation mode,
        half the eval-corpus HBM) must produce metrics within bf16 noise
        of the f32 approx evaluator, and the config must refuse bf16 with
        the exact evaluator (which promises f32-precision scores)."""
        import jax

        from twotower_tpu.models import two_tower

        cfg, pp, splits = self._setup(tiny_config)
        num_items = len(pp.vocab.items)
        params = two_tower.init_params(
            jax.random.PRNGKey(3), cfg.model, len(pp.vocab.users), num_items
        )
        base = cfg.with_overrides({"retrieval.eval_exact": False})
        m32 = Evaluator(base, num_items, batch_size=256).evaluate(
            params, splits.val.user_idx, splits.val.item_idx
        )
        m16 = Evaluator(
            base.with_overrides({"retrieval.eval_corpus_dtype": "bfloat16"}),
            num_items,
            batch_size=256,
        ).evaluate(params, splits.val.user_idx, splits.val.item_idx)
        assert set(m32) == set(m16)
        for key in m32:
            assert abs(m32[key] - m16[key]) < 0.02, (key, m32[key], m16[key])

        with pytest.raises(ValueError, match="eval_exact"):
            cfg.with_overrides(
                {"retrieval.eval_corpus_dtype": "bfloat16"}
            )  # eval_exact defaults True
        with pytest.raises(ValueError, match="eval_corpus_dtype"):
            cfg.with_overrides({"retrieval.eval_corpus_dtype": "fp8"})

    def test_early_stopping(self):
        es = EarlyStopping(patience=2)
        assert es.update(0.5, 1) is False
        assert es.update(0.4, 2) is False
        # Keras convention: exactly `patience` non-improving rounds stop.
        assert es.update(0.4, 3) is True
        assert es.best == 0.5 and es.best_step == 1


class TestLrSchedule:
    def test_cosine_decay_shared_by_dense_and_sparse(self):
        """training.decay_steps: one warmup+cosine schedule drives both the
        optax chain and the sparse lazy-Adam rows (single source of
        truth), ending at 1% of peak."""
        import numpy as np

        from twotower_tpu.config import Config
        from twotower_tpu.training.sparse import make_lr_fn
        from twotower_tpu.training.state import _lr_schedule

        cfg = Config().with_overrides(
            {"training.warmup_steps": 10, "training.decay_steps": 90,
             "training.learning_rate": 0.01}
        )
        sched = _lr_schedule(cfg.training)
        fn = make_lr_fn(cfg.training)
        for step in (0, 5, 10, 50, 100, 200):
            assert float(fn(step)) == pytest.approx(float(sched(step)))
        assert float(sched(0)) == 0.0
        assert float(sched(10)) == pytest.approx(0.01)
        assert float(sched(100)) == pytest.approx(1e-4, rel=1e-3)
        assert float(sched(55)) < 0.01  # decaying mid-way
        # constant config unchanged
        c2 = Config()
        f2 = make_lr_fn(c2.training)
        assert float(f2(0)) == float(f2(1000)) == pytest.approx(
            c2.training.learning_rate
        )
