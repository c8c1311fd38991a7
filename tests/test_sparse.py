"""Sparse-table update tests: dedup correctness and exact first-step (and
same-support multi-step) equivalence with the dense optax Adam path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from twotower_tpu.models import two_tower
from twotower_tpu.training import TrainState, make_optimizer
from twotower_tpu.training.loop import make_step_fn
from twotower_tpu.training.sparse import (
    dedup_rows,
    make_sparse_step_fn,
    split_params,
)


class TestDedupRows:
    def test_unique_ids(self):
        ids = jnp.asarray([3, 1, 7], jnp.int32)
        grads = jnp.asarray([[1.0], [2.0], [3.0]])
        targets, summed, valid = dedup_rows(ids, grads, dead=99)
        assert valid.sum() == 3
        got = {int(t): float(s) for t, s, v in zip(targets, summed[:, 0], valid) if v}
        assert got == {1: 2.0, 3: 1.0, 7: 3.0}

    def test_duplicates_summed(self):
        ids = jnp.asarray([5, 5, 5, 2], jnp.int32)
        grads = jnp.asarray([[1.0], [10.0], [100.0], [7.0]])
        targets, summed, valid = dedup_rows(ids, grads, dead=99)
        assert int(valid.sum()) == 2
        got = {int(t): float(s) for t, s, v in zip(targets, summed[:, 0], valid) if v}
        assert got == {2: 7.0, 5: 111.0}
        # invalid rows aim at the dead row
        assert all(int(t) == 99 for t, v in zip(targets, valid) if not v)

    def test_valid_targets_unique(self):
        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(0, 20, 64), jnp.int32)
        grads = jnp.asarray(rng.normal(size=(64, 4)), jnp.float32)
        targets, _, valid = dedup_rows(ids, grads, dead=1000)
        tv = np.asarray(targets)[np.asarray(valid)]
        assert len(tv) == len(set(tv.tolist()))


def _setup(tiny_config, sparse: bool, text: bool = False):
    over = {
        "training.sparse_table_updates": sparse,
        "model.dropout_rate": 0.0,
    }
    if text:
        over.update({"model.text_buckets": 256, "model.text_tokens": 4})
    cfg = tiny_config.with_overrides(over)
    num_users, num_items = 300, 200
    optimizer = make_optimizer(cfg.training)
    params = two_tower.init_params(jax.random.PRNGKey(0), cfg.model, num_users, num_items)
    state = (
        TrainState.create_sparse(params, optimizer)
        if sparse
        else TrainState.create(params, optimizer)
    )
    rng = np.random.default_rng(1)
    bs = cfg.training.batch_size
    batch = {
        "user_idx": jnp.asarray(rng.integers(0, num_users, bs), jnp.int32),
        "item_idx": jnp.asarray(rng.integers(0, num_items, bs), jnp.int32),
        "weight": jnp.ones((bs,), jnp.float32),
    }
    tokens = None
    if text:
        tokens = jnp.asarray(rng.integers(0, 256, (num_items, 4)), jnp.int32)
    return cfg, optimizer, params, state, batch, tokens


class TestSparseStepEquivalence:
    def test_first_step_matches_dense(self, tiny_config):
        cfg_d, opt_d, params, state_d, batch, _ = _setup(tiny_config, sparse=False)
        cfg_s, opt_s, _, state_s, _, _ = _setup(tiny_config, sparse=True)
        rng = jax.random.PRNGKey(3)

        dense_step = make_step_fn(cfg_d, opt_d)
        sparse_step = make_sparse_step_fn(cfg_s, opt_s)
        new_d, m_d = dense_step(state_d, batch, rng)
        new_s, m_s = sparse_step(state_s, batch, rng)

        np.testing.assert_allclose(float(m_s["loss"]), float(m_d["loss"]), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(new_s.params["user_tower"][0]["kernel"]),
            np.asarray(new_d.params["user_tower"][0]["kernel"]),
            rtol=1e-5, atol=1e-7,
        )
        for table in ("user_embedding", "item_embedding"):
            np.testing.assert_allclose(
                np.asarray(new_s.params[table]),
                np.asarray(new_d.params[table]),
                rtol=1e-4, atol=1e-6,
            )

    def test_multi_step_same_batch_matches_dense(self, tiny_config):
        # When the same rows are touched every step, lazy == dense Adam.
        cfg_d, opt_d, _, state_d, batch, _ = _setup(tiny_config, sparse=False)
        cfg_s, opt_s, _, state_s, _, _ = _setup(tiny_config, sparse=True)
        rng = jax.random.PRNGKey(3)
        dense_step = jax.jit(make_step_fn(cfg_d, opt_d))
        sparse_step = jax.jit(make_sparse_step_fn(cfg_s, opt_s))
        for _ in range(3):
            state_d, _ = dense_step(state_d, batch, rng)
            state_s, _ = sparse_step(state_s, batch, rng)
        np.testing.assert_allclose(
            np.asarray(state_s.params["item_embedding"]),
            np.asarray(state_d.params["item_embedding"]),
            rtol=1e-3, atol=1e-5,
        )

    def test_untouched_rows_unchanged(self, tiny_config):
        cfg, opt, params, state, batch, _ = _setup(tiny_config, sparse=True)
        step = make_sparse_step_fn(cfg, opt)
        new_state, _ = step(state, batch, jax.random.PRNGKey(0))
        touched = set(np.asarray(batch["user_idx"]).tolist())
        untouched = [i for i in range(300) if i not in touched][:20]
        np.testing.assert_array_equal(
            np.asarray(new_state.params["user_embedding"])[untouched],
            np.asarray(params["user_embedding"])[untouched],
        )

    def test_sparse_with_text_table(self, tiny_config):
        cfg, opt, params, state, batch, tokens = _setup(
            tiny_config, sparse=True, text=True
        )
        step = make_sparse_step_fn(cfg, opt)
        new_state, metrics = step(state, batch, jax.random.PRNGKey(0), None, tokens)
        assert np.isfinite(float(metrics["loss"]))
        # text table changed on touched buckets
        assert not np.allclose(
            np.asarray(new_state.params["text_embedding"]),
            np.asarray(params["text_embedding"]),
        )

    def test_sparse_learns(self, tiny_config):
        from twotower_tpu.data import BatchPipeline, Preprocessor, generate_interactions
        from twotower_tpu.evaluation import Evaluator
        from twotower_tpu.training import Trainer

        cfg = tiny_config.with_overrides(
            {"training.epochs": 6, "training.log_every_steps": 1000,
             "training.sparse_table_updates": True}
        )
        # affinity_scale=3 keeps the oracle recall@10 ceiling high (~0.68)
        # under the honest mixture generator; at scale=1 the ceiling is 0.29
        # and a 2x-random bar would sit at the Bayes limit.
        data = generate_interactions(num_users=300, num_items=120,
                                     num_interactions=8000, noise=0.2,
                                     affinity_scale=3.0)
        pp = Preprocessor(cfg.preprocessing)
        data = pp.process(data)
        splits = pp.split_data(data)
        ev = Evaluator(cfg, len(pp.vocab.items), batch_size=256)
        trainer = Trainer(
            cfg,
            log_q=np.log(pp.vocab.items.frequencies + 1e-12),
            evaluate_fn=ev.make_evaluate_fn(splits.val.user_idx, splits.val.item_idx),
        )
        state = trainer.init_state(len(pp.vocab.users), len(pp.vocab.items))
        assert state.table_state is not None
        res = trainer.fit(state, BatchPipeline(splits.train, cfg.training.batch_size))
        assert res.best_metric > 2 * 10 / len(pp.vocab.items)


class TestUniformSampling:
    def test_dense_uniform_step(self, tiny_config):
        cfg, opt, params, state, batch, _ = _setup(tiny_config, sparse=False)
        cfg = cfg.with_overrides(
            {"retrieval.candidate_sampling": "uniform", "retrieval.num_negatives": 64}
        )
        step = make_step_fn(cfg, make_optimizer(cfg.training), num_items=200)
        new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))
        assert "logits_mean" in metrics

    def test_sparse_uniform_step_updates_negative_rows(self, tiny_config):
        cfg, opt, params, state, batch, _ = _setup(tiny_config, sparse=True)
        cfg = cfg.with_overrides(
            {"retrieval.candidate_sampling": "uniform", "retrieval.num_negatives": 64}
        )
        step = make_sparse_step_fn(cfg, opt, num_items=200)
        new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))
        # more item rows changed than just the batch positives (negatives too)
        changed = ~np.all(
            np.isclose(
                np.asarray(new_state.params["item_embedding"]),
                np.asarray(params["item_embedding"]),
            ),
            axis=1,
        )
        positives = len(set(np.asarray(batch["item_idx"]).tolist()))
        assert changed.sum() > positives

    def test_uniform_requires_num_items(self, tiny_config):
        cfg, opt, *_ = _setup(tiny_config, sparse=True)
        cfg = cfg.with_overrides({"retrieval.candidate_sampling": "uniform"})
        with pytest.raises(ValueError):
            make_sparse_step_fn(cfg, opt)

    def test_uniform_trainer_learns(self, tiny_config):
        from twotower_tpu.data import BatchPipeline, Preprocessor, generate_interactions
        from twotower_tpu.evaluation import Evaluator
        from twotower_tpu.training import Trainer

        cfg = tiny_config.with_overrides(
            {"training.epochs": 6, "training.log_every_steps": 1000,
             "retrieval.candidate_sampling": "uniform",
             "retrieval.num_negatives": 128}
        )
        data = generate_interactions(num_users=300, num_items=120,
                                     num_interactions=8000, noise=0.2,
                                     affinity_scale=3.0)
        pp = Preprocessor(cfg.preprocessing)
        data = pp.process(data)
        splits = pp.split_data(data)
        ev = Evaluator(cfg, len(pp.vocab.items), batch_size=256)
        trainer = Trainer(
            cfg,
            num_items=len(pp.vocab.items),
            evaluate_fn=ev.make_evaluate_fn(splits.val.user_idx, splits.val.item_idx),
        )
        state = trainer.init_state(len(pp.vocab.users), len(pp.vocab.items))
        res = trainer.fit(state, BatchPipeline(splits.train, cfg.training.batch_size))
        assert res.best_metric > 2 * 10 / len(pp.vocab.items)


class TestPackedMoments:
    def test_packed_matches_reference_update(self):
        from twotower_tpu.training.sparse import (
            adam_row_update,
            adam_row_update_packed,
            dedup_rows,
        )

        rng = np.random.default_rng(0)
        n, e, b = 256, 16, 64
        table = jnp.asarray(rng.normal(size=(n, e)), jnp.float32)
        mu = jnp.asarray(rng.normal(size=(n, e)) * 0.01, jnp.float32)
        nu = jnp.asarray(np.abs(rng.normal(size=(n, e))) * 0.01, jnp.float32)
        ids = jnp.asarray(rng.integers(0, n - 1, b), jnp.int32)
        grads = jnp.asarray(rng.normal(size=(b, e)), jnp.float32)
        targets, summed, valid = dedup_rows(ids, grads, n - 1)
        kw = dict(lr=jnp.float32(1e-3), b1=0.9, b2=0.999, eps=1e-8,
                  step=jnp.int32(5))
        rt, rmu, rnu = adam_row_update(table, mu, nu, targets, summed, valid, **kw)
        pt, pmo = adam_row_update_packed(
            table, jnp.concatenate([mu, nu], axis=1), targets, summed, valid, **kw
        )
        np.testing.assert_allclose(np.asarray(pt), np.asarray(rt), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(pmo[:, :e]), np.asarray(rmu), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(pmo[:, e:]), np.asarray(rnu), rtol=1e-6)


class TestMixedSampling:
    def test_sparse_matches_dense_first_step(self, tiny_config):
        """Mixed sampling: sparse row-update path == dense full-table path
        (same neg-RNG fold chain, so the sampled negatives are identical)."""
        over = {
            "retrieval.candidate_sampling": "mixed",
            "retrieval.num_negatives": 64,
        }
        cfg_d, opt_d, params, state_d, batch, _ = _setup(tiny_config, sparse=False)
        cfg_s, opt_s, _, state_s, _, _ = _setup(tiny_config, sparse=True)
        cfg_d, cfg_s = cfg_d.with_overrides(over), cfg_s.with_overrides(over)
        rng = jax.random.PRNGKey(3)
        log_q = jnp.log(jnp.full((200,), 1.0 / 200.0, jnp.float32))

        dense_step = make_step_fn(cfg_d, opt_d, num_items=200)
        sparse_step = make_sparse_step_fn(cfg_s, opt_s, num_items=200)
        new_d, m_d = dense_step(state_d, batch, rng, log_q)
        new_s, m_s = sparse_step(state_s, batch, rng, log_q)

        np.testing.assert_allclose(float(m_s["loss"]), float(m_d["loss"]), rtol=1e-5)
        for table in ("user_embedding", "item_embedding"):
            np.testing.assert_allclose(
                np.asarray(new_s.params[table]),
                np.asarray(new_d.params[table]),
                rtol=1e-4, atol=1e-6, err_msg=table,
            )

    def test_sparse_mixed_updates_negative_rows(self, tiny_config):
        cfg, opt, params, state, batch, _ = _setup(tiny_config, sparse=True)
        cfg = cfg.with_overrides(
            {"retrieval.candidate_sampling": "mixed", "retrieval.num_negatives": 64}
        )
        step = make_sparse_step_fn(cfg, opt, num_items=200)
        new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))
        changed = ~np.all(
            np.isclose(
                np.asarray(new_state.params["item_embedding"]),
                np.asarray(params["item_embedding"]),
            ),
            axis=1,
        )
        positives = len(set(np.asarray(batch["item_idx"]).tolist()))
        assert changed.sum() > positives

    def test_mixed_requires_num_items(self, tiny_config):
        cfg, opt, *_ = _setup(tiny_config, sparse=True)
        cfg = cfg.with_overrides({"retrieval.candidate_sampling": "mixed"})
        with pytest.raises(ValueError):
            make_sparse_step_fn(cfg, opt)


class TestHostDedup:
    """Host-precomputed dedup (training/host_dedup.py): same targets/valid
    as the in-device dedup, summed grads equal up to f32 summation order,
    and the augmented step matches the plain step."""

    def test_matches_device_dedup(self):
        from twotower_tpu.training.host_dedup import dedup_host

        rng = np.random.default_rng(0)
        ids_np = rng.integers(0, 40, 256).astype(np.int32)  # heavy duplicates
        grads = jnp.asarray(rng.normal(size=(256, 8)), jnp.float32)
        t_d, s_d, v_d = dedup_rows(jnp.asarray(ids_np), grads, dead=99)
        t_h, seg, v_h = dedup_host(ids_np, dead=99)
        np.testing.assert_array_equal(np.asarray(t_d), t_h)
        np.testing.assert_array_equal(np.asarray(v_d), v_h)
        summed_h = jnp.zeros_like(grads).at[jnp.asarray(seg)].add(grads)
        np.testing.assert_allclose(
            np.asarray(s_d) * np.asarray(v_d)[:, None],
            np.asarray(summed_h) * v_h[:, None],
            rtol=1e-5, atol=1e-6,
        )

    def _augment(self, batch, params, *, items: bool):
        from twotower_tpu.models.two_tower import dead_row
        from twotower_tpu.training.host_dedup import augment_batch

        out = augment_batch(
            {k: np.asarray(v) for k, v in batch.items()},
            user_dead=dead_row(params["user_embedding"]),
            item_dead=dead_row(params["item_embedding"]) if items else None,
        )
        return {k: jnp.asarray(v) for k, v in out.items()}

    def test_step_matches_plain(self, tiny_config):
        cfg, opt, params, state, batch, _ = _setup(tiny_config, sparse=True)
        cfg2, opt2, _, state2, _, _ = _setup(tiny_config, sparse=True)
        step = make_sparse_step_fn(cfg, opt)
        aug = self._augment(batch, params, items=True)
        new_a, m_a = step(state, aug, jax.random.PRNGKey(3))
        new_p, m_p = step(state2, batch, jax.random.PRNGKey(3))
        np.testing.assert_allclose(float(m_a["loss"]), float(m_p["loss"]), rtol=1e-6)
        np.testing.assert_allclose(
            float(m_a["grad_norm"]), float(m_p["grad_norm"]), rtol=1e-5
        )
        for name in ("user_embedding", "item_embedding"):
            np.testing.assert_allclose(
                np.asarray(new_a.params[name]),
                np.asarray(new_p.params[name]),
                rtol=1e-4, atol=5e-5,
            )

    def test_sampled_negative_modes_ignore_item_precompute(self, tiny_config):
        # uniform/mixed: item grads include device-sampled negatives the
        # host never saw — the i_* keys must be ignored, u_* still used.
        for mode in ("uniform", "mixed"):
            cfg, opt, params, state, batch, _ = _setup(tiny_config, sparse=True)
            cfg = cfg.with_overrides(
                {"retrieval.candidate_sampling": mode, "retrieval.num_negatives": 32}
            )
            _, _, _, state2, _, _ = _setup(tiny_config, sparse=True)
            step = make_sparse_step_fn(cfg, opt, num_items=200)
            aug = self._augment(batch, params, items=True)
            new_a, m_a = step(state, aug, jax.random.PRNGKey(3))
            new_p, m_p = step(state2, batch, jax.random.PRNGKey(3))
            np.testing.assert_allclose(
                float(m_a["loss"]), float(m_p["loss"]), rtol=1e-6
            )
            np.testing.assert_allclose(
                np.asarray(new_a.params["item_embedding"]),
                np.asarray(new_p.params["item_embedding"]),
                rtol=1e-4, atol=5e-5,
            )

    def test_trainer_integration(self, tiny_config):
        """Trainer.fit with host_dedup on/off converges to close params —
        the augmentation is wired through the epoch iterator + prefetcher."""
        from twotower_tpu.data.pipeline import BatchPipeline
        from twotower_tpu.training.loop import Trainer

        rng = np.random.default_rng(7)
        n = 512
        users = rng.integers(0, 50, n).astype(np.int32)
        items = rng.integers(0, 40, n).astype(np.int32)

        finals = {}
        for flag in (True, False):
            cfg = tiny_config.with_overrides(
                {
                    "training.host_dedup": flag,
                    "training.epochs": 2,
                    "training.batch_size": 64,
                    "model.dropout_rate": 0.0,
                }
            )
            trainer = Trainer(cfg)
            state = trainer.init_state(50, 40)
            from dataclasses import dataclass

            @dataclass
            class Cols:
                user_idx: np.ndarray
                item_idx: np.ndarray

            pipe = BatchPipeline(Cols(users, items), 64, seed=5)
            result = trainer.fit(state, pipe)
            finals[flag] = np.asarray(result.state.params["user_embedding"])
            assert np.isfinite(result.history[-1]["loss"])
        np.testing.assert_allclose(finals[True], finals[False], rtol=2e-3, atol=2e-4)

    def test_wants_host_dedup_gating(self, tiny_config):
        from twotower_tpu.training.host_dedup import wants_host_dedup

        cfg = tiny_config
        assert wants_host_dedup(cfg, None)
        assert not wants_host_dedup(cfg, object())  # mesh path: owner-side dedup
        off = cfg.with_overrides({"training.host_dedup": False})
        assert not wants_host_dedup(off, None)
        dense = cfg.with_overrides({"training.sparse_table_updates": False})
        assert not wants_host_dedup(dense, None)
