"""Sharded SPARSE train-step tests on the 8-device virtual CPU mesh.

The flagship distributed path (parallel/sparse_spmd.py) must compute the
SAME numbers as the single-device sparse step (training/sparse.py) for every
(data x model) factorization of the mesh — sharding is a layout change, not
a numerics change. Covers duplicates in the batch, log-Q correction,
zero-weight padding rows, the text tower, and the dropped-id metric.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from twotower_tpu.models import two_tower
from twotower_tpu.parallel import build_mesh, make_sharded_train_step, shard_state
from twotower_tpu.parallel.sharding import batch_shardings, replicated
from twotower_tpu.training import TrainState, make_optimizer, make_train_step


@pytest.fixture(scope="module")
def devices():
    d = jax.devices()
    if len(d) < 8:
        pytest.skip("needs 8 virtual devices")
    return d[:8]


NUM_USERS, NUM_ITEMS = 300, 200


def _setup(tiny_config, n_model, *, text=False, seed=0):
    overrides = {
        "mesh.num_model": n_model,
        "model.dropout_rate": 0.0,
        # sparse updates ON — this is the point of these tests
        "training.sparse_table_updates": True,
    }
    if text:
        overrides |= {"model.text_buckets": 256, "model.text_tokens": 4}
    cfg = tiny_config.with_overrides(overrides)
    optimizer = make_optimizer(cfg.training)
    params = two_tower.init_params(
        jax.random.PRNGKey(seed), cfg.model, NUM_USERS, NUM_ITEMS
    )
    state = TrainState.for_config(params, optimizer, cfg)
    rng = np.random.default_rng(1)
    bs = cfg.training.batch_size
    user_idx = rng.integers(0, NUM_USERS, bs).astype(np.int32)
    item_idx = rng.integers(0, NUM_ITEMS, bs).astype(np.int32)
    item_idx[3] = item_idx[17]  # cross-shard duplicate positives
    user_idx[2] = user_idx[30]
    weight = np.ones(bs, np.float32)
    weight[-2:] = 0.0  # padding rows
    batch = {
        "user_idx": jnp.asarray(user_idx),
        "item_idx": jnp.asarray(item_idx),
        "weight": jnp.asarray(weight),
    }
    log_q = np.log(rng.uniform(0.01, 1.0, NUM_ITEMS)).astype(np.float32)
    return cfg, optimizer, state, batch, log_q


def _assert_state_close(new_state, ref_state, *, rtol=1e-4, atol=1e-6):
    np.testing.assert_allclose(
        np.asarray(new_state.params["user_tower"][0]["kernel"]),
        np.asarray(ref_state.params["user_tower"][0]["kernel"]),
        rtol=rtol, atol=atol,
    )
    for t in ("user_embedding", "item_embedding"):
        np.testing.assert_allclose(
            np.asarray(new_state.params[t]),
            np.asarray(ref_state.params[t]),
            rtol=rtol, atol=atol, err_msg=t,
        )
        np.testing.assert_allclose(
            np.asarray(new_state.table_state[t]["moments"]),
            np.asarray(ref_state.table_state[t]["moments"]),
            rtol=rtol, atol=atol, err_msg=f"{t} moments",
        )


class TestSparseShardedStep:
    @pytest.mark.parametrize("n_model", [1, 2, 4, 8])
    def test_matches_single_device_sparse_step(self, tiny_config, devices, n_model):
        cfg, optimizer, state, batch, log_q = _setup(tiny_config, n_model)
        rng = jax.random.PRNGKey(7)

        ref_step = make_train_step(cfg, optimizer, log_q, donate=False)
        ref_state, ref_metrics = ref_step(state, batch, rng)

        mesh = build_mesh(cfg.mesh, devices)
        sharded = shard_state(mesh, state, cfg.mesh, sparse_mesh=True)
        step = make_sharded_train_step(
            cfg, optimizer, mesh, sharded, log_q, donate=False
        )
        b_sh = batch_shardings(mesh, cfg.mesh)
        dev_batch = {k: jax.device_put(v, b_sh) for k, v in batch.items()}
        new_state, metrics = step(
            sharded, dev_batch, jax.device_put(rng, replicated(mesh))
        )

        np.testing.assert_allclose(
            float(metrics["loss"]), float(ref_metrics["loss"]), rtol=2e-5
        )
        np.testing.assert_allclose(
            float(metrics["accuracy"]), float(ref_metrics["accuracy"]), atol=1e-6
        )
        np.testing.assert_allclose(
            float(metrics["grad_norm"]), float(ref_metrics["grad_norm"]), rtol=1e-4
        )
        assert float(metrics["dropped_ids"]) == 0.0
        _assert_state_close(new_state, ref_state)

    def test_multi_step_stays_in_sync(self, tiny_config, devices):
        """Three consecutive steps (state threading, step counter, lr
        schedule) stay numerically aligned with the single-device path."""
        cfg, optimizer, state, batch, log_q = _setup(tiny_config, 2)
        rng = jax.random.PRNGKey(3)
        ref_step = make_train_step(cfg, optimizer, log_q, donate=False)
        mesh = build_mesh(cfg.mesh, devices)
        sharded = shard_state(mesh, state, cfg.mesh, sparse_mesh=True)
        step = make_sharded_train_step(
            cfg, optimizer, mesh, sharded, log_q, donate=False
        )
        b_sh = batch_shardings(mesh, cfg.mesh)
        dev_batch = {k: jax.device_put(v, b_sh) for k, v in batch.items()}
        dev_rng = jax.device_put(rng, replicated(mesh))

        ref_state = state
        for _ in range(3):
            ref_state, ref_metrics = ref_step(ref_state, batch, rng)
            sharded, metrics = step(sharded, dev_batch, dev_rng)
        np.testing.assert_allclose(
            float(metrics["loss"]), float(ref_metrics["loss"]), rtol=5e-5
        )
        # Adam's 1/sqrt(nu) amplifies step-1 f32 reduction-order noise over
        # consecutive steps; single-step parity is the tight check above.
        _assert_state_close(sharded, ref_state, rtol=5e-3, atol=5e-4)

    def test_text_tower_parity(self, tiny_config, devices):
        cfg, optimizer, state, batch, log_q = _setup(tiny_config, 4, text=True)
        rng = jax.random.PRNGKey(11)
        trng = np.random.default_rng(5)
        tokens = trng.integers(1, 256, (NUM_ITEMS, 4)).astype(np.int32)

        ref_step = make_train_step(
            cfg, optimizer, log_q, item_tokens=tokens, donate=False
        )
        ref_state, ref_metrics = ref_step(state, batch, rng)

        mesh = build_mesh(cfg.mesh, devices)
        sharded = shard_state(mesh, state, cfg.mesh, sparse_mesh=True)
        step = make_sharded_train_step(
            cfg, optimizer, mesh, sharded, log_q, item_tokens=tokens, donate=False
        )
        b_sh = batch_shardings(mesh, cfg.mesh)
        dev_batch = {k: jax.device_put(v, b_sh) for k, v in batch.items()}
        new_state, metrics = step(
            sharded, dev_batch, jax.device_put(rng, replicated(mesh))
        )
        np.testing.assert_allclose(
            float(metrics["loss"]), float(ref_metrics["loss"]), rtol=2e-5
        )
        _assert_state_close(new_state, ref_state)
        np.testing.assert_allclose(
            np.asarray(new_state.params["text_embedding"]),
            np.asarray(ref_state.params["text_embedding"]),
            rtol=1e-4, atol=1e-6,
        )

    def test_tight_capacity_reports_drops(self, tiny_config, devices):
        """A pathologically skewed batch with a tight capacity factor must
        surface nonzero dropped_ids instead of silently corrupting."""
        cfg, optimizer, state, batch, log_q = _setup(
            tiny_config.with_overrides({"training.batch_size": 128}), 2
        )
        cfg = cfg.with_overrides({"mesh.a2a_capacity_factor": 1.0})
        # All items the same -> every item id routes to one owner shard;
        # per-peer slice (16 ids) exceeds the factor-1.0 bucket (8).
        batch = dict(batch)
        batch["item_idx"] = jnp.zeros_like(batch["item_idx"])
        mesh = build_mesh(cfg.mesh, devices)
        sharded = shard_state(mesh, state, cfg.mesh, sparse_mesh=True)
        step = make_sharded_train_step(
            cfg, optimizer, mesh, sharded, log_q, donate=False
        )
        b_sh = batch_shardings(mesh, cfg.mesh)
        dev_batch = {k: jax.device_put(v, b_sh) for k, v in batch.items()}
        _, metrics = step(
            sharded, dev_batch,
            jax.device_put(jax.random.PRNGKey(0), replicated(mesh)),
        )
        assert float(metrics["dropped_ids"]) > 0

    def test_trainer_fit_sparse_on_mesh(self, tiny_config, devices):
        from twotower_tpu.data import BatchPipeline, Preprocessor, generate_interactions
        from twotower_tpu.training import Trainer

        cfg = tiny_config.with_overrides(
            {"training.epochs": 2, "training.log_every_steps": 1000,
             "mesh.num_model": 2, "training.sparse_table_updates": True}
        )
        data = generate_interactions(num_users=200, num_items=100,
                                     num_interactions=5000, noise=0.2)
        pp = Preprocessor(cfg.preprocessing)
        data = pp.process(data)
        splits = pp.split_data(data)
        mesh = build_mesh(cfg.mesh, devices)
        trainer = Trainer(
            cfg, log_q=np.log(pp.vocab.items.frequencies + 1e-12), mesh=mesh
        )
        state = trainer.init_state(len(pp.vocab.users), len(pp.vocab.items))
        assert state.table_state is not None  # sparse state on the mesh path
        res = trainer.fit(state, BatchPipeline(splits.train, cfg.training.batch_size))
        losses = [h["loss"] for h in res.history if "loss" in h]
        assert len(losses) >= 1 and np.isfinite(losses[-1])


class TestMixedSamplingOnMesh:
    @pytest.mark.parametrize("n_model", [2, 8])
    def test_matches_single_device_sparse_step(self, tiny_config, devices, n_model):
        """Mixed sampling on the sparse mesh: shared uniform negatives are
        gathered via the same a2a path and their per-shard gradient shares
        sum at the owner — numerically identical to the single-device step
        (the neg-RNG fold chain matches, so even the sampled ids agree)."""
        cfg, optimizer, state, batch, log_q = _setup(tiny_config, n_model)
        cfg = cfg.with_overrides(
            {"retrieval.candidate_sampling": "mixed", "retrieval.num_negatives": 64}
        )
        rng = jax.random.PRNGKey(7)

        ref_step = make_train_step(
            cfg, optimizer, log_q, donate=False, num_items=NUM_ITEMS
        )
        ref_state, ref_metrics = ref_step(state, batch, rng)

        mesh = build_mesh(cfg.mesh, devices)
        sharded = shard_state(mesh, state, cfg.mesh, sparse_mesh=True)
        step = make_sharded_train_step(
            cfg, optimizer, mesh, sharded, log_q, num_items=NUM_ITEMS, donate=False
        )
        b_sh = batch_shardings(mesh, cfg.mesh)
        dev_batch = {k: jax.device_put(v, b_sh) for k, v in batch.items()}
        new_state, metrics = step(
            sharded, dev_batch, jax.device_put(rng, replicated(mesh))
        )

        np.testing.assert_allclose(
            float(metrics["loss"]), float(ref_metrics["loss"]), rtol=2e-5
        )
        np.testing.assert_allclose(
            float(metrics["grad_norm"]), float(ref_metrics["grad_norm"]), rtol=1e-4
        )
        assert float(metrics["dropped_ids"]) == 0.0
        # Looser than the in-batch parity test: rows hit by positives AND
        # shared negatives sum up to num_data+dup contributions, and the a2a
        # bucketing reorders that f32 summation vs the single-device concat —
        # squaring into the nu moment amplifies the rounding to ~1e-4
        # (params themselves agree to <1e-5; a real double-count would shift
        # them by the lr scale).
        _assert_state_close(new_state, ref_state, rtol=1e-3, atol=2e-4)

    def test_routing_falls_back_to_dense_on_indivisible_negs(self, tiny_config):
        """A mixed config whose num_negatives doesn't split over the model
        axis must ROUTE to the dense GSPMD step (which supports any count),
        not hard-fail at startup behind the sparse routing predicate."""
        from twotower_tpu.parallel.sparse_spmd import use_sparse_mesh_path

        cfg = tiny_config.with_overrides(
            {
                "retrieval.candidate_sampling": "mixed",
                "retrieval.num_negatives": 60,
                "mesh.num_model": 8,
            }
        )
        assert not use_sparse_mesh_path(cfg)
        # Divisible count (or in_batch sampling) keeps the sparse path.
        assert use_sparse_mesh_path(
            cfg.with_overrides({"retrieval.num_negatives": 64})
        )
        assert use_sparse_mesh_path(
            cfg.with_overrides({"retrieval.candidate_sampling": "in_batch"})
        )

    def test_neg_count_must_divide_model_axis(self, tiny_config, devices):
        from twotower_tpu.parallel.sparse_spmd import make_sparse_sharded_train_step
        from twotower_tpu.training import make_optimizer

        cfg, optimizer, state, batch, log_q = _setup(tiny_config, 8)
        cfg = cfg.with_overrides(
            {"retrieval.candidate_sampling": "mixed", "retrieval.num_negatives": 60}
        )
        mesh = build_mesh(cfg.mesh, devices)
        with pytest.raises(ValueError, match="num_negatives"):
            make_sparse_sharded_train_step(
                cfg, optimizer, mesh, state, log_q, num_items=NUM_ITEMS
            )
