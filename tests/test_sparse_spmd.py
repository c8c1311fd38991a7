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
        surface nonzero dropped_ids instead of silently corrupting.
        DISTINCT ids concentrated on one owner shard — duplicates alone no
        longer overflow (dedup-before-exchange shares their slot)."""
        cfg, optimizer, state, batch, log_q = _setup(
            tiny_config.with_overrides({"training.batch_size": 128}), 2
        )
        cfg = cfg.with_overrides({"mesh.a2a_capacity_factor": 1.0})
        # padded item table = 256 rows over 8 devices -> 32 rows/shard; ids
        # 0..31 are all owner-0: each peer's 16-id slice lands 16 UNIQUE ids
        # in one bucket, exceeding the factor-1.0 capacity (8).
        batch = dict(batch)
        batch["item_idx"] = jnp.arange(128, dtype=jnp.int32) % 32
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

    def test_flagship_capacity_factor_zero_drops(self, tiny_config, devices):
        """The flagship presets ship a2a_capacity_factor > 0 (the traffic
        win only materializes at capacity ~ B/S, a2a.py): with SHUFFLED
        batches over a uniform id space, factor 1.25 must bind the buckets
        well below worst case AND drop zero ids across several steps."""
        from twotower_tpu.data import BatchPipeline, generate_interactions
        from twotower_tpu.data.preprocess import Preprocessor
        from twotower_tpu.parallel.sparse_spmd import _capacity

        cfg = tiny_config.with_overrides(
            {"training.batch_size": 8192, "mesh.num_model": 2,
             "mesh.a2a_capacity_factor": 1.25, "model.dropout_rate": 0.0,
             "training.sparse_table_updates": True}
        )
        world = 8
        k = cfg.training.batch_size // 4 // 2  # per-peer slice
        cap = _capacity(k, world, 1.25)
        assert cap < k // 2, (cap, k)  # the factor genuinely binds

        data = generate_interactions(
            num_users=3000, num_items=2000, num_interactions=40_000, noise=0.3
        )
        pp = Preprocessor(cfg.preprocessing)
        data = pp.process(data)
        num_users, num_items = len(pp.vocab.users), len(pp.vocab.items)
        optimizer = make_optimizer(cfg.training)
        params = two_tower.init_params(
            jax.random.PRNGKey(0), cfg.model, num_users, num_items
        )
        state = TrainState.for_config(params, optimizer, cfg)
        mesh = build_mesh(cfg.mesh, devices)
        sharded = shard_state(mesh, state, cfg.mesh, sparse_mesh=True)
        step = make_sharded_train_step(cfg, optimizer, mesh, sharded, donate=False)
        b_sh = batch_shardings(mesh, cfg.mesh)
        rng = jax.device_put(jax.random.PRNGKey(0), replicated(mesh))
        pipe = BatchPipeline(data, cfg.training.batch_size, seed=42)
        total_dropped = 0.0
        for i, batch in enumerate(pipe.epoch(0)):
            if i >= 3:
                break
            dev_batch = {k2: jax.device_put(jnp.asarray(v), b_sh) for k2, v in batch.items()}
            sharded, metrics = step(sharded, dev_batch, rng)
            assert np.isfinite(float(metrics["loss"]))
            total_dropped += float(metrics["dropped_ids"])
        assert total_dropped == 0.0

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
        # squaring into the nu moment amplifies the rounding to ~1e-4.
        # Rows in BOTH the positive and sampled-negative sets are the one
        # principled exception: their pull/push contributions cancel to
        # bf16 rounding noise, and lazy-Adam's first step normalizes
        # g/sqrt(g^2) — sign noise becomes a full +-lr step (measured: the
        # f64 gradient element is exactly 0.0 where the paths disagree).
        # Those rows are asserted within the Adam step bound instead; a
        # real double-count would blow past it on NON-colliding rows too.
        lr = cfg.training.learning_rate

        def close_or_adam_noise(got, want, name):
            got, want = np.asarray(got), np.asarray(want)
            diff = np.abs(got - want)
            strict = 2e-4 + 1e-3 * np.abs(want)
            frac = float((diff <= strict).mean())
            assert frac >= 0.98, f"{name}: only {frac:.3f} strictly close"
            assert diff.max() <= 2.2 * lr + strict.max(), (
                f"{name}: max diff {diff.max()} beyond the Adam step bound"
            )

        for t in ("user_embedding", "item_embedding"):
            close_or_adam_noise(
                new_state.params[t], ref_state.params[t], t
            )
            # Moments are linear/quadratic in g — a double-counted or lost
            # contribution shifts them proportionally, so they stay STRICT.
            np.testing.assert_allclose(
                np.asarray(new_state.table_state[t]["moments"]),
                np.asarray(ref_state.table_state[t]["moments"]),
                rtol=1e-3, atol=2e-4, err_msg=f"{t} moments",
            )
        close_or_adam_noise(
            new_state.params["user_tower"][0]["kernel"],
            ref_state.params["user_tower"][0]["kernel"],
            "user_tower.0.kernel",
        )
        close_or_adam_noise(
            new_state.params["item_tower"][-1]["kernel"],
            ref_state.params["item_tower"][-1]["kernel"],
            "item_tower.-1.kernel",
        )

    def test_every_sampling_mode_routes_sparse(self, tiny_config):
        """No shipped sampling configuration may silently lose the flagship
        sparse path: in_batch, mixed (any num_negatives — indivisible counts
        are exchange-padded) and uniform all route sparse; only non-Adam /
        weight-decay / unsharded-table configs fall back to dense GSPMD."""
        from twotower_tpu.parallel.sparse_spmd import use_sparse_mesh_path

        base = tiny_config.with_overrides({"mesh.num_model": 8})
        for mode in ("in_batch", "mixed", "uniform"):
            for negs in (60, 64):  # 60 does NOT divide the model axis
                assert use_sparse_mesh_path(
                    base.with_overrides(
                        {"retrieval.candidate_sampling": mode,
                         "retrieval.num_negatives": negs}
                    )
                ), (mode, negs)
        assert not use_sparse_mesh_path(
            base.with_overrides({"training.optimizer": "sgd"})
        )
        assert not use_sparse_mesh_path(
            base.with_overrides({"mesh.shard_embeddings": False})
        )

    @pytest.mark.parametrize("num_negs", [60, 61])
    def test_indivisible_neg_count_matches_single_device(
        self, tiny_config, devices, num_negs
    ):
        """num_negatives that doesn't split over the model axis: the
        exchange pads internally, but the sampled set — and the resulting
        numbers — must equal the single-device step exactly."""
        cfg, optimizer, state, batch, log_q = _setup(tiny_config, 8)
        cfg = cfg.with_overrides(
            {"retrieval.candidate_sampling": "mixed",
             "retrieval.num_negatives": num_negs}
        )
        rng = jax.random.PRNGKey(13)
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
        assert float(metrics["dropped_ids"]) == 0.0
        _assert_state_close(new_state, ref_state, rtol=1e-3, atol=2e-4)


class TestUniformSamplingOnMesh:
    @pytest.mark.parametrize("n_model", [2, 8])
    def test_matches_single_device_sparse_step(self, tiny_config, devices, n_model):
        """Uniform sampling on the sparse mesh: purely-local positive scores
        against shared negatives (no item-column all_gather), numerically
        identical to the single-device sparse step."""
        cfg, optimizer, state, batch, log_q = _setup(tiny_config, n_model)
        cfg = cfg.with_overrides(
            {"retrieval.candidate_sampling": "uniform",
             "retrieval.num_negatives": 64}
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
            float(metrics["accuracy"]), float(ref_metrics["accuracy"]), atol=1e-6
        )
        assert float(metrics["dropped_ids"]) == 0.0
        # atol 2.5e-3 (= 2.5x lr): the uniform loss leaves some dense-kernel
        # grad elements near zero, where psum reduction-order noise (~1e-8)
        # can flip the sign and step-1 Adam (update ~= lr * sign(g)) turns
        # that into a +-lr delta. Loss/grad_norm/tables above agree to 1e-7—
        # a real double-count would shift far more than isolated elements.
        _assert_state_close(new_state, ref_state, rtol=1e-3, atol=2.5e-3)

    def test_uniform_with_text_tower(self, tiny_config, devices):
        cfg, optimizer, state, batch, log_q = _setup(tiny_config, 4, text=True)
        cfg = cfg.with_overrides(
            {"retrieval.candidate_sampling": "uniform",
             "retrieval.num_negatives": 30}  # also indivisible by num_model
        )
        rng = jax.random.PRNGKey(9)
        trng = np.random.default_rng(5)
        tokens = trng.integers(1, 256, (NUM_ITEMS, 4)).astype(np.int32)
        ref_step = make_train_step(
            cfg, optimizer, log_q, item_tokens=tokens, donate=False,
            num_items=NUM_ITEMS,
        )
        ref_state, ref_metrics = ref_step(state, batch, rng)

        mesh = build_mesh(cfg.mesh, devices)
        sharded = shard_state(mesh, state, cfg.mesh, sparse_mesh=True)
        step = make_sharded_train_step(
            cfg, optimizer, mesh, sharded, log_q, item_tokens=tokens,
            num_items=NUM_ITEMS, donate=False,
        )
        b_sh = batch_shardings(mesh, cfg.mesh)
        dev_batch = {k: jax.device_put(v, b_sh) for k, v in batch.items()}
        new_state, metrics = step(
            sharded, dev_batch, jax.device_put(rng, replicated(mesh))
        )
        np.testing.assert_allclose(
            float(metrics["loss"]), float(ref_metrics["loss"]), rtol=2e-5
        )
        # See test_matches_single_device_sparse_step for the atol rationale
        # (step-1 Adam sign sensitivity on near-zero dense grads).
        _assert_state_close(new_state, ref_state, rtol=1e-3, atol=2.5e-3)
        np.testing.assert_allclose(
            np.asarray(new_state.params["text_embedding"]),
            np.asarray(ref_state.params["text_embedding"]),
            rtol=1e-3, atol=2.5e-3,  # same sign-flip rationale: the a2a
            # dedup reorders near-zero token-row grad sums vs the
            # single-device concat order
        )


class TestShardLocalNegatives:
    """retrieval.shard_local_negatives: in-batch columns stay per data
    shard (no data-axis item-column all_gather — the pod-scale scaling
    wall, docs/architecture.md dossier)."""

    @pytest.mark.parametrize("mode", ["in_batch", "mixed"])
    def test_single_data_shard_matches_global(self, tiny_config, devices, mode):
        """With num_data=1 (mesh 1x8) local columns ARE the global batch:
        shard_local must be numerically identical to the global-column
        step, whatever the model-axis factorization."""
        cfg, optimizer, state, batch, log_q = _setup(tiny_config, 8)
        over = {"retrieval.candidate_sampling": mode}
        if mode == "mixed":
            over["retrieval.num_negatives"] = 64
        cfg_g = cfg.with_overrides(over)
        cfg_l = cfg_g.with_overrides({"retrieval.shard_local_negatives": True})
        rng = jax.random.PRNGKey(11)
        mesh = build_mesh(cfg_g.mesh, devices)
        b_sh = batch_shardings(mesh, cfg_g.mesh)
        dev_batch = {k: jax.device_put(v, b_sh) for k, v in batch.items()}

        results = []
        for c in (cfg_g, cfg_l):
            sharded = shard_state(mesh, state, c.mesh, sparse_mesh=True)
            step = make_sharded_train_step(
                c, optimizer, mesh, sharded, log_q,
                num_items=NUM_ITEMS, donate=False,
            )
            results.append(
                step(sharded, dev_batch, jax.device_put(rng, replicated(mesh)))
            )
        (st_g, m_g), (st_l, m_l) = results
        np.testing.assert_allclose(
            float(m_l["loss"]), float(m_g["loss"]), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(st_l.params["item_embedding"]),
            np.asarray(st_g.params["item_embedding"]),
            rtol=1e-5, atol=1e-6,
        )

    def test_local_columns_match_per_shard_reference(self, tiny_config, devices):
        """On a 4x2 mesh the shard-local loss must equal the hand-computed
        mean over shards of in-batch blocks restricted to each shard's own
        columns (dropout 0 => towers deterministic)."""
        from twotower_tpu.ops.losses import in_batch_softmax_block

        cfg, optimizer, state, batch, log_q = _setup(tiny_config, 2)
        cfg = cfg.with_overrides(
            {"retrieval.shard_local_negatives": True,
             "model.l2_regularization": 0.0}
        )
        rng = jax.random.PRNGKey(13)
        mesh = build_mesh(cfg.mesh, devices)
        sharded = shard_state(mesh, state, cfg.mesh, sparse_mesh=True)
        step = make_sharded_train_step(
            cfg, optimizer, mesh, sharded, log_q, num_items=NUM_ITEMS,
            donate=False,
        )
        b_sh = batch_shardings(mesh, cfg.mesh)
        dev_batch = {k: jax.device_put(v, b_sh) for k, v in batch.items()}
        _, metrics = step(
            sharded, dev_batch, jax.device_put(rng, replicated(mesh))
        )

        # Reference: towers on the full batch, loss per data-shard block
        # against that shard's columns only.
        params = state.params
        u_rows = params["user_embedding"][np.asarray(batch["user_idx"])]
        i_rows = params["item_embedding"][np.asarray(batch["item_idx"])]
        ue = two_tower.apply_user_tower(
            params, u_rows, cfg.model, train=True, dropout_rng=rng
        )
        ie = two_tower.apply_item_tower(
            params, i_rows, cfg.model, train=True, dropout_rng=rng
        )
        w = np.asarray(batch["weight"], np.float32)
        idx = np.asarray(batch["item_idx"])
        num_data = cfg.mesh.num_data if cfg.mesh.num_data > 0 else 4
        bs = cfg.training.batch_size
        b_local = bs // 4  # devices fixture: 8 devices, num_model=2
        num = 0.0
        for d in range(4):
            sl = slice(d * b_local, (d + 1) * b_local)
            per_ex, _, _ = in_batch_softmax_block(
                ue[sl], ie[sl], jnp.asarray(idx[sl]), 0,
                temperature=cfg.retrieval.temperature,
                log_q=jnp.asarray(log_q),
                weights_all=jnp.asarray(w[sl]),
            )
            num += float(np.sum(np.asarray(per_ex) * w[sl]))
        expected = num / max(w.sum(), 1.0)
        np.testing.assert_allclose(float(metrics["loss"]), expected, rtol=2e-5)


class TestBf16DenseGradPsum:
    def test_runs_and_tracks_f32(self, tiny_config, devices):
        """mesh.dense_grad_dtype=bfloat16 halves the ring-all-reduce bytes;
        the update must stay within bf16 rounding of the f32 path (moments
        and params move together — Adam still applied in f32)."""
        cfg, optimizer, state, batch, log_q = _setup(tiny_config, 2)
        rng = jax.random.PRNGKey(17)
        mesh = build_mesh(cfg.mesh, devices)
        b_sh = batch_shardings(mesh, cfg.mesh)
        dev_batch = {k: jax.device_put(v, b_sh) for k, v in batch.items()}
        outs = {}
        for dt in ("float32", "bfloat16"):
            c = cfg.with_overrides({"mesh.dense_grad_dtype": dt})
            sharded = shard_state(mesh, state, c.mesh, sparse_mesh=True)
            step = make_sharded_train_step(
                c, optimizer, mesh, sharded, log_q, donate=False
            )
            outs[dt] = step(
                sharded, dev_batch, jax.device_put(rng, replicated(mesh))
            )
        st32, m32 = outs["float32"]
        st16, m16 = outs["bfloat16"]
        np.testing.assert_allclose(
            float(m16["loss"]), float(m32["loss"]), rtol=1e-6
        )  # loss is computed before the grad cast
        # Tables don't ride the dense psum: bit-identical.
        np.testing.assert_allclose(
            np.asarray(st16.params["item_embedding"]),
            np.asarray(st32.params["item_embedding"]),
            rtol=1e-6, atol=1e-7,
        )
        # Dense kernels: bf16 grad rounding can flip step-1 Adam signs on
        # near-zero elements (same mechanism as the mixed-parity note) —
        # bound by the Adam step, require the bulk strictly close.
        k16 = np.asarray(st16.params["user_tower"][0]["kernel"])
        k32 = np.asarray(st32.params["user_tower"][0]["kernel"])
        diff = np.abs(k16 - k32)
        lr = cfg.training.learning_rate
        assert (diff <= 2e-4 + 1e-2 * np.abs(k32)).mean() >= 0.9
        assert diff.max() <= 2.2 * lr
