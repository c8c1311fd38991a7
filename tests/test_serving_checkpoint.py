"""Serving + checkpoint tests: index correctness, native CPU index,
HTTP handlers, checkpoint save/restore/prune, CLI e2e."""

import json

import jax
import numpy as np
import pytest

from twotower_tpu.models import two_tower
from twotower_tpu.serving.api import RecommendService, ServingError, create_app
from twotower_tpu.serving.cpu_index import CpuFlatIndex
from twotower_tpu.serving.index import RetrievalIndex
from twotower_tpu.training import TrainState, make_optimizer
from twotower_tpu.utils.checkpoint import CheckpointManager


@pytest.fixture(scope="module")
def small_index(tiny_config_module):
    cfg = tiny_config_module
    params = two_tower.init_params(jax.random.PRNGKey(0), cfg.model, 100, 60)
    return RetrievalIndex(cfg, params, 100, 60)


@pytest.fixture(scope="module")
def tiny_config_module():
    from twotower_tpu.config import Config

    return Config().with_overrides(
        {
            "model.embedding_dim": 16,
            "model.user_tower_dims": [32, 16],
            "model.item_tower_dims": [32, 16],
        }
    )


class TestRetrievalIndex:
    def test_recommend_matches_bruteforce(self, small_index, tiny_config_module):
        users = np.arange(5, dtype=np.int32)
        scores, idx = small_index.recommend(users, k=10)
        u_emb = np.asarray(
            two_tower.embed_users(small_index.params, users, tiny_config_module.model)
        )
        full = u_emb @ np.asarray(small_index.corpus).T
        ref = np.argsort(-full, axis=1)[:, :10]
        got = np.take_along_axis(full, idx, axis=1)
        want = np.take_along_axis(full, ref, axis=1)
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_similar_items_excludes_self(self, small_index):
        scores, idx = small_index.similar_items(np.array([3, 7]), k=5)
        assert idx.shape == (2, 5)
        assert 3 not in idx[0]
        assert 7 not in idx[1]

    def test_out_of_range_raises(self, small_index):
        with pytest.raises(ValueError):
            small_index.recommend(np.array([1000]), k=5)

    @pytest.mark.parametrize("dtype", ["int8", "int8_rowscale"])
    def test_int8_corpus_matches_float(self, small_index, tiny_config_module, dtype):
        cfg = tiny_config_module.with_overrides({"serving.corpus_dtype": dtype})
        q_index = RetrievalIndex(cfg, small_index.params, 100, 60)
        assert np.asarray(q_index.corpus).dtype == np.int8
        users = np.arange(20, dtype=np.int32)
        _, idx_f = small_index.recommend(users, k=10)
        scores_q, idx_q = q_index.recommend(users, k=10)
        overlap = np.mean(
            [len(set(idx_f[b]) & set(idx_q[b])) / 10 for b in range(len(users))]
        )
        assert overlap >= 0.9  # quantization noise is below the ANN's own slack
        # Dequantized scores track the float scores closely.
        u_emb = np.asarray(
            two_tower.embed_users(q_index.params, users, cfg.model)
        )
        scale = np.asarray(q_index.corpus_scale)
        corpus = np.asarray(q_index.corpus, np.float32) * (
            scale[:, None] if scale.ndim else scale
        )
        want = np.take_along_axis(u_emb @ corpus.T, idx_q, axis=1)
        np.testing.assert_allclose(scores_q, want, atol=0.02)

    @pytest.mark.parametrize("dtype", ["int8", "int8_rowscale"])
    def test_int8_similar_items_and_export(self, tiny_config_module, tmp_path, dtype):
        cfg = tiny_config_module.with_overrides({"serving.corpus_dtype": dtype})
        params = two_tower.init_params(jax.random.PRNGKey(1), cfg.model, 50, 40)
        index = RetrievalIndex(cfg, params, 50, 40)
        _, idx = index.similar_items(np.array([3]), k=5)
        assert 3 not in idx[0]
        index.export_corpus(tmp_path / "corpus.npz")
        with np.load(tmp_path / "corpus.npz") as data:
            exported = data["corpus"]
        full = np.asarray(
            two_tower.embed_item_table(params, cfg.model, 40), np.float32
        )
        # Export dequantizes: rows match the float corpus to int8 precision.
        np.testing.assert_allclose(exported, full, atol=2.5 / 127)

    @pytest.mark.parametrize(
        "overrides",
        [
            {},
            {"serving.corpus_dtype": "int8"},
            {"serving.corpus_dtype": "int8_rowscale"},
            {"serving.index_type": "tpu_mips_exact"},
        ],
        ids=["bf16", "int8", "int8_rowscale", "exact"],
    )
    def test_mesh_sharded_index_matches_single(
        self, small_index, tiny_config_module, overrides
    ):
        import jax
        from jax.sharding import Mesh

        cfg = tiny_config_module.with_overrides(overrides)
        mesh = Mesh(np.array(jax.devices()[:8]), ("model",))
        sharded = RetrievalIndex(cfg, small_index.params, 100, 60, mesh=mesh)
        single = RetrievalIndex(cfg, small_index.params, 100, 60)
        users = np.arange(25, dtype=np.int32)
        v_s, i_s = sharded.recommend(users, k=7)
        v_1, i_1 = single.recommend(users, k=7)
        # CPU approx_max_k is exact -> shard+merge must reproduce the
        # single-device search exactly (same quantization both sides).
        np.testing.assert_array_equal(i_s, i_1)
        np.testing.assert_allclose(v_s, v_1, rtol=1e-5)
        # similar_items exercises the sharded-gather query path.
        _, sim = sharded.similar_items(np.array([3, 9]), k=5)
        assert sim.shape == (2, 5)
        assert 3 not in sim[0] and 9 not in sim[1]

    def test_int8_requires_ann_index(self, tiny_config_module):
        with pytest.raises(ValueError, match="int8"):
            tiny_config_module.with_overrides(
                {
                    "serving.corpus_dtype": "int8",
                    "serving.index_type": "tpu_mips_exact",
                }
            )


class TestCpuFlatIndex:
    def test_native_matches_numpy(self, rng):
        corpus = rng.normal(size=(2000, 64)).astype(np.float32)
        q = rng.normal(size=(16, 64)).astype(np.float32)
        native = CpuFlatIndex(corpus)
        ref = CpuFlatIndex(corpus, force_numpy=True)
        s1, i1 = native.search(q, 20)
        s2, i2 = ref.search(q, 20)
        np.testing.assert_allclose(s1, s2, rtol=1e-3)
        assert (i1 == i2).mean() > 0.99

    def test_scores_descending(self, rng):
        corpus = rng.normal(size=(500, 32)).astype(np.float32)
        q = rng.normal(size=(4, 32)).astype(np.float32)
        s, _ = CpuFlatIndex(corpus).search(q, 50)
        assert (np.diff(s, axis=1) <= 1e-6).all()

    def test_k_too_large(self, rng):
        idx = CpuFlatIndex(rng.normal(size=(10, 8)).astype(np.float32))
        with pytest.raises(ValueError):
            idx.search(rng.normal(size=(1, 8)).astype(np.float32), 11)


class _FakeVocab:
    """Minimal vocab pair for service tests."""

    class _One:
        def __init__(self, prefix, n):
            self.ids = np.array([f"{prefix}{i}" for i in range(n)], object)

        def encode(self, raw, missing=-1):
            index = {v: i for i, v in enumerate(self.ids)}
            return np.array([index.get(str(r), missing) for r in raw], np.int32)

        def decode(self, idx):
            return self.ids[np.asarray(idx)]

    def __init__(self, nu, ni):
        self.users = self._One("U", nu)
        self.items = self._One("I", ni)


@pytest.fixture(scope="module")
def service(small_index):
    return RecommendService(small_index, _FakeVocab(100, 60), default_k=10)


class TestRecommendService:
    def test_recommend_by_user_id(self, service):
        out = service.recommend({"user_id": "U3", "k": 5})
        assert len(out["results"]) == 1
        assert len(out["results"][0]["items"]) == 5
        assert out["results"][0]["items"][0].startswith("I")
        assert out["latency_ms"] >= 0

    def test_recommend_batch_by_idx(self, service):
        out = service.recommend({"user_idx": [0, 1, 2], "k": 3})
        assert len(out["results"]) == 3

    def test_unknown_user_404(self, service):
        with pytest.raises(ServingError) as e:
            service.recommend({"user_id": "NOPE"})
        assert e.value.status == 404

    def test_missing_field_400(self, service):
        with pytest.raises(ServingError):
            service.recommend({"k": 5})

    def test_empty_batch_400(self, service):
        with pytest.raises(ServingError, match="non-empty"):
            service.recommend({"user_idx": [], "k": 5})
        with pytest.raises(ServingError, match="non-empty"):
            service.similar_items({"item_idx": [], "k": 5})

    def test_similar_items(self, service):
        out = service.similar_items({"item_id": "I5", "k": 4})
        assert len(out["results"][0]["items"]) == 4
        assert "I5" not in out["results"][0]["items"]

    def test_health(self, service):
        h = service.health()
        assert h["status"] == "ok" and h["num_items"] == 60

    def test_default_k_clamps_for_similar_items_on_tiny_catalog(self):
        """A default k wider than the catalog must not 400 k-less requests
        on EITHER endpoint: /similar_items caps at num_items - 1 (self
        removed), one tighter than /recommend."""

        class _Tiny:
            num_users, num_items = 10, 5

            def recommend(self, user_idx, k):
                b = len(user_idx)
                idx = np.tile(np.arange(k, dtype=np.int32), (b, 1))
                return np.ones((b, k), np.float32), idx

            def similar_items(self, item_idx, k):
                b = len(item_idx)
                idx = (item_idx[:, None] + 1 + np.arange(k)[None]) % self.num_items
                return np.ones((b, k), np.float32), idx.astype(np.int32)

        svc = RecommendService(_Tiny(), _FakeVocab(10, 5), default_k=100)
        out = svc.recommend({"user_idx": [0]})
        assert len(out["results"][0]["items"]) == 5  # clamped to num_items
        out = svc.similar_items({"item_idx": [2]})
        assert len(out["results"][0]["items"]) == 4  # num_items - 1
        with pytest.raises(ServingError):  # explicit k still strict
            svc.similar_items({"item_idx": [2], "k": 5})


class TestHotReload:
    def test_reload_swaps_index_vocab_and_default_k(
        self, small_index, tiny_config_module
    ):
        cfg = tiny_config_module
        bigger = RetrievalIndex(
            cfg,
            two_tower.init_params(jax.random.PRNGKey(7), cfg.model, 100, 80),
            100,
            80,
        )
        bigger.vocab = _FakeVocab(100, 80)
        bigger.checkpoint_step = 42
        calls = []

        def factory(step=None):
            calls.append(step)
            return bigger

        svc = RecommendService(
            small_index, _FakeVocab(100, 60), default_k=70, index_factory=factory
        )
        assert svc.default_k == 60  # clamped to the first catalog
        info = svc.reload()
        assert calls == [None]
        assert svc.index is bigger and svc.vocab is bigger.vocab
        assert svc.default_k == 70  # re-clamped: 80-item catalog fits it now
        assert info["checkpoint_step"] == 42 and info["generation"] == 1
        h = svc.health()
        assert h["checkpoint_step"] == 42 and h["model_generation"] == 1
        # k-less requests now answer from the new catalog
        out = svc.recommend({"user_idx": [0]})
        assert len(out["results"][0]["items"]) == 70

    def test_reload_without_factory_400s(self, small_index):
        svc = RecommendService(small_index, _FakeVocab(100, 60))
        with pytest.raises(ServingError) as e:
            svc.reload()
        assert e.value.status == 400

    def test_reload_rejects_non_int_step(self, small_index):
        svc = RecommendService(
            small_index, _FakeVocab(100, 60), index_factory=lambda step=None: small_index
        )
        with pytest.raises(ServingError) as e:
            svc.reload("nope")
        assert e.value.status == 400

    def test_request_snapshot_survives_mid_flight_reload(
        self, small_index, tiny_config_module
    ):
        """A request validated against one model must execute on that exact
        model even if a reload swaps the service reference in between."""
        cfg = tiny_config_module
        smaller = RetrievalIndex(
            cfg,
            two_tower.init_params(jax.random.PRNGKey(9), cfg.model, 40, 20),
            40,
            20,
        )
        smaller.vocab = _FakeVocab(40, 20)
        svc = RecommendService(
            small_index, _FakeVocab(100, 60), default_k=10,
            index_factory=lambda step=None: smaller,
        )
        # Validate against the 60-item index with k/user valid only there.
        user_idx, k, _excl, snap = svc.prepare_recommend({"user_idx": [75], "k": 40})
        svc.reload()  # swaps to the 20-item / 40-user model
        # Executing on the snapshot still answers from the OLD model.
        scores, items = snap.index.recommend(user_idx, k)
        assert items.shape == (1, 40) and (items < 60).all()
        out = svc.format_recommend(user_idx, scores, items, k, 0.0, snap.vocab)
        assert all(i.startswith("I") for i in out["results"][0]["items"])
        # New requests validate against the new model: user 75 is now gone.
        with pytest.raises(ServingError) as e:
            svc.recommend({"user_idx": [75]})
        assert e.value.status == 404

    def test_release_first_503s_until_reload_succeeds(self, small_index):
        calls = {"n": 0}

        def flaky_factory(step=None):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("encode OOM")
            return small_index

        svc = RecommendService(
            small_index, _FakeVocab(100, 60), index_factory=flaky_factory
        )
        with pytest.raises(RuntimeError):
            svc.reload(release_first=True)
        # Old index was released before the failed build: requests 503.
        assert svc.health()["status"] == "reloading"
        with pytest.raises(ServingError) as e:
            svc.recommend({"user_idx": [0]})
        assert e.value.status == 503
        # A successful reload restores service.
        svc.reload(release_first=True)
        assert svc.health()["status"] == "ok"
        assert svc.recommend({"user_idx": [0], "k": 3})["results"]

    def test_batcher_never_coalesces_across_index_swap(self):
        """Requests pinned to different model snapshots must not share a
        device call (a reload mid-window would otherwise score one of them
        on the wrong model)."""
        import asyncio

        from twotower_tpu.serving.api import MicroBatcher

        old_index = _CountingIndex(delay_s=0.02)
        new_index = _CountingIndex(delay_s=0.02)
        batcher = MicroBatcher(old_index, max_batch=64, window_ms=100.0)

        async def go():
            first = asyncio.ensure_future(
                batcher.recommend(np.array([1], np.int32), 5, index=old_index)
            )
            await asyncio.sleep(0.005)  # let the window open on old_index
            second = asyncio.ensure_future(
                batcher.recommend(np.array([2], np.int32), 5, index=new_index)
            )
            return await asyncio.gather(first, second)

        r1, r2 = asyncio.run(go())
        assert r1[0].shape == (1, 5) and r2[0].shape == (1, 5)
        # One call landed on each index; they were never concatenated.
        assert old_index.calls == [1]
        assert new_index.calls == [1]

    def test_pre_swap_runs_on_new_index_before_swap(self, small_index):
        new_index = _CountingIndex()
        svc = RecommendService(
            small_index, _FakeVocab(100, 60),
            index_factory=lambda step=None: new_index,
        )
        seen = {}

        def pre_swap(idx):
            # Invoked with the NEW index while the OLD one still serves.
            seen["index"] = idx
            seen["live_at_call"] = svc.index

        svc.reload(pre_swap=pre_swap)
        assert seen["index"] is new_index
        assert seen["live_at_call"] is small_index
        assert svc.index is new_index

    def test_pre_swap_failure_aborts_swap(self, small_index):
        svc = RecommendService(
            small_index, _FakeVocab(100, 60),
            index_factory=lambda step=None: _CountingIndex(),
        )

        def boom(idx):
            raise RuntimeError("warmup compile failed")

        with pytest.raises(RuntimeError):
            svc.reload(pre_swap=boom)
        assert svc.index is small_index  # blue-green: old model still live
        assert svc.reloads == 0

    def test_aiohttp_release_first_drops_batcher_pin_and_500_is_json(
        self, small_index
    ):
        """release_first must free the batcher's reference to the old index
        (or its device buffers survive the rebuild), and a factory crash
        must come back as a JSON 500, not aiohttp's HTML default."""
        import asyncio

        from aiohttp.test_utils import TestClient, TestServer

        calls = {"n": 0}
        pins: list = []
        replacement = _CountingIndex()

        def flaky_factory(step=None):
            calls["n"] += 1
            pins.append(flaky_factory.batcher.index)  # what the batcher pins
            if calls["n"] == 1:
                raise RuntimeError("encode OOM")
            return replacement

        svc = RecommendService(
            small_index, _FakeVocab(100, 60), default_k=10,
            index_factory=flaky_factory,
        )

        async def go():
            from twotower_tpu.serving.api import batcher_key

            app = create_app(svc)
            flaky_factory.batcher = app[batcher_key()]
            async with TestClient(TestServer(app)) as client:
                r = await client.post(
                    "/admin/reload", json={"release_first": True}
                )
                assert r.status == 500
                body = await r.json()  # JSON contract held on 500
                assert "reload failed" in body["error"]
                h = await (await client.get("/health")).json()
                assert h["status"] == "reloading"
                # Second reload succeeds and restores service.
                r = await client.post(
                    "/admin/reload", json={"release_first": True}
                )
                assert r.status == 200
                h = await (await client.get("/health")).json()
                assert h["status"] == "ok"
            return app[batcher_key()]

        batcher = asyncio.run(go())
        # During BOTH rebuilds the batcher held no pin on the old index.
        assert pins == [None, None]
        assert batcher.index is replacement

    def test_from_checkpoint_records_step_and_pins(
        self, tiny_config_module, tmp_path
    ):
        from twotower_tpu.data.vocab import VocabPair, Vocabulary

        cfg = tiny_config_module
        optimizer = make_optimizer(cfg.training)
        manager = CheckpointManager(tmp_path, keep=3)
        vocab = VocabPair(
            users=Vocabulary.build(np.array([f"U{i}" for i in range(20)], object)),
            items=Vocabulary.build(np.array([f"I{i}" for i in range(30)], object)),
        )
        vocab.save(tmp_path / "vocab")
        for step, seed in ((3, 0), (9, 1)):
            params = two_tower.init_params(jax.random.PRNGKey(seed), cfg.model, 20, 30)
            manager.save(step, TrainState.for_config(params, optimizer, cfg))

        latest = RetrievalIndex.from_checkpoint(cfg, tmp_path)
        assert latest.checkpoint_step == 9
        pinned = RetrievalIndex.from_checkpoint(cfg, tmp_path, step=3)
        assert pinned.checkpoint_step == 3
        # Different seeds -> different corpora: the pin is real.
        assert not np.allclose(np.asarray(latest.corpus), np.asarray(pinned.corpus))

    def test_aiohttp_admin_reload_end_to_end(self, small_index, tiny_config_module):
        import asyncio

        from aiohttp.test_utils import TestClient, TestServer

        cfg = tiny_config_module
        new_index = RetrievalIndex(
            cfg,
            two_tower.init_params(jax.random.PRNGKey(5), cfg.model, 100, 60),
            100,
            60,
        )
        new_index.vocab = _FakeVocab(100, 60)
        new_index.checkpoint_step = 11

        def factory(step=None):
            return new_index

        svc = RecommendService(
            small_index, _FakeVocab(100, 60), default_k=10, index_factory=factory
        )

        async def go():
            app = create_app(svc)
            async with TestClient(TestServer(app)) as client:
                before = await (await client.post(
                    "/recommend", json={"user_idx": [1], "k": 5}
                )).json()
                r = await client.post("/admin/reload")
                assert r.status == 200
                body = await r.json()
                assert body["checkpoint_step"] == 11 and body["generation"] == 1
                h = await (await client.get("/health")).json()
                assert h["checkpoint_step"] == 11
                after = await (await client.post(
                    "/recommend", json={"user_idx": [1], "k": 5}
                )).json()
                r = await client.post("/admin/reload", json={"step": "nope"})
                assert r.status == 400
                return before, after

        before, after = asyncio.run(go())
        # Different params serve different rankings through the batcher too.
        assert (
            before["results"][0]["item_idx"] != after["results"][0]["item_idx"]
            or before["results"][0]["scores"] != after["results"][0]["scores"]
        )


class TestAiohttpApp:
    def test_routes(self, service):
        from aiohttp.test_utils import TestClient, TestServer
        import asyncio

        async def go():
            app = create_app(service)
            async with TestClient(TestServer(app)) as client:
                r = await client.get("/health")
                assert r.status == 200
                r = await client.post("/recommend", json={"user_idx": [1], "k": 3})
                assert r.status == 200
                body = await r.json()
                assert len(body["results"][0]["items"]) == 3
                r = await client.post("/recommend", json={"user_id": "NOPE"})
                assert r.status == 404
                r = await client.post("/recommend", data=b"not json")
                assert r.status == 400

        asyncio.run(go())


class _CountingIndex:
    """Index stub recording every device call (for coalescing asserts)."""

    num_users, num_items = 1000, 500

    def __init__(self, delay_s: float = 0.0):
        self.calls: list[int] = []
        self.delay_s = delay_s

    def recommend(self, user_idx, k):
        import time as _time

        if self.delay_s:
            _time.sleep(self.delay_s)
        self.calls.append(len(user_idx))
        b = len(user_idx)
        # Deterministic per-user rows so waiters can verify their slice.
        idx = (np.asarray(user_idx)[:, None] + np.arange(k)[None, :]) % self.num_items
        return np.arange(k, 0, -1, dtype=np.float32)[None].repeat(b, 0), idx.astype(
            np.int32
        )

    # All three endpoint families are coalesced now; the reload pre-swap
    # warms every family against the fake too.
    def similar_items(self, item_idx, k):
        return self.recommend(item_idx, k)

    def recommend_by_history(self, hist_idx, k):
        rows = np.asarray(hist_idx)
        first = np.where(rows.max(axis=1) >= 0, rows.max(axis=1), 0)
        return self.recommend(first, k)


class TestMicroBatcher:
    def test_concurrent_requests_coalesce(self):
        import asyncio

        from twotower_tpu.serving.api import MicroBatcher

        index = _CountingIndex(delay_s=0.01)
        batcher = MicroBatcher(index, max_batch=256, window_ms=20.0)

        async def go():
            return await asyncio.gather(
                *(batcher.recommend(np.array([u], np.int32), 5) for u in range(32))
            )

        results = asyncio.run(go())
        assert len(results) == 32
        for u, (scores, items) in enumerate(results):
            assert scores.shape == (1, 5) and items.shape == (1, 5)
            np.testing.assert_array_equal(
                items[0], (u + np.arange(5)) % index.num_items
            )
        # 32 one-row requests must share device calls (first may go alone
        # before the window opens; the rest coalesce).
        assert len(index.calls) < 32
        assert sum(index.calls) >= 32  # padding may add rows, never drops

    def test_batch_shapes_bucketed(self):
        import asyncio

        from twotower_tpu.serving.api import MicroBatcher

        index = _CountingIndex()
        batcher = MicroBatcher(index, max_batch=256, window_ms=1.0)

        async def go():
            return await batcher.recommend(np.arange(3, dtype=np.int32), 4)

        scores, items = asyncio.run(go())
        assert scores.shape == (3, 4)
        assert index.calls == [4]  # 3 rows padded to the 4-row bucket

    def test_device_error_propagates(self):
        import asyncio

        from twotower_tpu.serving.api import MicroBatcher

        class _Boom:
            def recommend(self, user_idx, k):
                raise RuntimeError("device on fire")

        batcher = MicroBatcher(_Boom(), window_ms=1.0)

        async def go():
            await batcher.recommend(np.array([0], np.int32), 5)

        with pytest.raises(RuntimeError, match="device on fire"):
            asyncio.run(go())

    def test_non_power_of_two_max_batch_never_compiles_past_it(self):
        """A 65..100-row group under max_batch=100 must pad to the 100-row
        clamp bucket (warmed at startup), not round up to an unwarmed 128."""
        import asyncio

        from twotower_tpu.serving.api import MicroBatcher

        index = _CountingIndex()
        batcher = MicroBatcher(index, max_batch=100, window_ms=1.0)
        shapes = batcher.warmup(5)
        warmed = set(index.calls)
        assert 100 in warmed and shapes == len(warmed)
        index.calls.clear()

        async def go():
            return await batcher.recommend(np.arange(70, dtype=np.int32), 5)

        scores, _items = asyncio.run(go())
        assert scores.shape == (70, 5)
        assert index.calls == [100]  # the clamp bucket, not 128
        assert set(index.calls) <= warmed  # every live shape was warmed

    def test_group_never_exceeds_max_batch(self):
        """Coalescing must not overflow max_batch: the padded shape would be
        an unwarmed 2*max_batch bucket that jit-compiles in live traffic."""
        import asyncio

        from twotower_tpu.serving.api import MicroBatcher

        index = _CountingIndex(delay_s=0.01)
        batcher = MicroBatcher(index, max_batch=8, window_ms=50.0)

        async def go():
            return await asyncio.gather(
                batcher.recommend(np.array([0], np.int32), 5),
                batcher.recommend(np.arange(8, dtype=np.int32), 5),
                batcher.recommend(np.arange(3, dtype=np.int32), 5),
            )

        results = asyncio.run(go())
        assert all(r[0].shape[1] == 5 for r in results)
        assert max(index.calls) <= 8  # no call above the warmed buckets
        # the 8-row request was carried to its own group, not merged
        assert len(index.calls) >= 2

    def test_oversize_direct_batch_raises_clear_error(self):
        """A direct library call past max_batch must get 'batch too large',
        not numpy's negative-dimension crash from the bucket clamp."""
        import asyncio

        from twotower_tpu.serving.api import MicroBatcher

        batcher = MicroBatcher(_CountingIndex(), max_batch=8, window_ms=1.0)
        with pytest.raises(ServingError, match="batch too large"):
            asyncio.run(batcher.recommend(np.zeros(9, np.int32), 5))

    def test_warmup_against_explicit_index(self):
        """warmup(index=new) compiles against the passed index, not the
        batcher's current one (the reload pre-swap path)."""
        from twotower_tpu.serving.api import MicroBatcher

        live, incoming = _CountingIndex(), _CountingIndex()
        batcher = MicroBatcher(live, max_batch=8, window_ms=1.0)
        shapes = batcher.warmup(5, index=incoming)
        assert shapes == len(incoming.calls) > 0
        assert live.calls == []  # old index untouched

    def test_warmup_clamps_k_to_catalog(self):
        """Startup warmup must not crash when default_k > num_items."""
        from twotower_tpu.serving.api import MicroBatcher

        class _TinyCatalog(_CountingIndex):
            num_items = 7

            def recommend(self, user_idx, k):
                if k > self.num_items:
                    raise ValueError(f"k={k} exceeds corpus size {self.num_items}")
                return super().recommend(user_idx, k)

        batcher = MicroBatcher(_TinyCatalog(), max_batch=4, window_ms=1.0)
        shapes = batcher.warmup(100)  # service.default_k = 100 > 7
        assert shapes == 3  # buckets 1, 2, 4

    def test_worker_cancellation_fails_waiters(self):
        """Killing the worker task must fail queued waiters, not hang them."""
        import asyncio

        from twotower_tpu.serving.api import MicroBatcher

        index = _CountingIndex(delay_s=0.2)
        batcher = MicroBatcher(index, max_batch=4, window_ms=1.0)

        async def go():
            t1 = asyncio.ensure_future(
                batcher.recommend(np.array([0], np.int32), 5)
            )
            await asyncio.sleep(0.05)  # worker now busy in the executor
            t2 = asyncio.ensure_future(
                batcher.recommend(np.array([1], np.int32), 5)
            )
            await asyncio.sleep(0.01)
            batcher._worker.cancel()
            r1, r2 = await asyncio.gather(t1, t2, return_exceptions=True)
            return r1, r2

        r1, r2 = asyncio.run(go())
        assert isinstance(r1, (RuntimeError, asyncio.CancelledError))
        assert isinstance(r2, (RuntimeError, asyncio.CancelledError))

    def test_aiohttp_coalesced_end_to_end(self, service):
        import asyncio

        from aiohttp.test_utils import TestClient, TestServer

        async def go():
            app = create_app(service, coalesce=True, window_ms=5.0)
            async with TestClient(TestServer(app)) as client:
                rs = await asyncio.gather(
                    *(
                        client.post("/recommend", json={"user_idx": [u], "k": 3})
                        for u in range(8)
                    )
                )
                assert all(r.status == 200 for r in rs)
                bodies = await asyncio.gather(*(r.json() for r in rs))
                for u, body in enumerate(bodies):
                    assert body["results"][0]["user_idx"] == u
                    assert len(body["results"][0]["items"]) == 3
                h = await (await client.get("/health")).json()
                assert h["coalesced_batches"] >= 1

        asyncio.run(go())

    def test_mixed_endpoints_all_coalesce(self, service):
        """Concurrent traffic on ALL THREE POST routes: each endpoint
        family coalesces within its own batcher (device calls < requests)
        and every response is correct for its request (r2 VERDICT weak #7:
        /similar_items and /recommend_by_history used to dispatch one
        device call per request)."""
        import asyncio

        from aiohttp.test_utils import TestClient, TestServer

        from twotower_tpu.serving.api import batchers_key

        per_route = 8

        async def go():
            app = create_app(service, coalesce=True, window_ms=20.0)
            async with TestClient(TestServer(app)) as client:
                reqs = []
                for u in range(per_route):
                    reqs.append(
                        client.post("/recommend", json={"user_idx": [u], "k": 3})
                    )
                    reqs.append(
                        client.post(
                            "/similar_items", json={"item_idx": [u], "k": 4}
                        )
                    )
                    reqs.append(
                        client.post(
                            "/recommend_by_history",
                            json={"history_idx": [u, u + 1], "k": 5},
                        )
                    )
                rs = await asyncio.gather(*reqs)
                assert all(r.status == 200 for r in rs), [
                    (r.status, await r.text()) for r in rs if r.status != 200
                ]
                bodies = await asyncio.gather(*(r.json() for r in rs))
                for i in range(per_route):
                    rec, sim, hist = bodies[3 * i : 3 * i + 3]
                    assert rec["results"][0]["user_idx"] == i
                    assert len(rec["results"][0]["items"]) == 3
                    assert sim["results"][0]["item_idx"] == i
                    assert len(sim["results"][0]["items"]) == 4
                    # self-neighbour excluded
                    assert f"I{i}" not in sim["results"][0]["items"]
                    assert len(hist["results"][0]["items"]) == 5
                    # exclude_seen defaults on: history items filtered out
                    got = hist["results"][0]["item_idx"]
                    assert i not in got and (i + 1) not in got
                # warmup issues device calls too, so count batches (which
                # only increments on live groups) per family instead of
                # raw index calls.
                fams = app[batchers_key()]
                assert set(fams) == {
                    "recommend", "similar_items", "recommend_by_history"
                }
                for name, b in fams.items():
                    assert 1 <= b.batches < per_route, (name, b.batches)

        asyncio.run(go())

    def test_history_coalescing_mixed_widths_and_k(self, service):
        """History requests with different history lengths and ks coalesce
        into shared fixed-width device calls and still slice correctly."""
        import asyncio

        from twotower_tpu.serving.api import MicroBatcher

        async def go():
            b = MicroBatcher(
                service.index, max_batch=16, window_ms=30.0,
                method="recommend_by_history", pad_value=-1,
                pad_width=8, query_dtype=np.int64,
            )
            h1 = np.array([[2]], np.int64)
            h2 = np.array([[3, 4, 5]], np.int64)
            (s1, i1), (s2, i2) = await asyncio.gather(
                b.submit(h1, 4), b.submit(h2, 6)
            )
            assert s1.shape == (1, 4) and i1.shape == (1, 4)
            assert s2.shape == (1, 6) and i2.shape == (1, 6)
            # Parity with the direct (uncoalesced, unpadded) index call.
            ds, di = service.index.recommend_by_history(h1, 4)
            np.testing.assert_array_equal(i1, di)
            np.testing.assert_allclose(s1, ds, rtol=1e-5)
            return b.batches

        batches = asyncio.run(go())
        assert batches >= 1


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tiny_config_module, tmp_path):
        cfg = tiny_config_module
        optimizer = make_optimizer(cfg.training)
        params = two_tower.init_params(jax.random.PRNGKey(1), cfg.model, 50, 30)
        state = TrainState.create(params, optimizer)
        mgr = CheckpointManager(tmp_path / "ckpt", keep=2)
        mgr.save(10, state, metrics={"recall@10": 0.5}, extra={"epoch": 3})

        template = TrainState.create(
            two_tower.init_params(jax.random.PRNGKey(2), cfg.model, 50, 30), optimizer
        )
        restored, meta = mgr.restore(template)
        np.testing.assert_array_equal(
            np.asarray(restored.params["user_embedding"]),
            np.asarray(state.params["user_embedding"]),
        )
        assert meta["metrics"]["recall@10"] == 0.5
        assert meta["epoch"] == 3

    def test_prune_keeps_latest(self, tiny_config_module, tmp_path):
        cfg = tiny_config_module
        optimizer = make_optimizer(cfg.training)
        state = TrainState.create(
            two_tower.init_params(jax.random.PRNGKey(0), cfg.model, 20, 20), optimizer
        )
        mgr = CheckpointManager(tmp_path / "ckpt", keep=2)
        for s in (1, 2, 3, 4):
            mgr.save(s, state)
        assert mgr.all_steps() == [3, 4]
        assert mgr.latest_step() == 4

    def test_restore_empty_raises(self, tmp_path):
        mgr = CheckpointManager(tmp_path / "none")
        with pytest.raises(FileNotFoundError):
            mgr.restore(None)

    def test_async_save_flush_and_busy_skip(self, tiny_config_module, tmp_path):
        """async_save: saves return immediately from a device snapshot, a
        worker writes them. HBM discipline: at most ONE snapshot alive —
        requests while a save is in flight are skipped (no allocation);
        a later request with an idle worker is accepted, and flush()
        drains everything to disk before returning."""
        import time as _time

        cfg = tiny_config_module
        optimizer = make_optimizer(cfg.training)
        mgr = CheckpointManager(tmp_path / "ckpt", keep=10, async_save=True)
        assert mgr.async_save  # single-process: stays enabled

        slow_orig = mgr._save_now

        def slow_save(step, state, **kw):
            _time.sleep(0.3)  # hold the worker so later requests hit busy-skip
            return slow_orig(step, state, **kw)

        mgr._save_now = slow_save

        def make_state(s):
            params = two_tower.init_params(
                jax.random.PRNGKey(s), cfg.model, 30, 20
            )
            return TrainState.create(params, optimizer)

        state1 = make_state(1)
        expect1 = np.asarray(state1.params["user_embedding"]).copy()
        mgr.save(1, state1, metrics={"recall@10": 0.1})
        del state1  # snapshot must be independent of the live buffers
        _time.sleep(0.05)  # let the worker take the request
        mgr.save(2, make_state(2))  # in-flight -> skipped, no snapshot
        mgr.flush()
        assert mgr.all_steps() == [1]  # 2 was busy-skipped
        state3 = make_state(3)
        expect3 = np.asarray(state3.params["user_embedding"]).copy()
        mgr.save(3, state3, metrics={"recall@10": 0.3})  # idle -> accepted
        del state3
        mgr.flush()
        assert mgr.all_steps() == [1, 3]
        template = TrainState.create(
            two_tower.init_params(jax.random.PRNGKey(9), cfg.model, 30, 20),
            optimizer,
        )
        restored, meta = mgr.restore(template, step=3)
        np.testing.assert_array_equal(
            np.asarray(restored.params["user_embedding"]), expect3
        )
        assert meta["metrics"]["recall@10"] == pytest.approx(0.3)
        restored1, _ = mgr.restore(template, step=1)
        np.testing.assert_array_equal(
            np.asarray(restored1.params["user_embedding"]), expect1
        )

    def test_starvation_backstop_persists_final_state(
        self, tiny_config_module, tmp_path
    ):
        """Round-4 incident regression: when every improving save after the
        first is busy-skipped (save slower than improvement cadence), the
        end-of-fit backstop must persist the FINAL state so the newest
        durable checkpoint never predates the best validation."""
        from twotower_tpu.training.loop import EarlyStopping, ensure_final_persisted

        cfg = tiny_config_module
        optimizer = make_optimizer(cfg.training)
        state = TrainState.create(
            two_tower.init_params(jax.random.PRNGKey(0), cfg.model, 20, 20),
            optimizer,
        )
        mgr = CheckpointManager(
            tmp_path / "ckpt", keep=3, async_save=True, min_interval_s=3600
        )
        mgr.save(10, state)  # epoch-0 save accepted
        mgr.flush()
        # later improving epochs: all skipped (interval), best at step 50
        mgr.save(50, state)
        mgr.flush()
        assert mgr.all_steps() == [10]
        stopper = EarlyStopping(patience=5)
        stopper.best, stopper.best_step = 0.5, 50
        final = TrainState(step=jax.numpy.int32(60), params=state.params,
                           opt_state=state.opt_state)
        ensure_final_persisted(mgr, final, stopper, epoch=7)
        assert mgr.latest_step() == 60  # force= bypassed the interval
        _, meta = mgr.restore(final, step=60)
        assert meta.get("post_starvation_final") is True

    def test_async_save_accept_interval(self, tiny_config_module, tmp_path):
        """min_interval_s gates ACCEPTED requests: a second improving save
        inside the window is skipped without allocating a snapshot."""
        cfg = tiny_config_module
        optimizer = make_optimizer(cfg.training)
        mgr = CheckpointManager(
            tmp_path / "ckpt", keep=10, async_save=True, min_interval_s=60
        )
        state = TrainState.create(
            two_tower.init_params(jax.random.PRNGKey(0), cfg.model, 20, 20),
            optimizer,
        )
        mgr.save(1, state)
        mgr.flush()
        mgr.save(2, state)  # inside the 60s window -> skipped
        mgr.flush()
        assert mgr.all_steps() == [1]

    def test_async_save_worker_failure_surfaces(self, tiny_config_module, tmp_path):
        cfg = tiny_config_module
        optimizer = make_optimizer(cfg.training)
        state = TrainState.create(
            two_tower.init_params(jax.random.PRNGKey(0), cfg.model, 20, 20),
            optimizer,
        )
        mgr = CheckpointManager(tmp_path / "ckpt", keep=2, async_save=True)

        def boom(step, s, **kw):
            raise RuntimeError("disk on fire")

        mgr._save_now = boom
        mgr.save(1, state)
        with pytest.raises(RuntimeError, match="disk on fire"):
            mgr.flush()

    def test_flush_timeout_raises(self, tiny_config_module, tmp_path):
        """flush(timeout) must not return silently when the pending save is
        still in flight — the caller would get neither durability nor an
        error (ADVICE r4)."""
        import time as _time

        cfg = tiny_config_module
        optimizer = make_optimizer(cfg.training)
        state = TrainState.create(
            two_tower.init_params(jax.random.PRNGKey(0), cfg.model, 20, 20),
            optimizer,
        )
        mgr = CheckpointManager(tmp_path / "ckpt", async_save=True)
        slow_orig = mgr._save_now

        def slow_save(step, s, **kw):
            _time.sleep(0.5)
            return slow_orig(step, s, **kw)

        mgr._save_now = slow_save
        mgr.save(1, state)
        with pytest.raises(TimeoutError):
            mgr.flush(timeout=0.05)
        mgr.flush()  # untimed flush drains normally
        assert mgr.all_steps() == [1]

    def test_first_save_accepted_on_young_monotonic_clock(
        self, tiny_config_module, tmp_path, monkeypatch
    ):
        """_last_accept starts at -inf: on a host whose monotonic clock is
        still below min_interval_s (time-since-boot on Linux), the FIRST
        improving-epoch save must not be interval-skipped (ADVICE r4)."""
        import time as _time

        cfg = tiny_config_module
        optimizer = make_optimizer(cfg.training)
        state = TrainState.create(
            two_tower.init_params(jax.random.PRNGKey(0), cfg.model, 20, 20),
            optimizer,
        )
        mgr = CheckpointManager(
            tmp_path / "ckpt", async_save=True, min_interval_s=3600
        )
        monkeypatch.setattr(_time, "monotonic", lambda: 12.0)  # freshly booted
        mgr.save(1, state)
        mgr.flush()
        assert mgr.all_steps() == [1]

    def test_preemption_save_inside_skip_window_is_durable(
        self, tiny_config_module, tmp_path
    ):
        """Async-save staleness worst case (VERDICT r4 #8 / ADVICE r4): a
        preemption arriving inside the accept window after an improving
        epoch must still persist the preemption-time state exactly — the
        shutdown branch flushes then force-saves, so nothing is lost."""
        from twotower_tpu.data import (
            BatchPipeline,
            Preprocessor,
            generate_interactions,
        )
        from twotower_tpu.training.loop import Trainer

        cfg = tiny_config_module.with_overrides(
            {"training.epochs": 4, "training.batch_size": 64}
        )
        pp = Preprocessor(cfg.preprocessing)
        data = pp.process(
            generate_interactions(num_users=100, num_items=50,
                                  num_interactions=2000)
        )
        splits = pp.split_data(data)

        class StopAfterEpoch1:
            calls = 0

            @property
            def should_stop(self):
                StopAfterEpoch1.calls += 1
                return StopAfterEpoch1.calls >= 2  # epoch 0 runs, epoch 1 preempts

        # Huge accept interval: every in-loop improving save after the first
        # lands in the skip window — the historical data-loss scenario.
        mgr = CheckpointManager(
            tmp_path / "ckpt", async_save=True, min_interval_s=3600
        )
        ev_calls = {"n": 0}

        def fake_eval(params):
            ev_calls["n"] += 1
            return {"recall@10": 0.1 * ev_calls["n"]}  # improves every epoch

        trainer = Trainer(
            cfg, evaluate_fn=fake_eval, checkpoint_manager=mgr,
            shutdown=StopAfterEpoch1(),
        )
        state = trainer.init_state(len(pp.vocab.users), len(pp.vocab.items))
        pipe = BatchPipeline(splits.train, cfg.training.batch_size)
        res = trainer.fit(state, pipe)
        final_step = int(res.state.step)
        steps = mgr.all_steps()
        # The preemption-time state itself is durable (zero staleness)...
        assert final_step in steps
        meta = json.loads(
            (tmp_path / "ckpt" / f"step_{final_step:010d}" / "meta.json").read_text()
        )
        # ...and carries the resume metadata.
        assert meta.get("preempted") is True
        assert meta.get("epoch") == 2

    def test_best_step_prefers_highest_metric(self, tiny_config_module, tmp_path):
        """best_step() returns the durable step with the best validation
        metric; metric-less preemption saves are skipped, and the
        post-starvation final backstop competes at its best_val_at_stop
        PROXY (round-5 incident: a starved run whose only metric-bearing
        durable step was epoch 1 must restore the backstop, which is
        within patience of the 30x-better lost best)."""
        cfg = tiny_config_module
        optimizer = make_optimizer(cfg.training)
        state = TrainState.create(
            two_tower.init_params(jax.random.PRNGKey(0), cfg.model, 20, 20),
            optimizer,
        )
        mgr = CheckpointManager(tmp_path / "ckpt", keep=10)
        mgr.save(10, state, metrics={"recall@10": 0.3})
        mgr.save(20, state, metrics={"recall@10": 0.5})
        mgr.save(30, state, metrics={"recall@10": 0.4})
        mgr.save(40, state, extra={"preempted": True})  # no metric
        assert mgr.best_step() == 20
        assert mgr.best_step("recall@10") == 20
        assert mgr.best_step("ndcg@10") is None
        # backstop with proxy BELOW the genuine best: genuine wins
        mgr.save(
            45, state, metrics={"best_val_at_stop": 0.45},
            extra={"post_starvation_final": True},
        )
        assert mgr.best_step() == 20
        # backstop with proxy ABOVE every genuine metric: expected-best
        import shutil

        shutil.rmtree(tmp_path / "ckpt" / "step_0000000045")
        mgr.save(
            50, state, metrics={"best_val_at_stop": 0.9},
            extra={"post_starvation_final": True},
        )
        assert mgr.latest_step() == 50
        assert mgr.best_step() == 50
        # genuine metric EQUAL to the proxy: the exact metric wins the tie
        mgr.save(60, state, metrics={"recall@10": 0.9})
        assert mgr.best_step() == 60

    def test_restore_params_prefers_best_metric_step(
        self, tiny_config_module, tmp_path, caplog
    ):
        """evaluate-model / serve-model restore the BEST durable step, not
        the merely newest one (ADVICE r4: after save starvation the newest
        checkpoint is the post-patience final state)."""
        import logging

        from twotower_tpu.evaluation.evaluate import restore_params

        cfg = tiny_config_module
        optimizer = make_optimizer(cfg.training)

        def make_state(seed):
            # for_config, matching train-model's saves (sparse-path states
            # carry table_state; restore_params templates the same way).
            return TrainState.for_config(
                two_tower.init_params(jax.random.PRNGKey(seed), cfg.model, 20, 20),
                optimizer, cfg,
            )

        best = make_state(1)
        mgr = CheckpointManager(tmp_path / "ckpt", keep=10)
        mgr.save(10, best, metrics={"recall@10": 0.5})
        mgr.save(
            25, make_state(2), metrics={"best_val_at_stop": 0.5},
            extra={"post_starvation_final": True},
        )
        with caplog.at_level(logging.WARNING, logger="twotower_tpu"):
            params, meta = restore_params(cfg, tmp_path / "ckpt", 20, 20)
        assert meta["step"] == 10  # best, not latest (25)
        np.testing.assert_array_equal(
            np.asarray(params["user_embedding"]),
            np.asarray(best.params["user_embedding"]),
        )
        assert any("best-metric checkpoint" in r.message for r in caplog.records)
        # Pinning a step still works and surfaces the starvation flag loudly.
        with caplog.at_level(logging.WARNING, logger="twotower_tpu"):
            _, meta25 = restore_params(cfg, tmp_path / "ckpt", 20, 20, step=25)
        assert meta25.get("post_starvation_final") is True
        assert any(
            "POST-STARVATION FINAL" in r.message for r in caplog.records
        )


class TestCliE2E:
    def test_train_then_evaluate_then_serve(self, tmp_path):
        from twotower_tpu.evaluation.evaluate import main as eval_main
        from twotower_tpu.training.train import main as train_main

        ckpt = tmp_path / "run"
        overrides = [
            "training.epochs=1", "training.batch_size=64",
            "model.embedding_dim=16", "model.user_tower_dims=[32,16]",
            "model.item_tower_dims=[32,16]",
            "preprocessing.min_interactions_per_user=2",
            "preprocessing.min_interactions_per_item=2",
        ]
        common = [
            "--synthetic", "--synthetic-users", "200", "--synthetic-items", "100",
            "--synthetic-interactions", "5000", "--checkpoint-dir", str(ckpt),
            "--override", *overrides,
        ]
        assert train_main(common + ["--writers", "jsonl"]) == 0
        assert (ckpt / "train_summary.json").exists()
        assert (ckpt / "vocab" / "item_vocab.npz").exists()
        assert (ckpt / "metrics.jsonl").exists()
        summary = json.loads((ckpt / "train_summary.json").read_text())
        assert summary["test"]["recall@10"] > 0

        assert eval_main(common) == 0

        # Checkpoint consumers rebuild the trained shape from the snapshot
        # alone — NO overrides re-passed (train-model wrote config.json).
        no_override = [a for a in common if a not in ("--override", *overrides)]
        assert eval_main(no_override) == 0

        # Serving from the same checkpoint, config from the snapshot.
        from twotower_tpu.config import load_config_for_checkpoint
        from twotower_tpu.serving.api import build_service

        cfg = load_config_for_checkpoint(ckpt)
        assert cfg.model.embedding_dim == 16  # snapshot, not defaults
        svc = build_service(cfg, str(ckpt))
        out = svc.recommend({"user_idx": [0], "k": 5})
        assert len(out["results"][0]["items"]) == 5

    def test_evaluate_mesh_matches_single_device(self, tmp_path, capsys):
        """evaluate-model --mesh (VERDICT r03 weak #2): the declared CLI
        must reach the sharded-corpus path training validation gets —
        restore into mesh shardings, corpus row-sharded P(model, None) —
        and produce the SAME exact-mode metrics as the single-device CLI
        on the same checkpoint."""
        from twotower_tpu.evaluation.evaluate import main as eval_main
        from twotower_tpu.training.train import main as train_main

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")

        ckpt = tmp_path / "run"
        overrides = [
            "training.epochs=1", "training.batch_size=64",
            "model.embedding_dim=16", "model.user_tower_dims=[32,16]",
            "model.item_tower_dims=[32,16]",
            "preprocessing.min_interactions_per_user=2",
            "preprocessing.min_interactions_per_item=2",
            "mesh.num_data=2", "mesh.num_model=4",
        ]
        common = [
            "--synthetic", "--synthetic-users", "200", "--synthetic-items",
            "100", "--synthetic-interactions", "5000",
            "--checkpoint-dir", str(ckpt), "--override", *overrides,
        ]
        assert train_main(common + ["--writers", "stdout"]) == 0
        capsys.readouterr()

        def run_eval(extra):
            assert eval_main(common + extra) == 0
            out = capsys.readouterr().out.strip().splitlines()[-1]
            return json.loads(out)

        single = run_eval([])
        sharded = run_eval(["--mesh"])
        assert single["checkpoint_step"] == sharded["checkpoint_step"]
        assert set(single["metrics"]) == set(sharded["metrics"])
        for key, val in single["metrics"].items():
            assert sharded["metrics"][key] == pytest.approx(val, abs=2e-6), key

    def test_no_eval_summary_is_strict_json(self, tmp_path):
        """With --no-eval there is no best metric; the summary must emit
        JSON null, not Python's non-standard ``-Infinity`` literal."""
        from twotower_tpu.training.train import main as train_main

        ckpt = tmp_path / "run"
        assert train_main([
            "--synthetic", "--synthetic-users", "200", "--synthetic-items",
            "100", "--synthetic-interactions", "3000", "--no-eval",
            "--checkpoint-dir", str(ckpt),
            "--override", "training.epochs=1", "training.batch_size=64",
            "model.embedding_dim=16", "model.user_tower_dims=[32,16]",
            "model.item_tower_dims=[32,16]",
            "preprocessing.min_interactions_per_user=2",
            "preprocessing.min_interactions_per_item=2",
        ]) == 0

        def reject_constant(name):
            raise ValueError(f"non-standard JSON constant: {name}")

        summary = json.loads(
            (ckpt / "train_summary.json").read_text(),
            parse_constant=reject_constant,
        )
        assert summary["best_val_metric"] is None

    def test_resume_continues_from_checkpoint(self, tmp_path):
        """--resume picks up the epoch cursor and optimizer state: a run
        killed after 2 epochs and resumed to 4 covers exactly the remaining
        epochs and keeps the global step monotonic (failure-recovery row,
        SURVEY §5.3)."""
        from twotower_tpu.training.train import main as train_main

        ckpt = tmp_path / "run"
        common = [
            "--synthetic", "--synthetic-users", "200", "--synthetic-items", "100",
            "--synthetic-interactions", "5000", "--checkpoint-dir", str(ckpt),
            "--override",
            "training.batch_size=64", "model.embedding_dim=16",
            "model.user_tower_dims=[32,16]", "model.item_tower_dims=[32,16]",
            "preprocessing.min_interactions_per_user=2",
            "preprocessing.min_interactions_per_item=2",
        ]
        assert train_main(common + ["training.epochs=2"]) == 0
        first = json.loads((ckpt / "train_summary.json").read_text())

        # The latest checkpoint records the next epoch to run (1 or 2,
        # depending on which validation improved) and the step to resume at.
        from twotower_tpu.utils.checkpoint import CheckpointManager

        manager = CheckpointManager(ckpt)
        saved_step = manager.latest_step()
        assert saved_step is not None and saved_step > 0
        meta = json.loads(
            (ckpt / f"step_{saved_step:010d}" / "meta.json").read_text()
        )
        start_epoch = int(meta["epoch"])
        assert 1 <= start_epoch <= 2

        assert train_main(common + ["training.epochs=4", "--resume"]) == 0
        resumed = json.loads((ckpt / "train_summary.json").read_text())
        # Resumed run covers exactly the remaining epochs...
        assert resumed["epochs_run"] == 4 - start_epoch
        # ...continues the global step rather than restarting at 0...
        assert resumed["best_step"] >= saved_step
        # ...and its quality does not regress vs the interrupted run.
        assert resumed["best_val_metric"] >= first["best_val_metric"]

    def test_resume_no_eval_persists_new_checkpoint(self, tmp_path):
        """Without validation nothing saves in-loop, so the final save must
        (a) persist a resumed run's extra training — not skip because an
        older checkpoint exists — and (b) record the epoch cursor so the
        NEXT resume continues instead of replaying from epoch 0."""
        from twotower_tpu.training.train import main as train_main
        from twotower_tpu.utils.checkpoint import CheckpointManager

        ckpt = tmp_path / "run"
        common = [
            "--synthetic", "--synthetic-users", "200", "--synthetic-items", "100",
            "--synthetic-interactions", "5000", "--no-eval",
            "--checkpoint-dir", str(ckpt),
            "--override",
            "training.batch_size=64", "model.embedding_dim=16",
            "model.user_tower_dims=[32,16]", "model.item_tower_dims=[32,16]",
            "preprocessing.min_interactions_per_user=2",
            "preprocessing.min_interactions_per_item=2",
        ]
        assert train_main(common + ["training.epochs=1"]) == 0
        manager = CheckpointManager(ckpt)
        step1 = manager.latest_step()
        meta1 = json.loads((ckpt / f"step_{step1:010d}" / "meta.json").read_text())
        assert meta1["epoch"] == 1  # the final save carries the cursor

        assert train_main(common + ["training.epochs=2", "--resume"]) == 0
        resumed = json.loads((ckpt / "train_summary.json").read_text())
        assert resumed["epochs_run"] == 1  # only the remaining epoch
        step2 = manager.latest_step()
        assert step2 > step1  # the extra training was persisted
        meta2 = json.loads((ckpt / f"step_{step2:010d}" / "meta.json").read_text())
        assert meta2["epoch"] == 2

    def test_config_snapshot_precedence(self, tmp_path):
        """Snapshot is the base; explicit --config replaces it; dotted
        overrides always win."""
        import yaml

        from twotower_tpu.config import Config, load_config_for_checkpoint

        ckpt = tmp_path / "ckpt"
        ckpt.mkdir()
        snap = Config().with_overrides({"model.embedding_dim": 16})
        (ckpt / "config.json").write_text(snap.to_json())

        assert load_config_for_checkpoint(ckpt).model.embedding_dim == 16
        got = load_config_for_checkpoint(
            ckpt, overrides={"model.embedding_dim": 24}
        )
        assert got.model.embedding_dim == 24

        explicit = tmp_path / "other.yaml"
        explicit.write_text(yaml.safe_dump({"model": {"embedding_dim": 48}}))
        assert (
            load_config_for_checkpoint(ckpt, path=explicit).model.embedding_dim == 48
        )
        # No snapshot -> plain defaults path.
        empty = tmp_path / "empty"
        empty.mkdir()
        assert (
            load_config_for_checkpoint(empty).model.embedding_dim
            == Config().model.embedding_dim
        )


class TestServingHardening:
    """Round-2 review fixes: health readiness codes, admin auth, adaptive
    coalesce window, executor-run device paths."""

    def test_health_503_while_reloading_and_admin_token_gate(self, small_index):
        import asyncio

        from aiohttp.test_utils import TestClient, TestServer

        calls = {"n": 0}

        def flaky_factory(step=None):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("encode OOM")
            return small_index

        svc = RecommendService(
            small_index, _FakeVocab(100, 60), default_k=10,
            index_factory=flaky_factory,
        )

        async def go():
            app = create_app(svc, admin_token="s3cret")
            async with TestClient(TestServer(app)) as client:
                # healthy: 200
                r = await client.get("/health")
                assert r.status == 200

                # no/wrong token: 401, and the factory never ran
                r = await client.post("/admin/reload", json={})
                assert r.status == 401
                r = await client.post(
                    "/admin/reload", headers={"X-Admin-Token": "nope"}, json={}
                )
                assert r.status == 401
                assert calls["n"] == 0

                # correct token via Bearer: reaches the (crashing) factory
                r = await client.post(
                    "/admin/reload",
                    headers={"Authorization": "Bearer s3cret"},
                    json={"release_first": True},
                )
                assert r.status == 500 and calls["n"] == 1

                # model unloaded -> readiness probe must now see 503
                r = await client.get("/health")
                assert r.status == 503
                assert (await r.json())["status"] == "reloading"

                # X-Admin-Token header form also accepted; service recovers
                r = await client.post(
                    "/admin/reload", headers={"X-Admin-Token": "s3cret"}, json={}
                )
                assert r.status == 200
                assert (await client.get("/health")).status == 200

        asyncio.run(go())

    def test_lone_request_skips_coalesce_window(self):
        """A single queued request must dispatch immediately — the window
        only applies when other requests are already waiting."""
        import asyncio
        import time as _time

        from twotower_tpu.serving.api import MicroBatcher

        index = _CountingIndex()
        # Pathological window: if the lone request waited it out, this test
        # would take >2s and fail the timing assert.
        batcher = MicroBatcher(index, max_batch=8, window_ms=2000.0)

        async def go():
            t0 = _time.perf_counter()
            await batcher.recommend(np.zeros(1, np.int32), 3)
            return _time.perf_counter() - t0

        elapsed = asyncio.run(go())
        assert elapsed < 0.5, f"lone request waited the window: {elapsed:.3f}s"
        assert len(index.calls) == 1

    def test_similar_items_route_runs_off_event_loop(self, small_index):
        """/similar_items goes through the executor wrapper and still
        returns correct JSON (device work never blocks the loop)."""
        import asyncio

        from aiohttp.test_utils import TestClient, TestServer

        svc = RecommendService(small_index, _FakeVocab(100, 60), default_k=5)

        async def go():
            app = create_app(svc)
            async with TestClient(TestServer(app)) as client:
                r = await client.post("/similar_items", json={"item_idx": [3], "k": 4})
                assert r.status == 200
                body = await r.json()
                assert len(body["results"][0]["items"]) == 4
                # validation errors still map to 4xx through the executor
                r = await client.post("/similar_items", json={"item_idx": [999]})
                assert r.status == 404

        asyncio.run(go())

    def test_livez_always_200_and_unexpected_errors_are_json_500(self, small_index):
        """Liveness stays 200 while /health 503s (release-first reload), and
        an unexpected handler exception honors the JSON error contract."""
        import asyncio

        from aiohttp.test_utils import TestClient, TestServer

        def dead_factory(step=None):
            raise RuntimeError("encode OOM")

        svc = RecommendService(
            small_index, _FakeVocab(100, 60), default_k=10,
            index_factory=dead_factory,
        )

        # The route captures the handler at app build time: break the
        # service BEFORE create_app so /recommend raises an exception type
        # outside the expected set (ServingError/TypeError/...).
        svc.recommend = lambda payload: (_ for _ in ()).throw(
            RuntimeError("device exploded")
        )

        async def go():
            app = create_app(svc, coalesce=False)
            async with TestClient(TestServer(app)) as client:
                assert (await client.get("/livez")).status == 200

                # The route must return parseable JSON with a 500 for the
                # unexpected exception, never aiohttp's HTML error page.
                r = await client.post("/recommend", json={"user_idx": [1]})
                assert r.status == 500
                assert (await r.json())["error"] == "internal error"

                # Unload the model (failed release-first reload).
                r = await client.post(
                    "/admin/reload", json={"release_first": True}
                )
                assert r.status == 500

                # Readiness pulls the pod; liveness must NOT (a restart
                # would destroy an in-progress rebuild -> crash loop).
                assert (await client.get("/health")).status == 503
                assert (await client.get("/livez")).status == 200

        asyncio.run(go())


class TestExclusionAndHistory:
    """Seen-item filtering (exclude/exclude_idx) and cold-start
    history-pooled retrieval (/recommend_by_history)."""

    def test_exclude_idx_filters_results(self, service):
        base = service.recommend({"user_idx": [3], "k": 10})
        top = base["results"][0]["item_idx"][:3]
        out = service.recommend({"user_idx": [3], "k": 10, "exclude_idx": top})
        got = out["results"][0]["item_idx"]
        assert len(got) == 10
        assert not set(top) & set(got)
        # Survivors keep their relative order from the unfiltered ranking.
        rest = [i for i in base["results"][0]["item_idx"] if i not in top]
        assert got[: len(rest)] == rest[:10] or got == sorted(
            got, key=lambda i: -dict(zip(base["results"][0]["item_idx"],
                                         base["results"][0]["scores"])).get(i, -1e9)
        )

    def test_exclude_by_external_id_and_unknown_noop(self, service):
        base = service.recommend({"user_idx": [5], "k": 5})
        top_id = base["results"][0]["items"][0]
        out = service.recommend(
            {"user_idx": [5], "k": 5, "exclude": [top_id, "NOT_AN_ITEM"]}
        )
        assert top_id not in out["results"][0]["items"]
        assert len(out["results"][0]["items"]) == 5

    def test_exclude_validation(self, service):
        with pytest.raises(ServingError) as e:
            service.recommend({"user_idx": [1], "exclude_idx": [999]})
        assert e.value.status == 404
        with pytest.raises(ServingError):
            service.recommend({"user_idx": [1], "exclude_idx": ["x"]})
        svc = RecommendService(
            service.index, service.vocab, default_k=5, max_exclude=2
        )
        with pytest.raises(ServingError) as e:
            svc.recommend({"user_idx": [1], "exclude_idx": [1, 2, 3]})
        assert "max_exclude" in str(e.value)

    def test_search_depth_buckets(self):
        sd = RecommendService.search_depth
        assert sd(10, 0, 1000) == 10           # warmed fast path untouched
        # ANY exclusion snaps to the covering power of two: a handful of
        # warmable depths instead of ~max_exclude/32 lazy-compile shapes
        # (the round-4 p99 outlier mechanism)
        assert sd(10, 1, 1000) == 16
        assert sd(10, 30, 1000) == 64
        assert sd(100, 200, 100000) == 512
        assert sd(10, 5, 12) == 12             # clamped to the catalog

    def test_warm_depths_cover_every_reachable_depth(self, small_index):
        """The warmup grid must contain every depth the route can produce
        at default k for any legal exclusion count — otherwise a live
        request compiles (the exact p99 failure the grid exists to
        prevent)."""
        svc = RecommendService(
            small_index, None, max_exclude=40, max_history=16
        )
        n = small_index.num_items
        for route, cap in (
            ("recommend", 40),
            ("similar_items", 0),
            ("recommend_by_history", 56),
        ):
            grid = set(svc.warm_depths(route, 10, n))
            for e in range(cap + 1):
                assert svc.search_depth(10, e, n) in grid, (route, e)

    def test_history_matches_index_pooling(self, service, small_index):
        """Service results == direct index query with the same pooled rows,
        minus the seen items."""
        hist = [3, 7, 9]
        out = service.recommend_by_history({"history_idx": hist, "k": 8})
        got = out["results"][0]["item_idx"]
        assert len(got) == 8
        assert not set(hist) & set(got)   # exclude_seen defaults on

        # exclude_seen=False keeps the history items eligible; with an
        # item-to-item pooled query the top hits usually ARE the history.
        raw = service.recommend_by_history(
            {"history_idx": hist, "k": 8, "exclude_seen": False}
        )
        raw_idx = raw["results"][0]["item_idx"]
        vals, idx = small_index.recommend_by_history(
            np.array([hist + [-1]]), 8
        )
        assert raw_idx == idx[0].tolist()

    def test_history_batch_and_external_ids(self, service):
        out = service.recommend_by_history(
            {"history_idx": [[1, 2], [4, 5, 6]], "k": 4}
        )
        assert len(out["results"]) == 2
        for res, seen in zip(out["results"], ([1, 2], [4, 5, 6])):
            assert len(res["item_idx"]) == 4
            assert not set(seen) & set(res["item_idx"])
        # External-id form; unknown ids drop out of the pool silently.
        out = service.recommend_by_history(
            {"history": ["I3", "NOPE", "I9"], "k": 3}
        )
        assert len(out["results"][0]["items"]) == 3

    def test_history_validation(self, service):
        with pytest.raises(ServingError):
            service.recommend_by_history({"k": 3})
        with pytest.raises(ServingError) as e:
            service.recommend_by_history({"history_idx": [999]})
        assert e.value.status == 404
        with pytest.raises(ServingError) as e:
            service.recommend_by_history({"history": ["NOPE"]})
        assert e.value.status == 404
        svc = RecommendService(
            service.index, service.vocab, default_k=5, max_history=2
        )
        with pytest.raises(ServingError) as e:
            svc.recommend_by_history({"history_idx": [1, 2, 3]})
        assert "max_history" in str(e.value)

    def test_history_route_and_coalesced_exclusion(self, small_index):
        import asyncio

        from aiohttp.test_utils import TestClient, TestServer

        svc = RecommendService(small_index, _FakeVocab(100, 60), default_k=6)

        async def go():
            app = create_app(svc)  # coalesced front
            async with TestClient(TestServer(app)) as client:
                r = await client.post(
                    "/recommend_by_history", json={"history_idx": [2, 8], "k": 5}
                )
                assert r.status == 200
                body = await r.json()
                assert len(body["results"][0]["item_idx"]) == 5
                assert not {2, 8} & set(body["results"][0]["item_idx"])

                # Exclusion flows through the coalesced /recommend path.
                base = await (
                    await client.post("/recommend", json={"user_idx": [7], "k": 6})
                ).json()
                top = base["results"][0]["item_idx"][:2]
                r = await client.post(
                    "/recommend",
                    json={"user_idx": [7], "k": 6, "exclude_idx": top},
                )
                body = await r.json()
                assert r.status == 200
                got = body["results"][0]["item_idx"]
                assert len(got) == 6 and not set(top) & set(got)

        asyncio.run(go())
