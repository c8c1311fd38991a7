"""Tests: hashed n-gram encoder, text-tower model path, profiling utils."""

import signal

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from twotower_tpu.features.text_encoder import PAD_ID, HashedNgramEncoder
from twotower_tpu.models import two_tower
from twotower_tpu.utils.profiling import GracefulShutdown, StepTimer


class TestHashedNgramEncoder:
    def test_deterministic_and_bounded(self):
        enc = HashedNgramEncoder(num_buckets=1000, max_tokens=8)
        a = enc.encode_one("great product works fast")
        b = enc.encode_one("great product works fast")
        np.testing.assert_array_equal(a, b)
        assert a.shape == (8,)
        assert (a[a != PAD_ID] >= 1).all() and (a < 1000).all()

    def test_bigrams_included(self):
        enc = HashedNgramEncoder(num_buckets=10_000, max_tokens=16, ngrams=(1, 2))
        toks = enc.encode_one("alpha beta")
        # 2 unigrams + 1 bigram = 3 non-pad tokens
        assert (toks != PAD_ID).sum() == 3

    def test_empty_text(self):
        enc = HashedNgramEncoder(max_tokens=4)
        assert (enc.encode_one("") == PAD_ID).all()
        assert (enc.encode_one(None) == PAD_ID).all()

    def test_truncation(self):
        enc = HashedNgramEncoder(max_tokens=3)
        toks = enc.encode_one("one two three four five six")
        assert toks.shape == (3,) and (toks != PAD_ID).all()

    def test_per_item_table(self):
        enc = HashedNgramEncoder(num_buckets=500, max_tokens=4)
        item_idx = np.array([0, 1, 0, 2], np.int32)
        texts = np.array(["first text", "second", "ignored duplicate", ""], object)
        table = enc.encode_per_item(item_idx, texts, 3)
        assert table.shape == (3, 4)
        np.testing.assert_array_equal(table[0], enc.encode_one("first text"))
        assert (table[2] == PAD_ID).all()  # item 2 had empty text


class TestTextTowerModel:
    @pytest.fixture()
    def text_cfg(self, tiny_config):
        return tiny_config.with_overrides(
            {"model.text_buckets": 512, "model.text_tokens": 4}
        ).model

    def test_params_include_text_table(self, text_cfg):
        params = two_tower.init_params(jax.random.PRNGKey(0), text_cfg, 50, 30)
        assert params["text_embedding"].shape == (
            two_tower.padded_rows(512), text_cfg.embedding_dim
        )

    def test_pool_text_masked_mean(self, text_cfg):
        params = two_tower.init_params(jax.random.PRNGKey(0), text_cfg, 50, 30)
        tokens = jnp.asarray([[5, 9, 0, 0], [0, 0, 0, 0]], jnp.int32)
        pooled = two_tower.pool_text(params, tokens)
        table = np.asarray(params["text_embedding"])
        np.testing.assert_allclose(
            np.asarray(pooled[0]), (table[5] + table[9]) / 2, rtol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(pooled[1]), 0.0)

    def test_text_changes_item_embedding(self, text_cfg):
        params = two_tower.init_params(jax.random.PRNGKey(0), text_cfg, 50, 30)
        idx = jnp.arange(4)
        tokens = jnp.asarray(np.random.default_rng(0).integers(1, 512, (4, 4)), jnp.int32)
        base = two_tower.embed_items(params, idx, text_cfg)
        with_text = two_tower.embed_items(params, idx, text_cfg, text_tokens=tokens)
        assert not np.allclose(np.asarray(base), np.asarray(with_text))

    def test_missing_table_raises(self, tiny_config):
        params = two_tower.init_params(jax.random.PRNGKey(0), tiny_config.model, 50, 30)
        with pytest.raises(ValueError):
            two_tower.embed_items(
                params, jnp.arange(2), tiny_config.model,
                text_tokens=jnp.zeros((2, 4), jnp.int32),
            )

    def test_corpus_encode_with_tokens(self, text_cfg):
        params = two_tower.init_params(jax.random.PRNGKey(0), text_cfg, 50, 30)
        tokens = jnp.asarray(
            np.random.default_rng(0).integers(0, 512, (30, 4)), jnp.int32
        )
        table = two_tower.embed_item_table(
            params, text_cfg, 30, chunk_size=16, item_tokens=tokens
        )
        direct = two_tower.embed_items(params, jnp.arange(30), text_cfg, text_tokens=tokens)
        np.testing.assert_allclose(
            np.asarray(table), np.asarray(direct), rtol=2e-2, atol=2e-2
        )

    def test_end_to_end_training_with_text(self, tiny_config, tmp_path):
        from twotower_tpu.training.train import main as train_main

        rc = train_main(
            [
                "--synthetic", "--synthetic-users", "100", "--synthetic-items", "60",
                "--synthetic-interactions", "3000",
                "--checkpoint-dir", str(tmp_path / "ckpt"),
                "--override", "training.epochs=1", "training.batch_size=64",
                "model.embedding_dim=16", "model.user_tower_dims=[16]",
                "model.item_tower_dims=[16]", "model.text_buckets=256",
                "model.text_tokens=4",
                "preprocessing.min_interactions_per_user=2",
                "preprocessing.min_interactions_per_item=2",
            ]
        )
        # synthetic has no text by default -> trains without text table
        assert rc == 0


class TestProfiling:
    def test_step_timer(self):
        t = StepTimer(window=10)
        assert t.tick() is None
        for _ in range(5):
            t.tick()
        s = t.summary()
        assert set(s) == {
            "step_time_p50_ms", "step_time_p90_ms", "step_time_p99_ms",
            "step_time_mean_ms",
        }
        assert s["step_time_p50_ms"] >= 0

    def test_graceful_shutdown_flag(self):
        gs = GracefulShutdown(signals=(signal.SIGUSR1,)).install()
        try:
            assert not gs.should_stop
            signal.raise_signal(signal.SIGUSR1)
            assert gs.should_stop
        finally:
            gs.uninstall()

    def test_trace_noop(self):
        from twotower_tpu.utils.profiling import trace

        with trace(None):
            pass
