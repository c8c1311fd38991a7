"""Execution-rung auto-selection (training/rungs.py, VERDICT r4 #6)."""

import numpy as np
import pytest

from twotower_tpu.config import Config
from twotower_tpu.training import rungs

GB = 1 << 30


@pytest.fixture()
def cfg():
    return Config()  # embedding 128, towers [512,256,128]


class TestChooseExecutionRung:
    def test_config3_scale_defaults_to_device_loop(self, cfg):
        """The 50M-row lifecycle (round-4 measured: state 5.7 GB ~= 3.7M
        table rows + 480 MB columns fit the 16 GB chip) must auto-pick the
        device loop — the rung that measured +49% recall@10."""
        d = rungs.choose_execution_rung(
            n_train=50_000_000, num_users=2_500_000, num_items=1_200_000,
            config=cfg, device_free_bytes=16 * GB,
            host_available_bytes=64 * GB,
        )
        assert d.rung == "device_loop"
        assert "fit HBM" in d.reason

    def test_oversize_columns_fall_to_host(self, cfg):
        """Columns past HBM but inside host RAM: full-permutation host
        loop, not a quality-losing windowed stream."""
        d = rungs.choose_execution_rung(
            n_train=400_000_000, num_users=40_000_000, num_items=8_000_000,
            config=cfg, device_free_bytes=16 * GB,
            host_available_bytes=256 * GB,
        )
        assert d.rung == "host"

    def test_oversize_everything_streams_with_max_window(self, cfg):
        d = rungs.choose_execution_rung(
            n_train=571_000_000, num_users=50_000_000, num_items=30_000_000,
            config=cfg, device_free_bytes=16 * GB,
            host_available_bytes=32 * GB,
        )
        assert d.rung == "stream"
        assert d.shuffle_buffer is not None
        # window scales with the host budget: 32G/4 budget / 16 B/row
        assert d.shuffle_buffer == (32 * GB // 4) // 16
        assert d.shuffle_buffer < 571_000_000

    def test_window_caps_at_full_permutation(self, cfg):
        """Unknown host budget with giant tables: streams conservatively,
        and the window never exceeds n_train (past that it IS a full
        permutation)."""
        d = rungs.choose_execution_rung(
            n_train=2_000_000, num_users=100_000_000, num_items=60_000_000,
            config=cfg, device_free_bytes=16 * GB,
            host_available_bytes=None,
        )
        assert d.rung == "stream"
        assert d.shuffle_buffer == 2_000_000  # == n_train: full permutation

    def test_multi_process_never_device_loop(self, cfg):
        d = rungs.choose_execution_rung(
            n_train=1_000_000, num_users=100_000, num_items=50_000,
            config=cfg, device_free_bytes=16 * GB,
            host_available_bytes=64 * GB, multi_process=True,
        )
        assert d.rung == "host"

    def test_unknown_device_assumes_v5e(self, cfg):
        d = rungs.choose_execution_rung(
            n_train=1_000_000, num_users=100_000, num_items=50_000,
            config=cfg, device_free_bytes=None, host_available_bytes=None,
        )
        assert d.rung == "device_loop"

    def test_state_bytes_matches_real_tree(self, cfg):
        """The analytic state estimate must track the real TrainState
        within the padding slop (dead rows + 128-row table padding)."""
        import jax

        from twotower_tpu.models import two_tower
        from twotower_tpu.training import TrainState, make_optimizer

        c = cfg.with_overrides({"training.sparse_table_updates": True})
        params = two_tower.init_params(
            jax.random.PRNGKey(0), c.model, 1000, 700
        )
        state = TrainState.for_config(params, make_optimizer(c.training), c)
        real = sum(
            leaf.size * leaf.dtype.itemsize
            for leaf in jax.tree_util.tree_leaves(
                {"p": state.params, "o": state.opt_state,
                 "t": state.table_state}
            )
            if hasattr(leaf, "size")
        )
        est = rungs.train_state_bytes(c, 1000, 700)
        assert est == pytest.approx(real, rel=0.2)


class TestCliAutoRung:
    def test_prepared_no_flags_selects_device_loop(self, tmp_path):
        """A prepared-artifact run with NO execution flags must auto-select
        the device loop on a roomy device and record the chosen rung in
        the summary."""
        import json

        import pandas as pd

        from twotower_tpu.config import Config
        from twotower_tpu.data.streaming import StreamingPreprocessor
        from twotower_tpu.training.train import main as train_main

        rng = np.random.default_rng(3)
        n = 4000
        raw = tmp_path / "raw.parquet"
        pd.DataFrame({
            "user_id": [f"u{i:03d}" for i in rng.integers(0, 150, n)],
            "parent_asin": [f"i{i:03d}" for i in rng.integers(0, 80, n)],
            "rating": rng.integers(1, 6, n).astype(np.float32),
            "timestamp": rng.integers(1_600_000_000, 1_600_050_000, n).astype(
                np.int64
            ),
        }).to_parquet(raw)
        out = tmp_path / "prep"
        pcfg = Config().with_overrides(
            {"preprocessing.min_interactions_per_user": 2,
             "preprocessing.min_interactions_per_item": 2}
        )
        StreamingPreprocessor(
            pcfg.preprocessing, batch_rows=512
        ).process_parquet(raw, out)
        ckpt = tmp_path / "run"
        assert train_main([
            "--prepared-dir", str(out), "--checkpoint-dir", str(ckpt),
            "--override", "training.epochs=1", "training.batch_size=64",
            "model.embedding_dim=16", "model.user_tower_dims=[32,16]",
            "model.item_tower_dims=[32,16]",
        ]) == 0
        summary = json.loads((ckpt / "train_summary.json").read_text())
        assert summary["execution_rung"] == "device_loop"
        # and forcing the host rung is still possible
        ckpt2 = tmp_path / "run2"
        assert train_main([
            "--prepared-dir", str(out), "--checkpoint-dir", str(ckpt2),
            "--exec", "host",
            "--override", "training.epochs=1", "training.batch_size=64",
            "model.embedding_dim=16", "model.user_tower_dims=[32,16]",
            "model.item_tower_dims=[32,16]",
        ]) == 0
        summary2 = json.loads((ckpt2 / "train_summary.json").read_text())
        assert summary2["execution_rung"] == "host"
