"""Scaling-efficiency model (parallel/scaling_model.py): the analytic
traffic terms must agree with the capacity benchmark's counters, and the
dense-param count with the real parameter tree."""

import importlib.util
from pathlib import Path

import numpy as np
import pytest

from twotower_tpu.config import Config
from twotower_tpu.parallel import scaling_model as sm

REPO = Path(__file__).resolve().parent.parent


def _load_capacity_bench():
    spec = importlib.util.spec_from_file_location(
        "a2a_capacity_bench", REPO / "benchmarks" / "a2a_capacity.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestA2ATermParity:
    def test_matches_capacity_bench_counters(self):
        bench = _load_capacity_bench()
        for batch, d, m, e, f in [
            (8192, 4, 2, 128, 0.0),
            (8192, 4, 2, 128, 1.25),
            (8192, 4, 2, 128, 2.0),
            (16384, 4, 4, 128, 2.0),
            (65536, 16, 4, 256, 2.5),
            (4096, 8, 1, 64, 1.5),
        ]:
            assert sm.a2a_bytes_per_device(batch, d, m, e, f) == (
                bench.a2a_bytes_per_device(batch, d, m, e, f)
            ), (batch, d, m, e, f)

    def test_capacity_matches_sparse_spmd(self):
        from twotower_tpu.parallel.sparse_spmd import _capacity

        for k, s, f in [(1024, 8, 2.0), (1024, 64, 2.5), (512, 16, 0.0)]:
            assert sm.a2a_capacity(k, s, f) == _capacity(k, s, f)


class TestDenseParams:
    def test_matches_real_param_tree(self):
        import jax

        from twotower_tpu.models import two_tower
        from twotower_tpu.training.sparse import split_params

        cfg = Config()
        params = two_tower.init_params(jax.random.PRNGKey(0), cfg.model, 100, 80)
        _, dense = split_params(params)
        real = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(dense))
        assert sm.dense_tower_params(cfg) == real


class TestTrafficModel:
    def _traffic(self, **kw):
        base = dict(
            batch=65536, num_data=16, num_model=4, emb_dim=256, out_dim=128,
            capacity_factor=2.5, dense_params=500_000, chips_per_host=4,
        )
        base.update(kw)
        return sm.sparse_step_traffic(**base)

    def test_single_slice_has_no_dcn(self):
        t = self._traffic(single_slice=True)
        assert t.dcn_per_host == 0
        assert t.ici_per_device == (
            t.a2a_per_device + t.model_ag_per_device
            + t.data_ag_per_device + t.dense_psum_per_device
        )

    def test_mixed_keeps_item_all_gather_but_shard_local_drops_it(self):
        """The mixed mesh branch still all_gathers the global item columns
        (sparse_spmd.py else-branch) — only shard_local_negatives (or
        uniform) removes term 3. The model must mirror the implementation,
        not the wish (round-5 fix: the r4 dossier wrongly zeroed term 3
        for mixed)."""
        t_in = self._traffic(sampling="in_batch")
        t_mx = self._traffic(sampling="mixed", num_negatives=4096)
        t_lc = self._traffic(
            sampling="mixed", num_negatives=4096, shard_local=True
        )
        t_un = self._traffic(sampling="uniform", num_negatives=4096)
        assert t_mx.data_ag_per_device == t_in.data_ag_per_device > 0
        assert t_lc.data_ag_per_device == 0
        assert t_un.data_ag_per_device == 0
        # the shared-negative exchange costs something (a2a + model gather)
        assert t_mx.a2a_per_device > t_in.a2a_per_device
        assert t_mx.model_ag_per_device > t_in.model_ag_per_device
        assert t_lc.ici_per_device < t_in.ici_per_device

    def test_dcn_split_accounts_cross_host_a2a(self):
        t = self._traffic(single_slice=False)
        # 4 chips/host on a 64-device world: 60/64 of the a2a leaves the host
        expected_a2a_dcn = 4 * t.a2a_per_device * 60 // 64
        assert t.dcn_per_host >= expected_a2a_dcn
        # and ICI keeps only the local share of the a2a
        assert t.ici_per_device < (
            t.a2a_per_device + t.model_ag_per_device
            + t.data_ag_per_device + t.dense_psum_per_device
        )

    def test_efficiency_orderings(self):
        comp = 0.66  # measured: bench.py --batch 1024 --embedding-dim 256
        r_in = sm.predicted_efficiency(
            self._traffic(sampling="in_batch"), compute_ms=comp
        )
        r_lc = sm.predicted_efficiency(
            self._traffic(sampling="mixed", num_negatives=4096,
                          shard_local=True),
            compute_ms=comp,
        )
        assert 0 < r_in.efficiency_serial < r_lc.efficiency_serial <= 1
        assert r_in.efficiency_serial <= r_in.efficiency_overlapped <= 1
        # shard-local mixed at pod scale: comm fits under compute with
        # overlap (the >=80% reading; serial is the no-overlap lower bound)
        assert r_lc.efficiency_serial >= 0.5
        assert r_lc.efficiency_overlapped == 1.0

    def test_preset_report_runs(self):
        cfg = Config.from_yaml(REPO / "configs" / "pod_571m.yaml")
        rep = sm.preset_report(
            cfg,
            compute_ms=0.66,
            dense_params=sm.dense_tower_params(cfg),
            chips_per_host=4,
        )
        # pod preset ships mixed + shard-local: term 1 includes the
        # negative exchange on top of the 4 base calls, term 3 is zero.
        assert rep.traffic.a2a_per_device > sm.a2a_bytes_per_device(
            cfg.training.batch_size, cfg.mesh.num_data, cfg.mesh.num_model,
            cfg.model.embedding_dim, cfg.mesh.a2a_capacity_factor,
        )
        assert rep.traffic.data_ag_per_device == 0
        assert 0 < rep.efficiency_serial <= 1


# measured single-chip step ms at per-chip batch 1024 (bench.py two-point
# slope; docs/architecture.md dossier): keyed by embedding_dim.
_COMPUTE_MS = {128: 0.59, 256: 0.66}
_MULTI_CHIP_PRESETS = [
    "full_category_8chip.yaml",
    "catalog_10m_2host.yaml",
    "pod_571m.yaml",
]


class TestPresetDossierAgreement:
    """VERDICT r4 #5: every multi-chip preset must ship a configuration the
    scaling dossier predicts meets the BASELINE >=80% target (overlapped
    reading) — presets and dossier agree, CI-checked."""

    @pytest.mark.parametrize("name", _MULTI_CHIP_PRESETS)
    def test_predicted_efficiency_overlapped_at_least_80pct(self, name):
        cfg = Config.from_yaml(REPO / "configs" / name)
        chips = cfg.mesh.num_data * cfg.mesh.num_model
        assert chips > 1, f"{name} is not multi-chip"
        per_chip = cfg.training.batch_size // chips
        assert per_chip == 1024, (
            f"{name}: per-chip batch {per_chip} != 1024 — remeasure "
            "compute_ms (bench.py --batch <per-chip>) before trusting this"
        )
        rep = sm.preset_report(
            cfg,
            compute_ms=_COMPUTE_MS[cfg.model.embedding_dim],
            dense_params=sm.dense_tower_params(cfg),
            chips_per_host=4,
        )
        assert rep.efficiency_overlapped >= 0.8, (
            f"{name}: predicted overlapped efficiency "
            f"{rep.efficiency_overlapped} < 0.8 — preset contradicts the "
            f"scaling dossier (traffic={rep.traffic.as_dict()})"
        )


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
