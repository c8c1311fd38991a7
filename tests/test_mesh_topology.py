"""Topology-aware mesh placement (parallel/mesh.py).

The contract under test: a model group (one row of the ``[data, model]``
device grid) must NEVER cross a process, because cross-host traffic rides
DCN and the model axis carries the embedding-table all-to-all — the traffic
the whole capacity design optimizes (mesh.py module docstring; VERDICT r03
weak #1). Verified with fake multi-process device lists so the placement
policy is tested at real pod topologies (16 hosts x 4 chips) that no test
host can execute.
"""

import numpy as np
import pytest

from twotower_tpu.config import Config, MeshConfig
from twotower_tpu.parallel.mesh import mesh_device_grid


class FakeDev:
    """Minimal device stand-in: id + process_index is all placement uses."""

    def __init__(self, dev_id: int, process_index: int):
        self.id = dev_id
        self.process_index = process_index

    def __repr__(self) -> str:  # pragma: no cover - debug only
        return f"d{self.id}@p{self.process_index}"


def fake_slice(num_hosts: int, chips_per_host: int) -> list:
    return [
        FakeDev(h * chips_per_host + c, h)
        for h in range(num_hosts)
        for c in range(chips_per_host)
    ]


def assert_model_groups_intra_process(grid: np.ndarray) -> None:
    for row in grid:
        procs = {d.process_index for d in row}
        assert len(procs) == 1, f"model group spans processes {sorted(procs)}"


class TestMultiProcessPlacement:
    def test_model_groups_intra_process_v5e64(self):
        # The pod_571m topology: v5e-64 = 16 host VMs x 4 chips.
        devs = fake_slice(16, 4)
        grid = mesh_device_grid(MeshConfig(num_data=16, num_model=4), devs)
        assert grid.shape == (16, 4)
        assert_model_groups_intra_process(grid)
        # every device appears exactly once
        assert sorted(d.id for d in grid.ravel()) == list(range(64))

    def test_num_model_wider_than_host_rejected(self):
        # 8-way model sharding on 4-chip hosts would put the table a2a on
        # DCN — must fail loudly, not silently degrade.
        devs = fake_slice(16, 4)
        with pytest.raises(ValueError, match="ride DCN"):
            mesh_device_grid(MeshConfig(num_data=8, num_model=8), devs)

    def test_allow_dcn_model_axis_escape_hatch(self, caplog):
        # Explicit opt-out (dense/replicated topologies, tests): warns
        # loudly and falls back to the contiguous reshape.
        import logging

        devs = fake_slice(2, 2)
        cfg = MeshConfig(num_data=1, num_model=4, allow_dcn_model_axis=True)
        with caplog.at_level(logging.WARNING, logger="twotower_tpu"):
            grid = mesh_device_grid(cfg, devs)
        assert grid.shape == (1, 4)
        assert any("DCN" in r.message for r in caplog.records)

    def test_interleaved_device_order(self):
        # jax.devices() order is not guaranteed host-contiguous; placement
        # must group by process_index, not by list position.
        devs = fake_slice(4, 4)
        interleaved = [devs[i::4][j] for i in range(4) for j in range(4)]
        assert {d.process_index for d in interleaved[:4]} == {0, 1, 2, 3}
        grid = mesh_device_grid(MeshConfig(num_data=4, num_model=4), interleaved)
        assert_model_groups_intra_process(grid)

    def test_uneven_hosts_ok_when_divisible(self):
        devs = [FakeDev(i, 0) for i in range(8)] + [
            FakeDev(8 + i, 1) for i in range(4)
        ]
        grid = mesh_device_grid(MeshConfig(num_data=3, num_model=4), devs)
        assert grid.shape == (3, 4)
        assert_model_groups_intra_process(grid)

    def test_single_process_any_factorization(self):
        devs = [FakeDev(i, 0) for i in range(8)]
        grid = mesh_device_grid(MeshConfig(num_data=1, num_model=8), devs)
        assert grid.shape == (1, 8)


@pytest.mark.parametrize(
    "preset,devices,chips_per_host",
    [
        # multi-host v5e exposes 4 chips per host VM; each preset's
        # num_model must produce intra-host model groups at its own
        # documented device count.
        ("configs/pod_571m.yaml", 64, 4),
        ("configs/catalog_10m_2host.yaml", 16, 4),
        ("configs/catalog_10m_2host.yaml", 16, 8),
        ("configs/full_category_8chip.yaml", 8, 4),
    ],
)
def test_preset_model_axis_intra_host(preset, devices, chips_per_host):
    from pathlib import Path

    cfg = Config.from_yaml(Path(__file__).resolve().parent.parent / preset)
    devs = fake_slice(devices // chips_per_host, chips_per_host)
    grid = mesh_device_grid(cfg.mesh, devs)
    assert_model_groups_intra_process(grid)
    assert grid.size == devices


def test_real_devices_build_mesh():
    # build_mesh over the 8-device virtual CPU mesh still produces a
    # working Mesh (single-process branch, mesh_utils path).
    import jax

    from twotower_tpu.parallel import build_mesh

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = build_mesh(MeshConfig(num_data=4, num_model=2), devs[:8])
    assert mesh.devices.shape == (4, 2)
    assert set(mesh.devices.ravel()) == set(devs[:8])
