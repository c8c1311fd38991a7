"""Every shipped multi-chip preset must LOWER its full sharded train step
at its real batch size, table scale, and device topology.

The pod/catalog presets describe topologies (16-64 chips) and table sizes
(10M-100M rows) no test host can execute — but tracing + lowering needs
neither chips nor memory: the worker builds the state abstractly
(jax.eval_shape), attaches the real shardings, and jits .lower() on a
virtual CPU mesh of the preset's exact device count. This catches the
class of config-arithmetic bugs (batch divisibility, table padding vs
world size, a2a capacity sizing, sampling-mode routing) that otherwise
only surface at pod-deployment time."""

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

# (config, devices, representative num_users / num_items at that preset's
# documented scale — tables stay abstract, so size costs nothing)
PRESETS = [
    ("configs/catalog_10m_2host.yaml", 16, 40_000_000, 12_000_000),
    ("configs/pod_571m.yaml", 64, 54_000_000, 48_000_000),
    ("configs/full_category_8chip.yaml", 8, 8_000_000, 4_000_000),
]


@pytest.mark.slow
@pytest.mark.parametrize(
    "config,devices,users,items",
    PRESETS,
    ids=[p[0].split("/")[-1] for p in PRESETS],
)
def test_preset_lowers_at_real_shapes(config, devices, users, items):
    proc = subprocess.run(
        [
            sys.executable,
            str(REPO / "tests" / "preset_lower_worker.py"),
            str(REPO / config),
            str(devices),
            str(users),
            str(items),
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-3000:]
    assert "LOWER_OK" in proc.stdout, proc.stdout
