"""Smoke test for the config-3 lifecycle driver (benchmarks/lifecycle_config3.py).

Runs all four stages — generate -> streaming prepare -> streamed training ->
exact evaluation — at seconds-scale sizes through the same subprocess
commands the full-scale run uses, and asserts the result contract PARITY.md
cites. CPU-only (conftest forces JAX_PLATFORMS=cpu, which the stage
subprocesses inherit).
"""

import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


@pytest.mark.slow
def test_lifecycle_smoke(tmp_path):
    proc = subprocess.run(
        [
            sys.executable,
            str(REPO / "benchmarks" / "lifecycle_config3.py"),
            "--smoke",
            "--workdir", str(tmp_path / "wd"),
        ],
        capture_output=True,
        text=True,
        timeout=540,
        cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-3000:]
    result = json.loads(
        (tmp_path / "wd" / "lifecycle_result.json").read_text()
    )
    assert set(result["stages"]) == {"generate", "prepare", "train", "evaluate"}
    # the prepared artifact fed training: entity counts agree end-to-end
    assert result["train"]["num_items"] == result["prepared"]["num_items"]
    assert result["train"]["epochs_run"] >= 1
    # exact evaluation scored the test slice of the SAME artifact from the
    # best checkpoint, reporting the full reference K ladder
    ks = {1, 5, 10, 20, 50, 100}
    metrics = result["evaluate"]["metrics"]
    assert {f"recall@{k}" for k in ks} <= set(metrics)
    assert {f"ndcg@{k}" for k in ks} <= set(metrics)
    assert result["evaluate"]["rows"] > 0
    # recall is monotone in K (sanity that the metric math saw real scores)
    assert metrics["recall@100"] >= metrics["recall@10"] >= metrics["recall@1"]
