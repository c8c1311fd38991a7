"""Perf-floor guard in bench.py: regressions vs the newest recorded
BENCH_r*.json fail loudly instead of waiting for a human to diff round
files (VERDICT r2 weak #8)."""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402


def _write(tmp_path: Path, round_num: int, value: float) -> None:
    (tmp_path / f"BENCH_r{round_num:02d}.json").write_text(
        json.dumps(
            {
                "metric": "train_examples_per_sec_per_chip",
                "value": value,
                "unit": "examples/s/chip",
                "vs_baseline": value / 6000.0,
            }
        )
    )


class TestLastRecordedValue:
    def test_no_history(self, tmp_path):
        assert bench.last_recorded_value(str(tmp_path)) is None

    def test_picks_newest_round(self, tmp_path):
        _write(tmp_path, 1, 100.0)
        _write(tmp_path, 2, 200.0)
        _write(tmp_path, 10, 300.0)  # r10 > r2 numerically, not lexically
        assert bench.last_recorded_value(str(tmp_path)) == 300.0

    def test_malformed_record_is_ignored(self, tmp_path):
        (tmp_path / "BENCH_r03.json").write_text("{not json")
        assert bench.last_recorded_value(str(tmp_path)) is None

    def test_malformed_newest_falls_back_to_prior_round(self, tmp_path):
        # A corrupt newest round must not silently disable the floor
        # (ADVICE r03): the next-newest parseable round is consulted.
        _write(tmp_path, 2, 200.0)
        _write(tmp_path, 3, 300.0)
        (tmp_path / "BENCH_r04.json").write_text("{not json")
        assert bench.last_recorded_value(str(tmp_path)) == 300.0

    def test_value_missing_falls_back(self, tmp_path):
        _write(tmp_path, 2, 200.0)
        (tmp_path / "BENCH_r03.json").write_text(json.dumps({"rc": 0}))
        assert bench.last_recorded_value(str(tmp_path)) == 200.0

    def test_repo_root_history_exists(self):
        # The real repo has round records; the default path must find them.
        assert bench.last_recorded_value() is not None


class TestCheckFloor:
    def test_within_tolerance_passes(self, tmp_path, capsys):
        _write(tmp_path, 2, 1000.0)
        assert bench.check_floor(950.0, str(tmp_path))  # -5% < 10% floor
        assert "perf floor ok" in capsys.readouterr().err

    def test_improvement_passes(self, tmp_path):
        _write(tmp_path, 2, 1000.0)
        assert bench.check_floor(1500.0, str(tmp_path))

    def test_regression_fails_loudly(self, tmp_path, capsys):
        _write(tmp_path, 2, 1000.0)
        assert not bench.check_floor(850.0, str(tmp_path))  # -15%
        assert "PERF REGRESSION" in capsys.readouterr().err

    def test_no_history_passes(self, tmp_path):
        assert bench.check_floor(1.0, str(tmp_path))
