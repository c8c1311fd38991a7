"""Offline smoke of the metric-parity packet (benchmarks/parity_packet.py).

Patches ``datasets.load_dataset`` exactly like the reference's own loader
tests (reference: tests/unit/test_amazon_loader.py:65) so the full
download -> streaming prepare -> streamed train -> exact evaluate chain runs
end to end with zero network, then asserts the parity table contract.
"""

import importlib.util
import json
import sys
from pathlib import Path
from unittest.mock import MagicMock, patch

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]


def _load_driver():
    spec = importlib.util.spec_from_file_location(
        "parity_packet", REPO / "benchmarks" / "parity_packet.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _fake_kcore_dataset():
    """A MagicMock mimicking a HF 5-core dataset dict: latent-structured
    interactions so the smoke training beats zero recall."""
    import pandas as pd

    from twotower_tpu.data.synthetic import generate_interactions

    inter = generate_interactions(
        num_users=300, num_items=120, num_interactions=9_000, seed=7,
        affinity_scale=3.0,
    )
    df = pd.DataFrame(
        {
            "user_id": inter.user_id,
            "parent_asin": inter.item_id,
            "rating": inter.rating,
            "timestamp": inter.timestamp,
        }
    )
    thirds = np.array_split(np.arange(len(df)), 3)
    parts = {
        "train": df.iloc[thirds[0]],
        "valid": df.iloc[thirds[1]],
        "test": df.iloc[thirds[2]],
    }
    ds = MagicMock()
    ds.keys.return_value = list(parts)
    ds.__getitem__.side_effect = lambda split: MagicMock(
        to_pandas=MagicMock(return_value=parts[split])
    )
    return ds


@pytest.mark.slow
def test_parity_packet_smoke(tmp_path):
    driver = _load_driver()
    with patch("datasets.load_dataset", return_value=_fake_kcore_dataset()):
        rc = driver.main(
            [
                "--workdir", str(tmp_path / "wd"),
                "--categories", "All_Beauty",
                "--override",
                "training.epochs=2",
                "training.batch_size=256",
                "model.embedding_dim=16",
                "model.user_tower_dims=[32,16]",
                "model.item_tower_dims=[32,16]",
            ]
        )
    assert rc == 0
    result = json.loads((tmp_path / "wd" / "parity_result.json").read_text())
    assert set(result["stages"]) == {"download", "prepare", "train", "evaluate"}
    table = result["parity_table"]
    # the table carries this run's number NEXT TO the reference's published
    # dev/prod values (reference README.md:80)
    for metric in ("recall@10", "ndcg@10"):
        row = table[metric]
        assert row["this_run"] is not None and 0.0 <= row["this_run"] <= 1.0
        assert row["development"] > 0 and row["production"] > 0
    # the chain actually trained on the downloaded->prepared artifact
    assert result["train"]["num_items"] == result["prepared"]["num_items"]
    assert result["evaluate"]["rows"] > 0


def test_parity_packet_reference_numbers_match_baseline():
    """The constants in the driver must match BASELINE.md's parsed table."""
    driver = _load_driver()
    assert driver.REFERENCE["recall@10"] == {
        "development": 0.342, "production": 0.358,
    }
    assert driver.REFERENCE["ndcg@10"] == {
        "development": 0.287, "production": 0.295,
    }


def test_make_parity_target_exists():
    makefile = (REPO / "Makefile").read_text()
    assert "parity:" in makefile and "parity_packet.py" in makefile
