"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Mirrors SURVEY.md section 4's test strategy — unit tests run on CPU with
``xla_force_host_platform_device_count=8`` so multi-device sharding logic is
exercised in-process without TPU hardware.
"""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng() -> np.random.Generator:
    return np.random.default_rng(42)


@pytest.fixture()
def tiny_config():
    from twotower_tpu.config import Config

    cfg = Config()
    return cfg.with_overrides(
        {
            "model.embedding_dim": 16,
            "model.user_tower_dims": [32, 16],
            "model.item_tower_dims": [32, 16],
            "training.batch_size": 32,
            "preprocessing.min_interactions_per_user": 2,
            "preprocessing.min_interactions_per_item": 2,
        }
    )
