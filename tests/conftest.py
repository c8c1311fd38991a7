"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Mirrors SURVEY.md section 4's test strategy — unit tests run on CPU with
``xla_force_host_platform_device_count=8`` so multi-device sharding logic is
exercised in-process without TPU hardware.
"""

import os

# Must be set before jax is imported anywhere. Force (not setdefault): the
# session environment pins JAX_PLATFORMS=axon (the real TPU tunnel), and unit
# tests must never burn the single TPU chip on tiny remote-compiled shapes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "intra_op_parallelism_threads" not in flags:
    # 8 virtual devices on a small shared host: each device's collective
    # participates from its own Eigen worker, and XLA's in-process
    # rendezvous aborts the process if any participant is starved > 40 s
    # (rendezvous.cc "Termination timeout ... Exiting to ensure a
    # consistent program state"). Single-threaded intra-op keeps 8 device
    # threads schedulable on 4 cores even under compile-thread load.
    flags += " --xla_cpu_multi_thread_eigen=false intra_op_parallelism_threads=1"
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # Belt for the braces above: even single-threaded participants can be
    # starved past the default ~40 s termination window when the whole
    # suite shares 4 throttled cores — warn at 1 min, abort only at 3
    # (not higher: a genuinely livelocked rendezvous would stall the whole
    # suite for the full window before XLA kills it).
    flags += (
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=60"
        " --xla_cpu_collective_call_terminate_timeout_seconds=180"
        " --xla_cpu_collective_timeout_seconds=180"
    )
os.environ["XLA_FLAGS"] = flags
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The axon PJRT plugin (sitecustomize) re-selects "axon,cpu" programmatically,
# overriding JAX_PLATFORMS from the environment — force CPU via jax.config so
# unit tests never run on (or wait for) the tunneled TPU chip.
jax.config.update("jax_platforms", "cpu")


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
