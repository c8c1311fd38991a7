"""Scaling-efficiency benchmark harness.

Measures training examples/sec for the full sharded step across mesh sizes
and reports parallel efficiency vs the single-device run — the measurement
BASELINE.md's ">=80% scaling efficiency at 2+ hosts" target is scored with.
On real multi-chip hardware this produces the headline scaling numbers; on
the CPU backend (``XLA_FLAGS=--xla_force_host_platform_device_count=N``) it
validates the machinery end-to-end (CPU timings are not meaningful as
TPU throughput).

CLI: ``python -m twotower_tpu.parallel.scaling [--devices 1 2 4 8] ...``
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from twotower_tpu.logging_utils import get_logger, setup_logging

logger = get_logger(__name__)


def measure_mesh(
    config,
    n_devices: int,
    *,
    num_users: int,
    num_items: int,
    steps: int = 30,
    warmup: int = 5,
) -> dict:
    """Examples/sec of the sharded train step on an n-device (data x model)
    mesh. Batch is the GLOBAL batch (weak scaling: per-device batch fixed
    means passing batch_size * n; this uses the config's batch as global)."""
    import jax
    import jax.numpy as jnp

    from twotower_tpu.models import two_tower
    from twotower_tpu.parallel import build_mesh, make_sharded_train_step, shard_state
    from twotower_tpu.parallel.sharding import batch_shardings, replicated
    from twotower_tpu.training.state import TrainState, make_optimizer

    cfg = config.with_overrides(
        {"mesh.num_model": 2 if n_devices % 2 == 0 and n_devices > 1 else 1}
    )
    from twotower_tpu.parallel.sparse_spmd import use_sparse_mesh_path

    sparse = use_sparse_mesh_path(cfg)
    mesh = build_mesh(cfg.mesh, jax.devices()[:n_devices])
    optimizer = make_optimizer(cfg.training)
    params = two_tower.init_params(
        jax.random.PRNGKey(0), cfg.model, num_users, num_items
    )
    if sparse:
        state = shard_state(
            mesh, TrainState.for_config(params, optimizer, cfg), cfg.mesh,
            sparse_mesh=True,
        )
    else:
        state = shard_state(mesh, TrainState.create(params, optimizer), cfg.mesh)
    step = make_sharded_train_step(cfg, optimizer, mesh, state)

    bs = cfg.training.batch_size
    rng = np.random.default_rng(0)
    b_sh = batch_shardings(mesh, cfg.mesh)
    batch = {
        "user_idx": jax.device_put(
            jnp.asarray(rng.integers(0, num_users, bs), jnp.int32), b_sh
        ),
        "item_idx": jax.device_put(
            jnp.asarray(rng.integers(0, num_items, bs), jnp.int32), b_sh
        ),
        "weight": jax.device_put(jnp.ones((bs,), jnp.float32), b_sh),
    }
    step_rng = jax.device_put(jax.random.PRNGKey(1), replicated(mesh))

    for _ in range(warmup):
        state, metrics = step(state, batch, step_rng)
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, batch, step_rng)
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0
    eps = steps * bs / dt
    return {
        "devices": n_devices,
        "mesh": dict(mesh.shape),
        "global_batch": bs,
        "examples_per_sec": round(eps, 1),
        "step_ms": round(dt / steps * 1e3, 3),
        "sparse_path": sparse,
    }


def run_scaling(config, device_counts: list[int], **kw) -> list[dict]:
    import jax

    available = len(jax.devices())
    results = []
    base_eps_per_dev = None
    for n in device_counts:
        if n > available:
            logger.warning("skipping %d devices (only %d available)", n, available)
            continue
        r = measure_mesh(config, n, **kw)
        per_dev = r["examples_per_sec"] / n
        if base_eps_per_dev is None:
            base_eps_per_dev = per_dev
        r["efficiency"] = round(per_dev / base_eps_per_dev, 3)
        results.append(r)
        logger.info(
            "%d devices: %.0f ex/s (%.1f%% efficiency)",
            n, r["examples_per_sec"], 100 * r["efficiency"],
        )
    return results


def main(argv: list[str] | None = None) -> int:
    from twotower_tpu.utils.platform import respect_env_platform

    respect_env_platform()
    from twotower_tpu.config import load_config, parse_cli_overrides

    setup_logging()
    p = argparse.ArgumentParser(prog="scaling-bench")
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--override", nargs="*", default=[], metavar="KEY=VALUE")
    p.add_argument("--devices", nargs="*", type=int, default=[1, 2, 4, 8])
    p.add_argument("--num-users", type=int, default=100_000)
    p.add_argument("--num-items", type=int, default=50_000)
    p.add_argument("--steps", type=int, default=30)
    args = p.parse_args(argv)
    config = load_config(args.config, parse_cli_overrides(args.override))
    results = run_scaling(
        config,
        args.devices,
        num_users=args.num_users,
        num_items=args.num_items,
        steps=args.steps,
    )
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
