"""Measure the sparse step's all-to-all capacity trade-off (PARITY.md).

The sparse mesh step's a2a exchange moves ``S x cap x (4 + 4E)`` bytes per
device per lookup/update call (ids + rows), where ``cap`` is the
per-destination bucket size: worst-case ``cap = k`` (``a2a_capacity_factor
<= 0``) vs the flagship ``cap ~ f x k / S`` (``parallel/sparse_spmd.py
::_capacity``).  This benchmark runs the REAL sharded sparse train step on
an 8-virtual-device mesh over shuffled batches for several factors and
reports, per factor:

- analytic a2a bytes/device/step (exact — capacities are static shapes),
- measured wall time per step (CPU-mesh; directional, the traffic counts
  are the hardware-independent result),
- total dropped ids over the run (must be 0 for any shippable factor).

Usage::

    python benchmarks/a2a_capacity.py [--batch 8192] [--steps 6]
        [--factors 0,1.25,2.0] [--num-data 4] [--num-model 2]
"""

from __future__ import annotations

import argparse
import json
import os
import time

# Force the host platform: this benchmark needs an 8-virtual-device mesh
# (the traffic counts are analytic/exact; CPU wall time is directional).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax
import jax.numpy as jnp
import numpy as np

# The axon PJRT sitecustomize re-selects "axon,cpu" over the env var; force
# CPU via jax.config so the 8-virtual-device flag takes effect.
jax.config.update("jax_platforms", "cpu")


def a2a_bytes_per_device(
    batch: int, num_data: int, num_model: int, emb_dim: int, factor: float
) -> int:
    """Exact per-device a2a payload bytes per step (in_batch sampling).

    Four exchange calls per step — user/item lookups + user/item row
    updates — each moving ``S x cap`` id int32s and ``S x cap x E`` f32
    rows out of every device (`parallel/a2a.py`).
    """
    from twotower_tpu.parallel.sparse_spmd import _capacity

    world = num_data * num_model
    k = batch // num_data // num_model
    cap = _capacity(k, world, factor)
    per_call = world * cap * (4 + 4 * emb_dim)
    return 4 * per_call


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--factors", type=str, default="0,1.25,2.0")
    ap.add_argument("--num-data", type=int, default=4)
    ap.add_argument("--num-model", type=int, default=2)
    ap.add_argument("--num-users", type=int, default=200_000)
    ap.add_argument("--num-items", type=int, default=100_000)
    args = ap.parse_args()

    from twotower_tpu.config import Config
    from twotower_tpu.models import two_tower
    from twotower_tpu.parallel import build_mesh, shard_state
    from twotower_tpu.parallel.sharding import batch_shardings, replicated
    from twotower_tpu.parallel.sparse_spmd import (
        _capacity,
        make_sparse_sharded_train_step,
    )
    from twotower_tpu.training import make_optimizer
    from twotower_tpu.training.state import TrainState

    factors = [float(f) for f in args.factors.split(",")]
    world = args.num_data * args.num_model
    k = args.batch // args.num_data // args.num_model
    cfg = Config.from_dict(
        {
            "model": {"embedding_dim": 128, "dropout_rate": 0.0},
            "training": {
                "batch_size": args.batch,
                "sparse_table_updates": True,
            },
            "mesh": {
                "num_data": args.num_data,
                "num_model": args.num_model,
                "shard_embeddings": True,
            },
        }
    )
    optimizer = make_optimizer(cfg.training)
    params = two_tower.init_params(
        jax.random.PRNGKey(0), cfg.model, args.num_users, args.num_items
    )
    state = TrainState.for_config(params, optimizer, cfg)
    rng_np = np.random.default_rng(42)

    results = []
    for factor in factors:
        fcfg = cfg.with_overrides({"mesh.a2a_capacity_factor": factor})
        mesh = build_mesh(fcfg.mesh, jax.devices()[:world])
        sharded = shard_state(mesh, state, fcfg.mesh, sparse_mesh=True)
        step = make_sparse_sharded_train_step(
            fcfg, optimizer, mesh, sharded, donate=False
        )
        b_sh = batch_shardings(mesh, fcfg.mesh)
        rng = jax.device_put(jax.random.PRNGKey(0), replicated(mesh))

        def make_batch():
            # Shuffled batches over the full id space — the distribution the
            # factor guidance assumes (duplicates dedup before the exchange).
            return {
                "user_idx": jax.device_put(
                    jnp.asarray(
                        rng_np.integers(0, args.num_users, args.batch),
                        jnp.int32,
                    ),
                    b_sh,
                ),
                "item_idx": jax.device_put(
                    jnp.asarray(
                        rng_np.integers(0, args.num_items, args.batch),
                        jnp.int32,
                    ),
                    b_sh,
                ),
                "weight": jax.device_put(
                    jnp.ones((args.batch,), jnp.float32), b_sh
                ),
            }

        # Warmup (compile) + timed steps on fresh shuffled batches.
        st, m = step(sharded, make_batch(), rng)
        jax.block_until_ready(m["loss"])
        dropped = float(m["dropped_ids"])
        times = []
        for _ in range(args.steps):
            batch = make_batch()
            t0 = time.perf_counter()
            st, m = step(st, batch, rng)
            jax.block_until_ready(m["loss"])
            times.append(time.perf_counter() - t0)
            dropped += float(m["dropped_ids"])

        cap = _capacity(k, world, factor)
        res = {
            "factor": factor,
            "capacity": cap,
            "worst_case_capacity": k,
            "a2a_mib_per_device_per_step": round(
                a2a_bytes_per_device(
                    args.batch, args.num_data, args.num_model, 128, factor
                )
                / 2**20,
                3,
            ),
            "step_ms_median": round(1e3 * float(np.median(times)), 2),
            "dropped_ids_total": dropped,
        }
        results.append(res)
        print(json.dumps(res), flush=True)

    # Worst case is always factor<=0 (capacity=k), computed analytically —
    # independent of which factors were requested or their order.
    base = a2a_bytes_per_device(
        args.batch, args.num_data, args.num_model, 128, 0.0
    ) / 2**20
    for r in results:
        r["traffic_ratio_vs_worst"] = round(
            base / r["a2a_mib_per_device_per_step"], 2
        )
    print(
        json.dumps(
            {
                "mesh": f"{args.num_data}x{args.num_model}",
                "batch": args.batch,
                "summary": results,
            }
        )
    )


if __name__ == "__main__":
    main()
