"""Headline benchmark: training examples/sec/chip on the flagship config.

Runs the full jitted train step (both towers, in-batch sampled softmax with
log-Q correction, Adam update) at the reference's model scale — embedding 128,
towers [512,256,128] (reference: configs/data_config.yaml:54-66) — on
synthetic interactions (zero-egress environment; data content does not affect
step cost, shapes do).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline derivation (BASELINE.md): the reference reports 2.3 h training time
for its development run (reference README.md:80) under batch 1024 x 50 epochs
on a ~1M-interaction dev slice => ~50M examples / 8280 s ≈ 6,000 examples/s
on the TF-CPU stack. vs_baseline = measured / 6000.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_EXAMPLES_PER_SEC = 6000.0

# Flagship single-chip shapes: big enough to saturate the MXU, small enough
# to compile fast. Batch 4096 (BASELINE.json config 2), 1M users, 500k items.
BATCH = 4096
NUM_USERS = 1_000_000
NUM_ITEMS = 500_000
WARMUP_STEPS = 5
MEASURE_STEPS = 50


def main() -> None:
    import jax
    import jax.numpy as jnp

    from twotower_tpu.config import Config
    from twotower_tpu.models import two_tower
    from twotower_tpu.training import TrainState, make_optimizer, make_train_step

    cfg = Config().with_overrides({"training.batch_size": BATCH})
    optimizer = make_optimizer(cfg.training)
    params = two_tower.init_params(
        jax.random.PRNGKey(0), cfg.model, NUM_USERS, NUM_ITEMS
    )
    state = TrainState.for_config(params, optimizer, cfg)

    num_items_padded = params["item_embedding"].shape[0]
    log_q = jnp.log(jnp.full((num_items_padded,), 1.0 / NUM_ITEMS, jnp.float32))
    step = make_train_step(cfg, optimizer, log_q)

    rng = np.random.default_rng(0)
    host_batches = [
        {
            "user_idx": rng.integers(0, NUM_USERS, BATCH).astype(np.int32),
            "item_idx": rng.integers(0, NUM_ITEMS, BATCH).astype(np.int32),
            "weight": np.ones(BATCH, np.float32),
        }
        for _ in range(8)
    ]
    batches = [{k: jnp.asarray(v) for k, v in b.items()} for b in host_batches]
    step_rng = jax.random.PRNGKey(1)

    for i in range(WARMUP_STEPS):
        state, metrics = step(state, batches[i % len(batches)], step_rng)
    _ = float(metrics["loss"])  # hard sync: scalar fetch forces completion

    # Two-point slope: some PJRT transports ACK before device completion, so
    # block_until_ready alone under-measures; a final scalar fetch (which the
    # full state chain feeds) is the only hard sync, and measuring two run
    # lengths cancels its fixed latency out of the per-step time.
    def run(n_steps: int) -> float:
        nonlocal state
        t0 = time.perf_counter()
        for i in range(n_steps):
            state, metrics = step(state, batches[i % len(batches)], step_rng)
        _ = float(metrics["loss"])
        return time.perf_counter() - t0

    n1, n2 = MEASURE_STEPS, MEASURE_STEPS * 4
    t1 = run(n1)
    t2 = run(n2)
    step_s = max((t2 - t1) / (n2 - n1), 1e-9)

    n_chips = jax.device_count()
    eps_per_chip = BATCH / step_s / n_chips
    print(
        json.dumps(
            {
                "metric": "train_examples_per_sec_per_chip",
                "value": round(eps_per_chip, 1),
                "unit": "examples/s/chip",
                "vs_baseline": round(eps_per_chip / BASELINE_EXAMPLES_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
