"""Subprocess worker: lower a shipped preset's FULL sharded train step at
its real shapes and topology — abstract (jax.eval_shape) state, so the
10M/50M-row tables never allocate. Catches config-shape/sharding
composition errors (batch divisibility, table padding vs world size, a2a
capacity arithmetic, loss-mode routing) for topologies bigger than the
test host, without touching real memory.

argv: config_path n_devices num_users num_items
"""

import sys
from pathlib import Path

# Self-sufficient import: the repo package is used from the source tree (not
# pip-installed), and a script's sys.path[0] is tests/, not the repo root.
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    config_path, n_devices = sys.argv[1], int(sys.argv[2])
    num_users, num_items = int(sys.argv[3]), int(sys.argv[4])

    import os

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_devices}"
    )
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from twotower_tpu.config import load_config
    from twotower_tpu.models import two_tower
    from twotower_tpu.parallel import build_mesh, make_sharded_train_step
    from twotower_tpu.parallel.sharding import (
        batch_shardings,
        replicated,
        state_shardings,
    )
    from twotower_tpu.training.state import TrainState, make_optimizer

    from twotower_tpu.parallel.sparse_spmd import use_sparse_mesh_path

    cfg = load_config(config_path)
    mesh = build_mesh(cfg.mesh, jax.devices()[:n_devices])
    optimizer = make_optimizer(cfg.training)
    # Mirror init_train_state's dispatch exactly: sparse mesh path gets the
    # sparse TrainState (packed table moments), the dense GSPMD path a
    # dense one.
    sparse = use_sparse_mesh_path(cfg)

    def make_state():
        params = two_tower.init_params(
            jax.random.PRNGKey(0), cfg.model, num_users, num_items
        )
        if sparse:
            return TrainState.for_config(params, optimizer, cfg)
        return TrainState.create(params, optimizer)

    state_sds = jax.eval_shape(make_state)
    sh = state_shardings(mesh, state_sds, cfg.mesh, sparse_mesh=sparse)
    state_sds = jax.tree_util.tree_map(
        lambda s, d: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=d),
        state_sds,
        sh,
    )
    step = make_sharded_train_step(
        cfg, optimizer, mesh, state_sds, None, num_items=num_items
    )
    b_sh = batch_shardings(mesh, cfg.mesh)
    bsz = cfg.training.batch_size
    batch_sds = {
        "user_idx": jax.ShapeDtypeStruct((bsz,), jnp.int32, sharding=b_sh),
        "item_idx": jax.ShapeDtypeStruct((bsz,), jnp.int32, sharding=b_sh),
        "weight": jax.ShapeDtypeStruct((bsz,), jnp.float32, sharding=b_sh),
    }
    rng_sds = jax.ShapeDtypeStruct(
        (2,), jnp.uint32, sharding=replicated(mesh)
    )
    lowered = jax.jit(step).lower(state_sds, batch_sds, rng_sds)
    hlo = lowered.as_text()
    assert len(hlo) > 1000
    table_rows = state_sds.params["item_embedding"].shape[0]
    print(
        f"LOWER_OK devices={n_devices} batch={bsz} "
        f"item_rows={table_rows} hlo_bytes={len(hlo)}",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
