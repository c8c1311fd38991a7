"""Worker process for the 2-process multi-host training test.

Launched twice by tests/test_multihost.py with a shared coordinator port;
each process owns 2 virtual CPU devices (4 global), initializes
``jax.distributed``, and trains one epoch of the sparse mesh path feeding
ONLY its per-process batch slice (BatchPipeline host_shard +
jax.make_array_from_process_local_data). Prints the final epoch loss for
cross-process and vs-single-process comparison.
"""

import json
import os
import sys


def main() -> int:
    port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    # Mesh model-axis size: 2 = the standard split (data shards host-local);
    # 4 = every device replicates the batch rows, so each data shard's
    # replica group SPANS both processes — the topology a contiguous
    # per-process slice assumption breaks on.
    num_model = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")
    from twotower_tpu.parallel.mesh import initialize_multihost

    initialize_multihost(f"127.0.0.1:{port}", nproc, pid)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 2 * nproc
    assert len(jax.local_devices()) == 2

    import numpy as np

    from twotower_tpu.config import Config
    from twotower_tpu.data import BatchPipeline, Preprocessor, generate_interactions
    from twotower_tpu.parallel import build_mesh
    from twotower_tpu.training import Trainer

    cfg = Config().with_overrides(
        {
            "model.embedding_dim": 16,
            "model.user_tower_dims": [32, 16],
            "model.item_tower_dims": [32, 16],
            "model.dropout_rate": 0.0,
            "training.batch_size": 32,
            "training.epochs": 1,
            "training.log_every_steps": 1000,
            "mesh.num_model": num_model,
            "preprocessing.min_interactions_per_user": 2,
            "preprocessing.min_interactions_per_item": 2,
        }
    )
    # Identical seeded data on every process (the real pipeline reads the
    # same artifact set everywhere); only the fed slice differs.
    data = generate_interactions(
        num_users=200, num_items=100, num_interactions=3000, noise=0.2
    )
    pp = Preprocessor(cfg.preprocessing)
    data = pp.process(data)
    splits = pp.split_data(data)
    mesh = build_mesh(cfg.mesh)  # spans BOTH processes' devices
    trainer = Trainer(
        cfg, log_q=np.log(pp.vocab.items.frequencies + 1e-12), mesh=mesh
    )
    state = trainer.init_state(len(pp.vocab.users), len(pp.vocab.items))
    from twotower_tpu.parallel.sharding import batch_shardings, process_row_spans

    pipe = BatchPipeline(
        splits.train,
        cfg.training.batch_size,
        seed=cfg.training.seed,
        host_spans=process_row_spans(
            batch_shardings(mesh, cfg.mesh), cfg.training.batch_size
        ),
    )
    res = trainer.fit(state, pipe)
    loss = res.history[-1].get("loss")
    print("RESULT " + json.dumps({"pid": pid, "loss": loss}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
