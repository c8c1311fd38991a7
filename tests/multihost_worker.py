"""Worker process for the 2-process multi-host training tests.

Launched twice by tests/test_multihost.py with a shared coordinator port;
each process owns 2 virtual CPU devices (4 global), initializes
``jax.distributed``, and trains the sparse mesh path feeding ONLY its
per-process batch slice (BatchPipeline host_spans +
jax.make_array_from_process_local_data). Prints the final epoch loss for
cross-process and vs-single-process comparison.

Phases (argv[5], default "train"):

- ``train``: one epoch of training, loss printed (the round-2 step-math
  parity test).
- ``lifecycle``: the FULL training lifecycle — train with per-epoch
  mesh-aware validation (sharded-corpus Evaluator), early stopping, and
  collective Orbax checkpointing to a shared dir (argv[6]); prints the
  early-stop decision, best metric, and saved steps so the launcher can
  assert both processes agree.
- ``resume``: restore the latest checkpoint from argv[6] into a freshly
  initialized mesh-sharded state, then train ONE more epoch with
  validation — the restart half of train -> eval -> checkpoint -> resume.
"""

import json
import os
import sys
from pathlib import Path

# Self-sufficient import: the repo package is used from the source tree (not
# pip-installed), and a script's sys.path[0] is tests/, not the repo root.
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _build(cfg_overrides: dict):
    import numpy as np

    from twotower_tpu.config import Config
    from twotower_tpu.data import BatchPipeline, Preprocessor, generate_interactions
    from twotower_tpu.parallel import build_mesh
    from twotower_tpu.parallel.sharding import batch_shardings, process_row_spans
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
            "preprocessing.min_interactions_per_user": 2,
            "preprocessing.min_interactions_per_item": 2,
            **cfg_overrides,
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
    log_q = np.log(pp.vocab.items.frequencies + 1e-12)
    pipe = BatchPipeline(
        splits.train,
        cfg.training.batch_size,
        seed=cfg.training.seed,
        host_spans=process_row_spans(
            batch_shardings(mesh, cfg.mesh), cfg.training.batch_size
        ),
    )
    return cfg, pp, splits, mesh, log_q, pipe


def main() -> int:
    port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    # Mesh model-axis size: 2 = the standard split (data shards host-local);
    # 4 = every device replicates the batch rows, so each data shard's
    # replica group SPANS both processes — the topology a contiguous
    # per-process slice assumption breaks on.
    num_model = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    phase = sys.argv[5] if len(sys.argv) > 5 else "train"
    ckpt_dir = sys.argv[6] if len(sys.argv) > 6 else None
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")
    from twotower_tpu.parallel.mesh import initialize_multihost

    initialize_multihost(f"127.0.0.1:{port}", nproc, pid)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 2 * nproc
    assert len(jax.local_devices()) == 2

    from twotower_tpu.training import Trainer

    if phase == "train":
        cfg, pp, splits, mesh, log_q, pipe = _build(
            {"mesh.num_model": num_model,
             # num_model=4 spans both 2-device processes on purpose (the
             # replica-group-crosses-hosts topology); opt past the DCN guard.
             "mesh.allow_dcn_model_axis": num_model > 2}
        )
        trainer = Trainer(cfg, log_q=log_q, mesh=mesh)
        state = trainer.init_state(len(pp.vocab.users), len(pp.vocab.items))
        res = trainer.fit(state, pipe)
        loss = res.history[-1].get("loss")
        print("RESULT " + json.dumps({"pid": pid, "loss": loss}), flush=True)
        return 0

    # --- full lifecycle: train + sharded validation + checkpoint [+ resume]
    from twotower_tpu.evaluation import Evaluator
    from twotower_tpu.utils.checkpoint import CheckpointManager

    assert ckpt_dir, "lifecycle/resume phases need a shared checkpoint dir"
    overrides = {
        "mesh.num_model": num_model,
        "mesh.allow_dcn_model_axis": num_model > 2,
        "training.epochs": 3,
        "training.patience": 1,
        "training.validation_freq": 1,
    }
    cfg, pp, splits, mesh, log_q, pipe = _build(overrides)
    num_items = len(pp.vocab.items)
    evaluator = Evaluator(cfg, num_items, batch_size=64, mesh=mesh)
    val_fn = evaluator.make_evaluate_fn(splits.val.user_idx, splits.val.item_idx)
    mgr = CheckpointManager(ckpt_dir, keep=3)
    trainer = Trainer(
        cfg, log_q=log_q, mesh=mesh, evaluate_fn=val_fn, checkpoint_manager=mgr
    )

    if phase == "lifecycle":
        state = trainer.init_state(len(pp.vocab.users), num_items)
        res = trainer.fit(state, pipe)
        out = {
            "pid": pid,
            "loss": res.history[-1].get("loss"),
            "epochs_run": len(res.history),
            "best_metric": res.best_metric,
            "best_step": res.best_step,
            "val_history": [
                {k: v for k, v in rec.items() if k.startswith("val/")}
                for rec in res.history
            ],
            "ckpt_steps": mgr.all_steps(),
        }
        print("RESULT " + json.dumps(out), flush=True)
        return 0

    if phase == "resume":
        template = trainer.init_state(len(pp.vocab.users), num_items)
        state, meta = mgr.restore(template)
        start_epoch = int(meta["epoch"])
        restored_step = int(state.step)
        assert restored_step == meta["step"], (restored_step, meta)
        # One more epoch from where training left off.
        trainer.config = trainer.config.with_overrides(
            {"training.epochs": start_epoch + 1}
        )
        res = trainer.fit(state, pipe, start_epoch=start_epoch)
        out = {
            "pid": pid,
            "restored_step": restored_step,
            "restored_epoch": start_epoch,
            "final_step": int(res.state.step),
            "loss": res.history[-1].get("loss"),
            "epochs_run": len(res.history),
            "val_last": {
                k: v
                for k, v in res.history[-1].items()
                if k.startswith("val/")
            },
            "ckpt_steps": mgr.all_steps(),
        }
        print("RESULT " + json.dumps(out), flush=True)
        return 0

    raise SystemExit(f"unknown phase {phase!r}")


if __name__ == "__main__":
    sys.exit(main())
