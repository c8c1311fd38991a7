"""``evaluate-model`` CLI — the reference's declared evaluation entry point
(reference: pyproject.toml:69 ``evaluate-model = src.evaluation.evaluate:main``,
invoked in README.md:76-77; module never existed there).

Restores a checkpoint (params + vocab manifest), rebuilds the eval split with
the SAME deterministic preprocessing, and reports Recall@K/NDCG@K/MRR over
the full corpus for K in ``retrieval.top_k_eval``.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import jax

from twotower_tpu.config import Config, load_config_for_checkpoint, parse_cli_overrides
from twotower_tpu.logging_utils import get_logger, setup_logging

logger = get_logger(__name__)


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="evaluate-model", description="Evaluate a trained two-tower checkpoint"
    )
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--override", nargs="*", default=[], metavar="KEY=VALUE")
    p.add_argument("--checkpoint-dir", type=str, required=True)
    p.add_argument("--step", type=int, default=None, help="checkpoint step (default latest)")
    src = p.add_mutually_exclusive_group()
    src.add_argument("--data", type=str, default=None, help="interactions parquet")
    src.add_argument(
        "--prepared-dir", type=str, default=None,
        help="prepare-data artifact directory: score the held-out slice of "
        "the already-encoded columns without re-running preprocessing",
    )
    src.add_argument("--synthetic", action="store_true")
    p.add_argument(
        "--batch-rows", type=int, default=1 << 20,
        help="rows per streamed parquet chunk for --prepared-dir",
    )
    p.add_argument("--synthetic-users", type=int, default=2000)
    p.add_argument("--synthetic-items", type=int, default=1000)
    p.add_argument("--synthetic-interactions", type=int, default=100_000)
    p.add_argument("--split", choices=["temporal", "random"], default="temporal")
    p.add_argument(
        "--subset", choices=["val", "test"], default="test",
        help="which held-out slice to score",
    )
    p.add_argument(
        "--rows", type=int, default=None,
        help="cap scoring to a strided subsample of this many held-out "
        "rows (same stride rule as train-model --val-rows and "
        "evaluation.oracle --rows, so capped numbers stay comparable)",
    )
    p.add_argument(
        "--mesh", action="store_true",
        help="evaluate over the config's device mesh: the encoded corpus "
        "stays row-sharded P(model, None) across devices instead of "
        "replicating per device — required for corpora that exceed one "
        "chip's HBM (same sharded path training-time validation uses)",
    )
    return p


def load_item_tokens(ckpt_dir: Path):
    """Token table saved next to the checkpoint by train-model (None if
    the model has no text tower)."""
    tokens_path = Path(ckpt_dir) / "item_tokens.npz"
    if not tokens_path.exists():
        return None
    import numpy as np

    with np.load(tokens_path) as tok:
        return tok["tokens"]


def _capped(user_idx, item_idx, rows: "int | None"):
    """Strided subsample (same rule as training.train.strided_subsample and
    evaluation.oracle.strided) so capped numbers are comparable across the
    three CLIs."""
    import numpy as np

    n = len(user_idx)
    if not rows or rows >= n:
        return user_idx, item_idx
    sel = np.linspace(0, n - 1, num=rows, dtype=np.int64)
    return user_idx[sel], item_idx[sel]


def restore_params(
    config: Config, ckpt_dir: Path, num_users: int, num_items: int,
    step=None, mesh=None,
):
    """Restore params from a checkpoint via a freshly-initialized template.

    ``mesh``: restore INTO mesh shardings (tables row-sharded over the
    model axis, dense replicated) — Orbax reads each device's rows
    directly, so a corpus/table too large for one chip restores without
    ever materializing whole on a single device."""
    from twotower_tpu.models import two_tower
    from twotower_tpu.training.state import TrainState, make_optimizer
    from twotower_tpu.utils.checkpoint import CheckpointManager

    optimizer = make_optimizer(config.training)
    params = two_tower.init_params(
        jax.random.PRNGKey(0), config.model, num_users, num_items
    )
    template = TrainState.for_config(params, optimizer, config)
    if mesh is not None and mesh.devices.size > 1:
        from twotower_tpu.parallel import shard_state

        template = shard_state(mesh, template, config.mesh)
    manager = CheckpointManager(ckpt_dir)
    if step is None:
        # Prefer the highest-validation-metric durable step over the merely
        # newest one: after async save starvation the NEWEST checkpoint is
        # the post-patience final state (strictly worse than the epoch
        # best), so "eval the latest" would silently disagree with
        # train_summary.json's best metric.
        step = manager.best_step()
        if step is not None and step != manager.latest_step():
            logger.warning(
                "restoring best-metric checkpoint step %d (latest is %d)",
                step, manager.latest_step(),
            )
    state, meta = manager.restore(template, step=step)
    if meta.get("post_starvation_final"):
        logger.warning(
            "restored checkpoint is the POST-STARVATION FINAL state, not "
            "the best epoch: the best validation (%.6g) was achieved at a "
            "step whose save was skipped; metrics from this restore will "
            "be worse than train_summary.json's best",
            meta.get("metrics", {}).get("best_val_at_stop", float("nan")),
        )
    return state.params, meta


def run(args, config: Config) -> dict:
    from twotower_tpu.data import Preprocessor
    from twotower_tpu.data.vocab import VocabPair
    from twotower_tpu.evaluation import Evaluator
    from twotower_tpu.training.train import load_interactions

    ckpt_dir = Path(args.checkpoint_dir)
    mesh = None
    if getattr(args, "mesh", False):
        from twotower_tpu.parallel import build_mesh

        mesh = build_mesh(config.mesh)
    if getattr(args, "prepared_dir", None):
        # Prepared-artifact fast path: encoded columns + checkpoint vocab,
        # no re-preprocessing (mirrors train-model --prepared-dir).
        from twotower_tpu.data.prepared import PreparedDataset

        if args.split != "temporal":
            raise SystemExit("--prepared-dir supports the temporal split only")
        dataset = PreparedDataset(args.prepared_dir, batch_rows=args.batch_rows)
        rule = dataset.temporal_rule(
            config.preprocessing.train_split, config.preprocessing.val_split
        )
        subset_cols = dataset.load_split(rule, args.subset)
        num_users, num_items = dataset.num_users, dataset.num_items
        vocab_dir = ckpt_dir / "vocab"
        if vocab_dir.exists():
            # Checkpoint parity check: the artifact's id spaces must be the
            # ones the model was trained with.
            ckpt_vocab = VocabPair.load(vocab_dir)
            if (
                len(ckpt_vocab.users) != num_users
                or len(ckpt_vocab.items) != num_items
            ):
                raise SystemExit(
                    f"prepared artifact vocab ({num_users} users / "
                    f"{num_items} items) does not match the checkpoint vocab "
                    f"({len(ckpt_vocab.users)} / {len(ckpt_vocab.items)}); "
                    "evaluate against the artifact the model trained on"
                )
        params, meta = restore_params(
            config, ckpt_dir, num_users, num_items, step=args.step, mesh=mesh
        )
        evaluator = Evaluator(
            config, num_items, item_tokens=load_item_tokens(ckpt_dir), mesh=mesh
        )
        eu, ei = _capped(
            subset_cols["user_idx"], subset_cols["item_idx"],
            getattr(args, "rows", None),
        )
        metrics = evaluator.evaluate(params, eu, ei)
        return {
            "subset": args.subset,
            "rows": len(eu),
            "num_items": num_items,
            "checkpoint_step": meta.get("step"),
            "metrics": metrics,
        }
    data = load_interactions(args)
    pp = Preprocessor(config.preprocessing)

    vocab_dir = ckpt_dir / "vocab"
    if vocab_dir.exists():
        # Use the training-time id spaces: mandatory for checkpoint parity.
        pp.vocab = VocabPair.load(vocab_dir)
        data = pp.basic_cleaning(data)
        data = pp.process_text(data)
        data = pp.interaction_filter.filter(data)
        data = data.with_columns(
            user_idx=pp.vocab.users.encode(data.user_id),
            item_idx=pp.vocab.items.encode(data.item_id),
        )
        import numpy as np

        known = (data.user_idx >= 0) & (data.item_idx >= 0)
        data = data.select(np.nonzero(known)[0])
    else:
        logger.warning("no vocab manifest at %s; rebuilding ids from data", vocab_dir)
        data = pp.process(data)

    splits = pp.split_data(data, method=args.split)
    subset = splits.val if args.subset == "val" else splits.test
    num_users, num_items = len(pp.vocab.users), len(pp.vocab.items)

    params, meta = restore_params(
        config, ckpt_dir, num_users, num_items, step=args.step, mesh=mesh
    )
    evaluator = Evaluator(
        config, num_items, item_tokens=load_item_tokens(ckpt_dir), mesh=mesh
    )
    eu, ei = _capped(
        subset.user_idx, subset.item_idx, getattr(args, "rows", None)
    )
    metrics = evaluator.evaluate(params, eu, ei)
    return {
        "subset": args.subset,
        "rows": len(eu),
        "num_items": num_items,
        "checkpoint_step": meta.get("step"),
        "metrics": metrics,
    }


def main(argv: list[str] | None = None) -> int:
    from twotower_tpu.utils.platform import respect_env_platform

    respect_env_platform()
    setup_logging()
    parser = build_argparser()
    args = parser.parse_args(argv)
    if args.prepared_dir and args.split == "random":
        parser.error(
            "--prepared-dir supports --split temporal only (the reference's "
            "temporal 80/10/10 protocol); for --split random use the "
            "in-memory --data path"
        )
    config = load_config_for_checkpoint(
        args.checkpoint_dir, args.config, parse_cli_overrides(args.override)
    )
    result = run(args, config)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
