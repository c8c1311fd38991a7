"""Full-scale BASELINE config-3 lifecycle driver.

Runs the EXACT commands an operator would, as subprocesses, and records
per-stage wall clock + the stats each stage prints:

1. ``python -m twotower_tpu.data.synthetic_scale`` — 50M-interaction /
   1.2M-item corpus (zero-egress stand-in for the real Amazon categories;
   reference scale claim README.md:45-47).
2. ``python -m twotower_tpu.data.prepare --streaming`` — out-of-core
   dedupe -> 5-core -> vocab -> encoded artifact
   (reference artifact contract: prepare_training_data.py:217-234).
3. ``python -m twotower_tpu.training.train --prepared-dir
   --stream-batches`` — config-3 shapes on one chip, per-epoch approx
   validation, early stopping, Orbax checkpoints.
4. ``python -m twotower_tpu.evaluation.evaluate`` — EXACT Recall/NDCG@K on
   the test slice from the best checkpoint
   (reference protocol: configs/data_config.yaml:71, README.md:80).

Result JSON is written to ``<workdir>/lifecycle_result.json`` and printed;
the PARITY.md "full-scale lifecycle" section records the numbers.

``--smoke`` shrinks every knob to seconds-scale (used by
tests/test_lifecycle_driver.py); the default sizes are the real run.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def run_stage(name: str, cmd: list[str], results: dict, env=None) -> str:
    print(f"[lifecycle] {name}: {' '.join(cmd)}", flush=True)
    t0 = time.time()
    proc = subprocess.run(
        cmd, cwd=str(REPO), text=True, capture_output=True, env=env
    )
    dt = time.time() - t0
    if proc.returncode != 0:
        print(proc.stdout[-4000:], file=sys.stderr)
        print(proc.stderr[-4000:], file=sys.stderr)
        raise SystemExit(f"stage {name} failed (rc={proc.returncode})")
    results.setdefault("stages", {})[name] = {"seconds": round(dt, 1)}
    print(f"[lifecycle] {name} done in {dt:.1f}s", flush=True)
    return proc.stdout


def last_json_line(stdout: str) -> dict:
    """CLI stages print one JSON object as their final stdout line."""
    for line in reversed(stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    return {}


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--workdir", type=str, default="data/lifecycle_config3")
    p.add_argument(
        "--corpus-dir", type=str, default=None,
        help="existing generator output to reuse (skips stage 1)",
    )
    p.add_argument("--interactions", type=int, default=50_000_000)
    p.add_argument("--users", type=int, default=2_500_000)
    p.add_argument("--items", type=int, default=1_200_000)
    p.add_argument("--clusters", type=int, default=2048)
    p.add_argument("--epochs", type=int, default=None,
                   help="override training.epochs (default: config value, 50)")
    p.add_argument(
        "--val-rows", type=int, default=500_000,
        help="per-epoch validation cap (strided subsample; full test-split "
        "metrics still come from the exact evaluate stage). At 50M scale "
        "the uncapped ~5M-row validation costs ~10x the epoch itself",
    )
    p.add_argument("--skip-prepare", action="store_true",
                   help="reuse <workdir>/prepared from a previous run")
    p.add_argument("--resume-train", action="store_true",
                   help="pass --resume to the train stage (continue from "
                   "the newest checkpoint in <workdir>/checkpoints, e.g. "
                   "after a preemption)")
    p.add_argument("--smoke", action="store_true",
                   help="seconds-scale sizes for CI (overrides size flags)")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_argparser().parse_args(argv)
    if args.smoke:
        args.interactions, args.users, args.items = 60_000, 4_000, 2_500
        args.clusters = 64
        if args.epochs is None:
            args.epochs = 2

    workdir = Path(args.workdir)
    workdir.mkdir(parents=True, exist_ok=True)
    prepared = workdir / "prepared"
    ckpt_dir = workdir / "checkpoints"
    results: dict = {
        "config": "configs/lifecycle_50m_1chip.yaml",
        "sizes": {
            "interactions": args.interactions,
            "users": args.users,
            "items": args.items,
        },
    }
    py = sys.executable

    # -- stage 1: corpus ----------------------------------------------------
    corpus_dir = Path(args.corpus_dir) if args.corpus_dir else workdir / "corpus"
    if args.corpus_dir:
        results["stages"] = {"generate": {"seconds": 0.0, "reused": True}}
    else:
        out = run_stage(
            "generate",
            [
                py, "-m", "twotower_tpu.data.synthetic_scale",
                "--output-dir", str(corpus_dir),
                "--interactions", str(args.interactions),
                "--users", str(args.users),
                "--items", str(args.items),
                "--clusters", str(args.clusters),
            ]
            + (["--no-jax"] if args.smoke else []),
            results,
        )
        results["generator"] = last_json_line(out)

    # -- stage 2: prepare (out-of-core) --------------------------------------
    if not args.skip_prepare:
        out = run_stage(
            "prepare",
            [
                py, "-m", "twotower_tpu.data.prepare",
                "--streaming",
                "--data-dir", str(corpus_dir),
                "--output-dir", str(prepared),
            ],
            results,
        )
        results["prepared"] = last_json_line(out)
    else:
        results["prepared"] = json.loads(
            (prepared / "dataset_stats.json").read_text()
        )

    # -- stage 3: train (execution rung AUTO-selected: at config-3 scale
    # the columns + state fit HBM, so this resolves to the device-resident
    # full-permutation epochs that measured both the best metric (+49%
    # r@10 vs the 8M-row windowed stream) and the best wall rate;
    # --exec/--stream-batches would force a rung) ----------------------------
    train_cmd = [
        py, "-m", "twotower_tpu.training.train",
        "--config", "configs/lifecycle_50m_1chip.yaml",
        "--prepared-dir", str(prepared),
        "--checkpoint-dir", str(ckpt_dir),
        "--val-rows", str(args.val_rows),
    ]
    if args.resume_train:
        train_cmd.append("--resume")
    overrides = []
    if args.epochs is not None:
        overrides.append(f"training.epochs={args.epochs}")
    if args.smoke:
        overrides += [
            "training.batch_size=512",
            "model.embedding_dim=16",
            "model.user_tower_dims=[32,16]",
            "model.item_tower_dims=[32,16]",
        ]
    if overrides:
        train_cmd += ["--override", *overrides]
    out = run_stage("train", train_cmd, results)
    results["train"] = last_json_line(out)

    # -- stage 4: exact evaluation from the best checkpoint -------------------
    out = run_stage(
        "evaluate",
        [
            py, "-m", "twotower_tpu.evaluation.evaluate",
            "--checkpoint-dir", str(ckpt_dir),
            "--prepared-dir", str(prepared),
            "--subset", "test",
            "--override",
            "retrieval.eval_exact=true",
            "retrieval.eval_corpus_dtype=float32",
            # Default config is now safe at this extreme: the round-4
            # "scanned exact eval crashes the worker" was root-caused to a
            # 60 s single-program execution watchdog on the tunneled
            # worker (round 5, benchmarks/eval_scan_probe.py), and the
            # evaluator now time-budgets its scan segments under it.
        ],
        results,
    )
    results["evaluate"] = last_json_line(out)

    results["total_seconds"] = round(
        sum(s["seconds"] for s in results["stages"].values()), 1
    )
    (workdir / "lifecycle_result.json").write_text(json.dumps(results, indent=2))
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
