"""Metric-parity packet: reproduce the reference's headline Recall/NDCG table.

The sandbox this framework was built in has no network egress, so the real
Amazon Reviews 2023 run cannot execute HERE — this driver is the one
documented command to run on any machine WITH egress (and ideally a TPU):

    make parity                       # config 2 (Books subset, one chip)
    make parity PARITY_CONFIG=configs/full_category_8chip.yaml PARITY_FLAGS=--mesh

It chains the framework's own CLIs in-process, exactly as an operator would:

1. ``download-data --mode kcore`` — the reference's preprocessed 5-core
   categories (reference: scripts/data_processing/download_efficient.py).
2. ``prepare-data --streaming`` — out-of-core dedupe/5-core/vocab/encode.
3. ``train-model --prepared-dir --stream-batches`` — reference protocol
   hyperparameters (configs/data_config.yaml:54-71 schema: 50 epochs,
   patience 5, temporal 80/10/10, in-batch sampled softmax, temp 0.1).
4. ``evaluate-model`` — EXACT Recall@K/NDCG@K on the held-out test slice.

It ends by printing the parity table next to the reference's published
numbers (reference README.md:80 — Recall@10 0.342 dev / 0.358 prod, NDCG@10
0.287 / 0.295). Expect agreement within run variance when pointed at the
same categories/caps; BASELINE.md records the full protocol.

Offline smoke (what CI runs): tests/test_parity_packet.py patches
``datasets.load_dataset`` the same way the reference's own tests do
(reference: tests/unit/test_amazon_loader.py:65) and drives this exact
driver end to end on a tiny fake corpus.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
# Reference README.md:80 (parsed in BASELINE.md).
REFERENCE = {
    "recall@10": {"development": 0.342, "production": 0.358},
    "ndcg@10": {"development": 0.287, "production": 0.295},
}


def run_stage(name: str, main_fn, argv: list[str], results: dict) -> dict:
    """Run a CLI main() in-process, capturing its final JSON stdout line."""
    print(f"[parity] {name}: {' '.join(argv)}", flush=True)
    t0 = time.time()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main_fn(argv)
    dt = time.time() - t0
    out = buf.getvalue()
    sys.stdout.write(out)
    if rc not in (0, None):
        raise SystemExit(f"stage {name} failed (rc={rc})")
    results.setdefault("stages", {})[name] = {"seconds": round(dt, 1)}
    print(f"[parity] {name} done in {dt:.1f}s", flush=True)
    for line in reversed(out.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    return {}


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--workdir", type=str, default="data/parity_packet")
    p.add_argument(
        "--config", type=str, default="configs/books_1m.yaml",
        help="training preset: BASELINE config 2 (default) or 3",
    )
    p.add_argument(
        "--categories", nargs="*", default=None,
        help="5-core categories to download (default: the config's)",
    )
    p.add_argument(
        "--max-per-category", type=int, default=1_000_000,
        help="5-core row cap per category during download",
    )
    p.add_argument(
        "--train-flags", nargs="*", default=[],
        help="extra train-model flags, e.g. --mesh for multi-chip presets",
    )
    p.add_argument(
        "--override", nargs="*", default=[],
        help="dotted config overrides forwarded to train/evaluate",
    )
    p.add_argument("--skip-download", action="store_true",
                   help="reuse <workdir>/raw from a previous run")
    return p


def main(argv: list[str] | None = None) -> int:
    from twotower_tpu.config import load_config
    from twotower_tpu.data.download import main as download_main
    from twotower_tpu.data.prepare import main as prepare_main
    from twotower_tpu.evaluation.evaluate import main as evaluate_main
    from twotower_tpu.training.train import main as train_main

    args = build_argparser().parse_args(argv)
    if not Path(args.config).exists() and (REPO / args.config).exists():
        # the documented presets are repo-relative; resolve them no matter
        # where the driver is invoked from
        args.config = str(REPO / args.config)
    workdir = Path(args.workdir)
    raw_dir = workdir / "raw"
    prepared = workdir / "prepared"
    ckpt_dir = workdir / "checkpoints"
    results: dict = {"config": args.config}

    config = load_config(args.config, None)
    categories = args.categories or config.dataset.categories

    if not args.skip_download:
        results["download"] = run_stage(
            "download",
            download_main,
            [
                "--mode", "kcore",
                "--categories", *categories,
                "--output-dir", str(raw_dir),
                "--max-per-category", str(args.max_per_category),
            ],
            results,
        )

    results["prepared"] = run_stage(
        "prepare",
        prepare_main,
        [
            "--streaming",
            "--data-dir", str(raw_dir),
            "--output-dir", str(prepared),
        ],
        results,
    )

    train_argv = [
        "--config", args.config,
        "--prepared-dir", str(prepared),
        "--stream-batches",
        "--checkpoint-dir", str(ckpt_dir),
        *args.train_flags,
    ]
    if args.override:
        train_argv += ["--override", *args.override]
    results["train"] = run_stage("train", train_main, train_argv, results)

    eval_argv = [
        "--checkpoint-dir", str(ckpt_dir),
        "--prepared-dir", str(prepared),
        "--subset", "test",
        "--override",
        "retrieval.eval_exact=true",
        "retrieval.eval_corpus_dtype=float32",
        *args.override,
    ]
    results["evaluate"] = run_stage("evaluate", evaluate_main, eval_argv, results)

    metrics = results["evaluate"].get("metrics", {})
    results["parity_table"] = {
        m: {"this_run": metrics.get(m), **REFERENCE[m]} for m in REFERENCE
    }
    results["total_seconds"] = round(
        sum(s["seconds"] for s in results["stages"].values()), 1
    )
    workdir.mkdir(parents=True, exist_ok=True)
    (workdir / "parity_result.json").write_text(json.dumps(results, indent=2))

    print("\n| metric    | this run | reference dev | reference prod |")
    print("|-----------|----------|---------------|----------------|")
    for m, row in results["parity_table"].items():
        this = "n/a" if row["this_run"] is None else f"{row['this_run']:.3f}"
        print(
            f"| {m:9s} | {this:>8s} | {row['development']:13.3f} "
            f"| {row['production']:14.3f} |"
        )
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
