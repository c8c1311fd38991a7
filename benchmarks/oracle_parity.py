"""Oracle-parity run: plant a teacher, train a student, report the
ceiling fraction (VERDICT r4 #1 — the strongest offline substitute for
the reference's Recall@10 0.342 target, /root/reference/README.md:80).

Stages (each a subprocess; stage wall-clocks recorded):

1. generate  — ``data.synthetic_scale --oracle``: sample interactions
   from a KNOWN teacher; write ``oracle_teacher.npz``.
2. prepare   — ``data.prepare --streaming``: the standard out-of-core
   artifact (k-core filter, vocab, temporal order).
3. ceiling   — ``evaluation.oracle``: the teacher's EXACT Recall/NDCG on
   the held-out split = the Bayes ceiling (no ranker can beat it in
   expectation on data sampled from the teacher).
4. train     — ``train-model --prepared-dir`` (execution rung
   auto-selected) from scratch.
5. evaluate  — ``evaluate-model`` exact metrics on the same split.
6. report    — student/teacher ratio per metric ->
   ``benchmarks/results/oracle_parity_<name>.json``.

Presets::

    python benchmarks/oracle_parity.py --scale config2   # 1M rows, 64-d
    python benchmarks/oracle_parity.py --scale config3   # 50M rows, 128-d
    python benchmarks/oracle_parity.py --scale smoke     # CPU-sized
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# Corpus-shape rationale (round-5 attribution, PARITY.md "oracle"):
# 1. Duplicate (user,item) pairs must be RARE: dedupe-keep-latest on a
#    resampling teacher flattens the per-user law — measured 0.92 of
#    ceiling for raw draws vs 0.30 after dedup+temporal on a 29%-dup
#    corpus. Real Amazon reviews are naturally dup-free, so low-dup
#    shapes are also the realistic ones. within_zipf=0.5 + large
#    items/cluster keeps measured dup rates at 2.9% (config2) / 0.9%
#    (config3).
# 2. Draws per user must RESOLVE the teacher: ~200 deduped draws per user
#    against a 64-256-cluster mixture makes the exact-teacher ceiling
#    information-theoretically approachable; at 20 draws/user the
#    finite-sample limit, not the training stack, caps the fraction.
SCALES = {
    # rows, users, items, clusters, latent_dim, model overrides, epochs
    "smoke": dict(
        rows=120_000, users=1_000, items=8_000, clusters=16, latent=8,
        zipf=0.5,
        model=["model.embedding_dim=32", "model.user_tower_dims=[64,32]",
               "model.item_tower_dims=[64,32]", "training.batch_size=512",
               "training.patience=10"],
        epochs=40,
    ),
    # BASELINE config 2: "1M interactions, 64-dim embeddings, batch 4096".
    # dropout 0.25 + L2 1e-5 are the round-5 sweep winners (recorded in
    # docs/oracle.md + PARITY.md): at ~10 observations/item the item
    # embeddings are estimation-noise-limited and regularization is the
    # decisive lever (dropout 0.1 -> 0.58 of ceiling, 0 -> 0.39,
    # 0.25 -> 0.85; +L2 1e-5 -> 0.895).
    "config2": dict(
        rows=1_000_000, users=5_000, items=100_000, clusters=64, latent=16,
        zipf=0.5,
        model=["model.embedding_dim=64", "model.user_tower_dims=[256,128,64]",
               "model.item_tower_dims=[256,128,64]",
               "training.batch_size=4096", "training.patience=12",
               "model.dropout_rate=0.25", "model.l2_regularization=1e-5"],
        epochs=80,
    ),
    # BASELINE config 3: "~50M interactions, 128-dim embeddings" on 1 chip
    # (model shape mirrors configs/lifecycle_50m_1chip.yaml)
    "config3": dict(
        rows=50_000_000, users=250_000, items=1_200_000, clusters=256,
        latent=16, zipf=0.5,
        model=["model.embedding_dim=128",
               "training.batch_size=8192",
               "training.sparse_table_updates=true",
               "training.async_checkpoint=true",
               "model.dropout_rate=0.25",
               "model.l2_regularization=1e-5",
               "training.patience=3"],
        epochs=16,
    ),
}


def run_stage(name: str, cmd: list[str], results: dict) -> str:
    print(f"=== {name}: {' '.join(cmd)}", flush=True)
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True)
    dt = round(time.time() - t0, 1)
    results.setdefault("stages", {})[name] = {"seconds": dt, "rc": proc.returncode}
    sys.stderr.write(proc.stderr[-4000:])
    if proc.returncode != 0:
        raise SystemExit(f"stage {name} failed rc={proc.returncode}")
    print(f"=== {name}: done in {dt}s", flush=True)
    return proc.stdout


def last_json_line(out: str) -> dict:
    for line in reversed(out.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise ValueError("no JSON line in stage output")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", choices=sorted(SCALES), default="config2")
    ap.add_argument("--work-dir", type=str, default=None)
    ap.add_argument("--rows-cap", type=int, default=None,
                    help="cap ceiling/eval rows (strided) at huge scales")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--val-rows", type=int, default=200_000)
    args = ap.parse_args()
    s = SCALES[args.scale]
    work = Path(args.work_dir or f"/tmp/oracle_{args.scale}")
    work.mkdir(parents=True, exist_ok=True)
    gen = work / "gen"
    prep = work / "prepared"
    ckpt = work / "ckpt"
    py = sys.executable
    results: dict = {"scale": args.scale, "work_dir": str(work)}

    run_stage("generate", [
        py, "-m", "twotower_tpu.data.synthetic_scale", "--oracle",
        "--output-dir", str(gen),
        "--interactions", str(s["rows"]), "--users", str(s["users"]),
        "--items", str(s["items"]), "--clusters", str(s["clusters"]),
        "--latent-dim", str(s["latent"]), "--within-zipf", str(s["zipf"]),
        "--seed", "42",
    ], results)

    run_stage("prepare", [
        py, "-m", "twotower_tpu.data.prepare",
        "--data-dir", str(gen), "--output-dir", str(prep), "--streaming",
    ], results)

    ceiling_cmd = [
        py, "-m", "twotower_tpu.evaluation.oracle",
        "--teacher", str(gen / "oracle_teacher.npz"),
        "--prepared-dir", str(prep), "--subset", "test", "--plugin",
    ]
    if args.rows_cap:
        ceiling_cmd += ["--rows", str(args.rows_cap)]
    ceiling = last_json_line(run_stage("ceiling", ceiling_cmd, results))
    results["ceiling"] = ceiling

    epochs = args.epochs or s["epochs"]
    train_cmd = [
        py, "-m", "twotower_tpu.training.train",
        "--prepared-dir", str(prep), "--checkpoint-dir", str(ckpt),
        "--val-rows", str(args.val_rows),
        "--override", f"training.epochs={epochs}", *s["model"],
    ]
    train = last_json_line(run_stage("train", train_cmd, results))
    results["train"] = {
        k: train.get(k)
        for k in ("best_val_metric", "best_step", "epochs_run",
                  "steady_examples_per_sec", "execution_rung")
    }

    eval_cmd = [
        py, "-m", "twotower_tpu.evaluation.evaluate",
        "--prepared-dir", str(prep), "--checkpoint-dir", str(ckpt),
        "--subset", "test",
        "--override", *s["model"],
    ]
    if args.rows_cap:
        eval_cmd += ["--rows", str(args.rows_cap)]
    student = last_json_line(run_stage("evaluate", eval_cmd, results))
    results["student"] = student

    ratios = {}
    plugin_ratios = {}
    plug = ceiling.get("plugin_metrics") or {}
    for k, ceil_v in ceiling["metrics"].items():
        stu_v = student["metrics"].get(k)
        if stu_v is not None and ceil_v > 0:
            ratios[k] = round(stu_v / ceil_v, 4)
        if stu_v is not None and plug.get(k, 0) > 0:
            plugin_ratios[k] = round(stu_v / plug[k], 4)
    results["ceiling_fraction"] = ratios
    results["plugin_fraction"] = plugin_ratios
    results["total_seconds"] = round(
        sum(v["seconds"] for v in results["stages"].values()), 1
    )
    out = REPO / "benchmarks" / "results" / f"oracle_parity_{args.scale}.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(results, indent=2))
    print(json.dumps({
        "scale": args.scale,
        "ceiling_recall@10": ceiling["metrics"].get("recall@10"),
        "plugin_recall@10": plug.get("recall@10"),
        "student_recall@10": student["metrics"].get("recall@10"),
        "fraction_recall@10": ratios.get("recall@10"),
        "fraction_ndcg@10": ratios.get("ndcg@10"),
        "plugin_fraction_recall@10": plugin_ratios.get("recall@10"),
        "out": str(out),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
