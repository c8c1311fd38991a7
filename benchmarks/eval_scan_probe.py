"""Reproduce/bound the round-4 scanned exact-eval TPU worker crash.

Round-4 incident (`benchmarks/results/lifecycle_config3_r4.json` note): the
device-resident exact eval — a ~1200-step ``lax.scan`` whose body is the
two-pass exact search over a ~1.2M-row corpus — hard-crashed the tunneled
TPU worker ("kernel fault") at config-3 scale, after the per-batch loop had
run the SAME shapes fine. This probe walks the (items x scan-length) grid
at descending scale to isolate the mechanism: if the crash tracks scan
LENGTH at fixed shapes it is program/teardown-size; if it tracks the
score-buffer footprint it is HBM.

Run each point under ``timeout`` in its OWN process (a worker crash kills
the process; the driver shell records which points die):

    for L in 50 200 800 1250; do
      timeout 1200 python benchmarks/eval_scan_probe.py \
          --items 1179648 --rows $((L*4096)) || echo "CRASH at L=$L"
    done

Findings land in docs/evaluation.md and drive the Evaluator's auto-routing
(`Evaluator._scan_plan`).
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=1_179_648)
    ap.add_argument("--rows", type=int, default=4096 * 50)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--embedding-dim", type=int, default=128)
    ap.add_argument("--no-scan", action="store_true",
                    help="per-batch loop instead of the device scan")
    ap.add_argument("--approx", action="store_true",
                    help="approx eval instead of exact two-pass")
    args = ap.parse_args()

    import jax
    import numpy as np

    from twotower_tpu.config import Config
    from twotower_tpu.evaluation.evaluator import Evaluator
    from twotower_tpu.models import two_tower

    cfg = Config().with_overrides(
        {
            "model.embedding_dim": args.embedding_dim,
            "retrieval.eval_exact": not args.approx,
            "retrieval.eval_device_scan": not args.no_scan,
        }
    )
    num_users = 4096  # queries reuse a small user table; corpus is the load
    params = two_tower.init_params(
        jax.random.PRNGKey(0), cfg.model, num_users, args.items
    )
    ev = Evaluator(cfg, args.items, batch_size=args.batch)
    rng = np.random.default_rng(0)
    user_idx = rng.integers(0, num_users, args.rows).astype(np.int32)
    item_idx = rng.integers(0, args.items, args.rows).astype(np.int32)

    t0 = time.perf_counter()
    metrics = ev.evaluate(params, user_idx, item_idx)
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "items": args.items,
                "rows": args.rows,
                "batch": args.batch,
                "scan_requested": not args.no_scan,
                "scan_used": ev._scan_ok is True,
                "exact": not args.approx,
                "seconds": round(dt, 2),
                "recall@10": metrics.get("recall@10"),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
