"""Full-corpus evaluation throughput at 10M items on one chip.

The scale-true evaluation story (docs/evaluation.md): a validation pass is
(1) one corpus encode through the item tower, then (2) per-batch
query-tower -> top-k -> metric sums. This measures both phases with the
REAL ``evaluation.Evaluator`` at BASELINE config-4/5 catalog scale
(10M items x 128 dims), exact scan vs ``approx_max_k`` validation mode
(``retrieval.eval_exact=false``), on the single axon v5e chip.

Timing uses the two-run-length slope with a scalar fetch as the only sync
(see bench.py — block_until_ready ACKs early on this transport).

Prints JSON lines: {"phase": "encode", ...}, then per mode
{"mode", "rows_per_sec", "ms_per_4096_batch", "sec_per_1M_rows"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

NUM_USERS, NUM_ITEMS = 1_000_000, 10_000_000
BATCH = 4096
ROWS = 8192  # two batches per measured evaluate() call


def main() -> None:
    import jax

    from twotower_tpu.config import Config
    from twotower_tpu.evaluation import Evaluator
    from twotower_tpu.models import two_tower

    cfg = Config()
    params = two_tower.init_params(
        jax.random.PRNGKey(0), cfg.model, NUM_USERS, NUM_ITEMS
    )
    jax.block_until_ready(params)
    rng = np.random.default_rng(0)
    user_idx = rng.integers(0, NUM_USERS, ROWS).astype(np.int32)
    item_idx = rng.integers(0, NUM_ITEMS, ROWS).astype(np.int32)

    for mode, exact in (("approx", False), ("exact", True)):
        ev = Evaluator(
            cfg.with_overrides({"retrieval.eval_exact": exact}),
            NUM_ITEMS,
            batch_size=BATCH,
        )
        # Encode phase (shared by both modes; report once, under approx).
        # Only ONE 5.1 GB corpus buffer may be alive at a time next to the
        # 5.6 GB params — release before re-encoding.
        if not exact:
            corpus = ev._encode_corpus(params)
            _ = float(corpus[0, 0])
            del corpus
            t0 = time.perf_counter()
            corpus = ev._encode_corpus(params)
            _ = float(corpus[0, 0])
            enc_s = time.perf_counter() - t0
            print(
                json.dumps(
                    {
                        "phase": "encode",
                        "items": NUM_ITEMS,
                        "seconds": round(enc_s, 3),
                    }
                ),
                flush=True,
            )
            del corpus

        def run(n_rows: int) -> float:
            t0 = time.perf_counter()
            ev.evaluate(params, user_idx[:n_rows], item_idx[:n_rows])
            return time.perf_counter() - t0

        run(BATCH)  # compile + warm
        t1 = run(BATCH)
        t2 = run(ROWS)
        per_batch = max(t2 - t1, 1e-9)  # slope: one extra BATCH of rows
        rows_per_sec = BATCH / per_batch
        print(
            json.dumps(
                {
                    "mode": mode,
                    "ms_per_4096_batch": round(per_batch * 1e3, 1),
                    "rows_per_sec": round(rows_per_sec),
                    "sec_per_1M_rows": round(1_000_000 / rows_per_sec, 1),
                }
            ),
            flush=True,
        )
    print("EVAL_10M_OK", flush=True)


if __name__ == "__main__":
    main()
