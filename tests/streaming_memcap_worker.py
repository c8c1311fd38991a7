"""Subprocess worker: streaming factorization at millions of unique
entities under a hard address-space cap (RLIMIT_AS).

Launched by tests/test_streaming.py. Deliberately avoids importing jax —
the streaming data layer is pure numpy/pyarrow, so the cap measures ITS
state, not an ML runtime's reservations. Generates the source parquet
chunk-by-chunk (never holding the corpus), runs
``StreamingPreprocessor.process_parquet``, and prints stats + peak RSS.
"""

import json
import resource
import sys
from pathlib import Path

# Self-sufficient import: the repo package is used from the source tree (not
# pip-installed), and a script's sys.path[0] is tests/, not the repo root.
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main() -> int:
    out_dir = Path(sys.argv[1])
    n_users, n_items = int(sys.argv[2]), int(sys.argv[3])
    rows, cap_mb = int(sys.argv[4]), int(sys.argv[5])
    if cap_mb > 0:
        resource.setrlimit(
            resource.RLIMIT_AS, (cap_mb << 20, cap_mb << 20)
        )

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = out_dir / "src.parquet"
    rng = np.random.default_rng(0)
    writer = None
    chunk = 250_000
    made = 0
    while made < rows:
        n = min(chunk, rows - made)
        t = np.arange(made, made + n, dtype=np.int64)
        tbl = pa.table(
            {
                "user_id": np.char.add("U", (t % n_users).astype("U9")),
                "parent_asin": np.char.add("I", (t % n_items).astype("U9")),
                "rating": rng.uniform(1.0, 5.0, n).astype(np.float32),
                "timestamp": t,
            }
        )
        if writer is None:
            writer = pq.ParquetWriter(src, tbl.schema)
        writer.write_table(tbl)
        made += n
    assert writer is not None
    writer.close()

    from twotower_tpu.config import PreprocessingConfig
    from twotower_tpu.data.streaming import StreamingPreprocessor

    cfg = PreprocessingConfig(
        min_interactions_per_user=1, min_interactions_per_item=1
    )
    sp = StreamingPreprocessor(cfg, batch_rows=200_000)
    stats = sp.process_parquet(src, out_dir / "prep")
    # VmHWM, not ru_maxrss: Linux preserves ru_maxrss ACROSS execve (it
    # lives in the task's signal struct), so a worker spawned from a fat
    # parent (pytest with jax loaded) would inherit the parent's peak.
    # VmHWM comes from the mm, which exec replaces.
    peak_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmHWM:"):
                    peak_mb = int(line.split()[1]) // 1024
                    break
    except OSError:
        pass  # non-Linux: ru_maxrss is the best available
    print(
        "RESULT "
        + json.dumps(
            {
                "num_interactions": stats["num_interactions"],
                "num_users": stats["num_users"],
                "num_items": stats["num_items"],
                "peak_rss_mb": int(peak_mb),
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
