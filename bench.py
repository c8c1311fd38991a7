"""Headline benchmark: training examples/sec/chip on the flagship config.

Runs the full jitted train step (both towers, in-batch sampled softmax with
log-Q correction, Adam update) at the reference's model scale — embedding 128,
towers [512,256,128] (reference: configs/data_config.yaml:54-66) — on
synthetic interactions (zero-egress environment; data content does not affect
step cost, shapes do).

Prints ONE JSON line to stdout: {"metric", "value", "unit", "vs_baseline"}.
The value is the MEDIAN of 5 independent two-run-length slope sessions
(per-session spread on stderr) — reproducible under the tunnel transport's
±15% session variance, unlike a best-session number.

``--breakdown`` additionally times the step's phases (forward loss, +backward,
+dense Adam, table row scatter) with the same two-point-slope method and
prints them as JSON lines on STDERR — the decomposition that justifies (or
refutes) "nothing left to win" on each phase.

Baseline derivation (BASELINE.md): the reference reports 2.3 h training time
for its development run (reference README.md:80) under batch 1024 x 50 epochs
on a ~1M-interaction dev slice => ~50M examples / 8280 s ≈ 6,000 examples/s
on the TF-CPU stack. vs_baseline = measured / 6000.

Perf floor: the result is compared against the newest recorded
``BENCH_r*.json`` in the repo root; a drop past ``FLOOR_TOLERANCE`` (10%)
prints a loud STDERR regression warning, and with ``--enforce-floor`` (the
``make bench-check`` CI entry) exits 2 so regressions fail the build instead
of waiting for a human to diff round files. The JSON result line is printed
either way.
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

BASELINE_EXAMPLES_PER_SEC = 6000.0
FLOOR_TOLERANCE = 0.10  # fail past a 10% drop vs the last recorded round


def last_recorded_value(root: "str | None" = None) -> float | None:
    """Newest parseable BENCH_r*.json value in the repo root (None if no
    history). A malformed newest round falls back to the next-newest
    parseable one — a corrupt file must not silently disable the floor."""
    import pathlib
    import re

    here = (
        pathlib.Path(root) if root else pathlib.Path(__file__).resolve().parent
    )
    rounds = []
    for p in here.glob("BENCH_r*.json"):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", p.name)
        if m:
            rounds.append((int(m.group(1)), p))
    for _, path in sorted(rounds, reverse=True):
        try:
            rec = json.loads(path.read_text())
            # The driver wraps the bench line under "parsed"; accept both the
            # raw {"value": ...} line and the wrapped round record.
            if "value" not in rec and isinstance(rec.get("parsed"), dict):
                rec = rec["parsed"]
            return float(rec["value"])
        except (ValueError, KeyError, TypeError, OSError):
            print(
                f"perf floor: skipping malformed {path.name}", file=sys.stderr
            )
    return None


def check_floor(value: float, root: "str | None" = None) -> bool:
    """Compare against the last recorded round; True if within tolerance."""
    prev = last_recorded_value(root)
    if prev is None or prev <= 0:
        return True
    ratio = value / prev
    if ratio < 1.0 - FLOOR_TOLERANCE:
        print(
            f"PERF REGRESSION: {value:.1f} examples/s/chip is "
            f"{(1.0 - ratio) * 100:.1f}% below the last recorded round "
            f"({prev:.1f}); floor is -{FLOOR_TOLERANCE * 100:.0f}%.",
            file=sys.stderr,
        )
        return False
    print(
        f"perf floor ok: {value:.1f} vs last recorded {prev:.1f} "
        f"({(ratio - 1.0) * 100:+.1f}%)",
        file=sys.stderr,
    )
    return True

# Flagship single-chip shapes: big enough to saturate the MXU, small enough
# to compile fast. Batch 4096 (BASELINE.json config 2), 1M users, 500k items.
# ``--batch N`` overrides (e.g. 1024 = the multi-chip presets' per-chip
# batch, the compute_ms input to parallel/scaling_model.py).
BATCH = 4096
NUM_USERS = 1_000_000
NUM_ITEMS = 500_000
WARMUP_STEPS = 5
MEASURE_STEPS = 50


def main() -> None:
    global BATCH
    if "--batch" in sys.argv:
        BATCH = int(sys.argv[sys.argv.index("--batch") + 1])
    emb_dim = None
    if "--embedding-dim" in sys.argv:
        emb_dim = int(sys.argv[sys.argv.index("--embedding-dim") + 1])
    import jax
    import jax.numpy as jnp

    from twotower_tpu.config import Config
    from twotower_tpu.models import two_tower
    from twotower_tpu.training import TrainState, make_optimizer, make_train_step

    over: dict = {"training.batch_size": BATCH}
    if emb_dim is not None:
        over["model.embedding_dim"] = emb_dim
    cfg = Config().with_overrides(over)
    optimizer = make_optimizer(cfg.training)
    params = two_tower.init_params(
        jax.random.PRNGKey(0), cfg.model, NUM_USERS, NUM_ITEMS
    )
    state = TrainState.for_config(params, optimizer, cfg)

    num_items_padded = params["item_embedding"].shape[0]
    log_q = jnp.log(jnp.full((num_items_padded,), 1.0 / NUM_ITEMS, jnp.float32))
    step = make_train_step(cfg, optimizer, log_q)

    rng = np.random.default_rng(0)
    host_batches = [
        {
            "user_idx": rng.integers(0, NUM_USERS, BATCH).astype(np.int32),
            "item_idx": rng.integers(0, NUM_ITEMS, BATCH).astype(np.int32),
            "weight": np.ones(BATCH, np.float32),
        }
        for _ in range(8)
    ]
    if cfg.training.host_dedup and cfg.training.effective_sparse_updates():
        # The shipped input pipeline precomputes id dedup on the host
        # (training/host_dedup.py, hidden behind DevicePrefetcher overlap);
        # pre-augmenting the benchmark batches measures the same program.
        from twotower_tpu.models.two_tower import dead_row
        from twotower_tpu.training.host_dedup import augment_batch

        host_batches = [
            augment_batch(
                b,
                user_dead=dead_row(params["user_embedding"]),
                item_dead=dead_row(params["item_embedding"]),
            )
            for b in host_batches
        ]
    batches = [{k: jnp.asarray(v) for k, v in b.items()} for b in host_batches]
    step_rng = jax.random.PRNGKey(1)

    for i in range(WARMUP_STEPS):
        state, metrics = step(state, batches[i % len(batches)], step_rng)
    _ = float(metrics["loss"])  # hard sync: scalar fetch forces completion

    # Two-point slope: some PJRT transports ACK before device completion, so
    # block_until_ready alone under-measures; a final scalar fetch (which the
    # full state chain feeds) is the only hard sync, and measuring two run
    # lengths cancels its fixed latency out of the per-step time.
    def run(n_steps: int) -> float:
        nonlocal state
        t0 = time.perf_counter()
        for i in range(n_steps):
            state, metrics = step(state, batches[i % len(batches)], step_rng)
        _ = float(metrics["loss"])
        return time.perf_counter() - t0

    # MEDIAN of K independent slope sessions (VERDICT r4 #2: the headline
    # must be reproducible, not the best session ever seen). Each session
    # is its own two-run-length slope; the tunnel transport adds seconds-
    # scale lopsided fetch latencies and ±15% session-to-session variance,
    # so single-session numbers (and the old best-of-2 MIN) overstate what
    # a re-run reproduces. The min/max spread goes to stderr so a noisy
    # session is visible next to the reported median.
    n1, n2 = MEASURE_STEPS, MEASURE_STEPS * 4
    sessions = 5
    slopes = []
    for _ in range(sessions):
        t1 = run(n1)
        t2 = run(n2)
        slopes.append(max((t2 - t1) / (n2 - n1), 1e-9))
    step_s = float(np.median(slopes))
    print(
        f"slope sessions (ms/step): "
        f"{[round(s * 1e3, 3) for s in sorted(slopes)]} -> median "
        f"{step_s * 1e3:.3f} (spread {min(slopes) * 1e3:.3f}"
        f"-{max(slopes) * 1e3:.3f})",
        file=sys.stderr,
    )

    n_chips = jax.device_count()
    eps_per_chip = BATCH / step_s / n_chips
    print(
        json.dumps(
            {
                "metric": "train_examples_per_sec_per_chip",
                "value": round(eps_per_chip, 1),
                "unit": "examples/s/chip",
                "vs_baseline": round(eps_per_chip / BASELINE_EXAMPLES_PER_SEC, 2),
            }
        )
    )

    # The recorded rounds are batch-4096 numbers; a --batch override is a
    # probe (e.g. scaling_model compute_ms input), not a floor comparison.
    ok = check_floor(eps_per_chip) if BATCH == 4096 else True
    if "--breakdown" in sys.argv:
        breakdown(cfg, state, batches, log_q, step_ms=step_s * 1e3)
    if not ok and "--enforce-floor" in sys.argv:
        raise SystemExit(2)


def _slope(fn, n1: int, n2: int) -> float:
    """Per-call seconds via the two-run-length slope (fn must end in a hard
    sync — a scalar fetch fed by the full computation)."""
    fn(2)  # warm
    t1_ = time.perf_counter()
    fn(n1)
    t1 = time.perf_counter() - t1_
    t2_ = time.perf_counter()
    fn(n2)
    t2 = time.perf_counter() - t2_
    return max((t2 - t1) / (n2 - n1), 1e-9)


def breakdown(cfg, state, batches, log_q, *, step_ms: float) -> None:
    """Phase decomposition of the sparse train step. Mirrors the production
    ``training.sparse.make_sparse_step_fn`` structure: gathered-row diff,
    fused in-batch loss, dense Adam, lazy-Adam row scatter."""
    import jax
    import jax.numpy as jnp

    from twotower_tpu.models import two_tower
    from twotower_tpu.ops.dispatch import in_batch_softmax_loss_auto
    from twotower_tpu.training.sparse import split_params, sparse_table_updates
    from twotower_tpu.training.state import TrainState

    mcfg, rcfg = cfg.model, cfg.retrieval
    tables, dense = split_params(state.params)

    def build_loss(diff, batch, log_q):
        u_emb = two_tower.apply_user_tower(diff["dense"], diff["u_rows"], mcfg)
        i_emb = two_tower.apply_item_tower(diff["dense"], diff["i_rows"], mcfg)
        loss, _ = in_batch_softmax_loss_auto(
            u_emb, i_emb, batch["item_idx"],
            temperature=rcfg.temperature, log_q=log_q, weights=batch["weight"],
        )
        return loss

    def diff_of(params, batch):
        t, d = split_params(params)
        return {
            "dense": d,
            "u_rows": t["user_embedding"][batch["user_idx"]],
            "i_rows": t["item_embedding"][batch["item_idx"]],
        }

    @jax.jit
    def fwd(params, batch, log_q):
        return build_loss(diff_of(params, batch), batch, log_q)

    @jax.jit
    def fwd_bwd(params, batch, log_q):
        grads = jax.grad(
            lambda diff: build_loss(diff, batch, log_q)
        )(diff_of(params, batch))
        # Scalar fed by EVERY gradient element (a cheaper scalar would let
        # XLA dead-code-eliminate most of the backward).
        return sum(
            jnp.vdot(leaf, leaf) for leaf in jax.tree_util.tree_leaves(grads)
        )

    # Scatter-only: a steady-state chained row update on the real tables.
    rng = np.random.default_rng(3)
    fake_grads = {
        name: (
            jnp.asarray(rng.integers(0, t.shape[0] - 1, BATCH), jnp.int32),
            jnp.asarray(rng.normal(size=(BATCH, t.shape[1])) * 1e-3, jnp.float32),
        )
        for name, t in tables.items()
    }

    @functools.partial(jax.jit, donate_argnums=(0,))
    def scatter_only(st, row_grads):
        # Donation is load-bearing: without it every call copies the full
        # tables+moments (~GBs) instead of updating rows in place.
        tbls, _ = split_params(st.params)
        new_tables, new_tstate, norm_sq = sparse_table_updates(
            tbls, st.table_state, row_grads, lr=jnp.float32(1e-3), step=st.step + 1
        )
        new_state = TrainState(
            step=st.step + 1,
            params={**st.params, **new_tables},
            opt_state=st.opt_state,
            table_state=new_tstate,
        )
        return new_state, norm_sq

    def run_fwd(n):
        for i in range(n):
            out = fwd(state.params, batches[i % len(batches)], log_q)
        _ = float(out)

    def run_fwd_bwd(n):
        for i in range(n):
            out = fwd_bwd(state.params, batches[i % len(batches)], log_q)
        _ = float(out)

    st = state

    def run_scatter(n):
        nonlocal st
        for _ in range(n):
            st, norm = scatter_only(st, fake_grads)
        _ = float(norm)

    n1, n2 = 20, 80
    fwd_ms = _slope(run_fwd, n1, n2) * 1e3
    bwd_ms = _slope(run_fwd_bwd, n1, n2) * 1e3
    scatter_ms = _slope(run_scatter, n1, n2) * 1e3
    phases = {
        "fwd_loss_ms": round(fwd_ms, 3),
        "fwd_bwd_ms": round(bwd_ms, 3),
        "bwd_only_ms": round(bwd_ms - fwd_ms, 3),
        "table_scatter_ms": round(scatter_ms, 3),
        "dense_adam_and_rest_ms": round(step_ms - bwd_ms - scatter_ms, 3),
        "full_step_ms": round(step_ms, 3),
    }
    print(json.dumps({"breakdown": phases}), file=sys.stderr)


if __name__ == "__main__":
    main()
