"""Execution-rung auto-selection for ``train-model``.

The trainer has three execution rungs (docs/architecture.md "transport-
aware execution ladder"):

- ``device_loop``: encoded train columns resident in HBM; shuffle + the
  whole epoch compile to ONE device program. Full Fisher-Yates
  permutation per epoch — the best measured metric quality at scale
  (+49% r@10 over an 8M-row windowed stream at 50M rows, PARITY.md) and
  the best wall rate (no per-step dispatch at all).
- ``host``: train columns in host RAM, full-permutation shuffle, batches
  dispatched through the (segmented) host loop.
- ``stream``: out-of-core windowed-shuffle streaming from the prepared
  parquet; bounded host memory, window size = metric-quality dial.

Round-4 verdict #6: defaults used to leave quality on the table — an
operator who passed no flags got the host loop (or, on the lifecycle
driver, a windowed stream) even when the columns comfortably fit HBM.
``choose_execution_rung`` picks the best rung the measured budgets allow;
explicit ``--device-loop`` / ``--stream-batches`` flags still force.

The decision is PURE (all budgets are inputs) so it is unit-testable;
``device_free_bytes``/``host_available_bytes`` come from
``jax.local_devices()[0].memory_stats()`` and ``/proc/meminfo`` at the
call site.
"""

from __future__ import annotations

from dataclasses import dataclass

from twotower_tpu.logging_utils import get_logger

logger = get_logger(__name__)

# Resident bytes per train row on device: user_idx + item_idx int32 +
# weight f32 (DeviceDataset.columns).
_DEVICE_ROW_BYTES = 12
# Transient headroom per row for the epoch program: the permutation
# (int32) plus the gathered shuffled copies the scan consumes.
_DEVICE_ROW_TRANSIENT = 24
# Fixed device workspace besides state + columns: the eval encode of the
# corpus is counted separately; this covers loss/score buffers, collective
# scratch, and fragmentation slop.
_DEVICE_WORKSPACE = 2 << 30
# Host bytes per train row for the in-RAM path: u/i/ts columns plus the
# split copies (measured ~2x the raw 16B columns at 50M rows).
_HOST_ROW_BYTES = 32
# Streaming window cost: two int32 buffers plus eviction copies.
_STREAM_ROW_BYTES = 16


@dataclass
class RungDecision:
    rung: str  # "device_loop" | "host" | "stream"
    shuffle_buffer: int | None  # stream rung only
    reason: str


def train_state_bytes(config, num_users: int, num_items: int) -> int:
    """f32 params + packed Adam moments for the tables (3x rows x E), plus
    the dense towers (x3 for param + 2 moments). Mirrors
    ``TrainState.for_config``'s sparse layout; the dense-optimizer layout
    is the same total."""
    e = config.model.embedding_dim
    rows = num_users + num_items + 2  # + dead rows (padded tables)
    if config.model.text_buckets:
        rows += config.model.text_buckets + 1
    table = rows * e * 4 * 3
    dense = 0
    for dims in (config.model.user_tower_dims, config.model.item_tower_dims):
        prev = e
        for d in dims:
            dense += (prev * d + d) * 4 * 3
            prev = d
    return table + dense


def eval_corpus_bytes(config, num_items: int) -> int:
    itemsize = 2 if config.retrieval.eval_corpus_dtype == "bfloat16" else 4
    return num_items * config.model.embedding_dim * itemsize


def choose_execution_rung(
    *,
    n_train: int,
    num_users: int,
    num_items: int,
    config,
    device_free_bytes: int | None,
    host_available_bytes: int | None,
    multi_process: bool = False,
    has_eval: bool = True,
) -> RungDecision:
    """Pick the highest rung whose memory requirement fits the budget.

    ``device_free_bytes``: free HBM on one chip (None = unknown -> assume
    16 GB, the v5e figure). ``host_available_bytes``: MemAvailable (None =
    unknown -> be conservative, stream). ``multi_process``: the device
    loop is single-controller only — multi-controller runs cap at host.
    """
    if device_free_bytes is None:
        device_free_bytes = 16 << 30
    state = train_state_bytes(config, num_users, num_items)
    corpus = eval_corpus_bytes(config, num_items) if has_eval else 0
    device_need = (
        state
        + corpus
        + n_train * (_DEVICE_ROW_BYTES + _DEVICE_ROW_TRANSIENT)
        + _DEVICE_WORKSPACE
    )
    if not multi_process and device_need <= device_free_bytes:
        return RungDecision(
            "device_loop",
            None,
            f"train columns + state fit HBM (need ~{device_need >> 20} MiB "
            f"of {device_free_bytes >> 20} MiB: state {state >> 20}, "
            f"corpus {corpus >> 20}, columns "
            f"{(n_train * _DEVICE_ROW_BYTES) >> 20} + transient)",
        )
    host_need = n_train * _HOST_ROW_BYTES
    if host_available_bytes is not None and host_need <= host_available_bytes // 2:
        return RungDecision(
            "host",
            None,
            f"columns exceed HBM (need ~{device_need >> 20} MiB of "
            f"{device_free_bytes >> 20} MiB) but fit host RAM "
            f"(~{host_need >> 20} MiB of {host_available_bytes >> 20} MiB "
            "available): full-permutation shuffle via the host loop",
        )
    # Stream: size the window as large as the host allows (quality dial —
    # PARITY.md measured r@10 0.0046/0.0065/0.0072 for 1M/8M/full at 50M
    # rows), capped at n_train (== a full permutation) and floored at the
    # batch size by the pipeline itself.
    budget = (host_available_bytes or (4 << 30)) // 4
    window = max(1 << 20, min(n_train, budget // _STREAM_ROW_BYTES))
    return RungDecision(
        "stream",
        int(window),
        f"columns fit neither HBM (~{device_need >> 20} MiB) nor host RAM "
        f"budget; streaming with a {window:,}-row shuffle window",
    )


def device_free_bytes() -> int | None:
    """Free HBM of the first local device (None when the backend exposes
    no memory_stats — e.g. the CPU backend)."""
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats()
    except Exception:  # pragma: no cover - backend-dependent
        return None
    if not stats:
        return None
    limit = stats.get("bytes_limit")
    used = stats.get("bytes_in_use", 0)
    if not limit:
        return None
    return int(limit) - int(used)


def host_available_bytes() -> int | None:
    """MemAvailable from /proc/meminfo (None off-Linux)."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable:"):
                    return int(line.split()[1]) * 1024
    except OSError:  # pragma: no cover
        return None
    return None
