"""End-to-end HTTP serving-stack benchmark (aiohttp front + coalescing).

Measures what the HTTP layer ADDS on top of the on-device search: JSON
parse, vocab decode, micro-batch coalescing, asyncio scheduling, response
encode. Runs on the CPU backend with a small corpus so the device call is
microseconds and the stack overhead is what's left; total production
latency = this overhead + the device search time recorded in
docs/serving.md (0.37 ms @ 500k, 4.0 ms @ 10M items on v5e).

``--tpu`` runs the SAME aiohttp stack against the real chip with a
production-scale index (10M items x 128-dim, bf16 resident) — the full
HTTP-path number the reference's 8-12 ms target speaks to. On this
machine the device transport is the axon tunnel, which adds a measured
per-device-call RTT; the benchmark measures and prints that floor
(``tunnel_rtt_ms``) so the HTTP-path numbers can be decomposed into
stack + device + transport (see docs/serving.md).

Usage: python benchmarks/serving_http.py [--requests 2000] [--concurrency 32]
        [--routes recommend,similar_items,recommend_by_history]
        [--tpu] [--items 10000000] [--sweep 1,8,32]
Prints p50/p90/p99 per-request latency and sustained QPS per POST route,
coalescing on/off (all three endpoint families coalesce — each has its own
MicroBatcher), plus one machine-readable JSON line per cell.
"""

from __future__ import annotations

import argparse
import asyncio
import json
import time

import jax
import numpy as np

from twotower_tpu.config import Config
from twotower_tpu.data.vocab import Vocabulary, VocabPair
from twotower_tpu.models import two_tower
from twotower_tpu.serving.api import RecommendService, create_app
from twotower_tpu.serving.index import RetrievalIndex

NUM_USERS, NUM_ITEMS = 10_000, 5_000


def _id_vocab(prefix: str, count: int) -> Vocabulary:
    """Pre-sorted id strings via pyarrow (host CPU is throttled; a Python
    f-string loop over 10M ids takes minutes)."""
    from twotower_tpu.data.synthetic_scale import _id_table

    ids = _id_table(prefix, count).to_numpy(zero_copy_only=False).astype(object)
    return Vocabulary(ids=ids, counts=np.ones(count, np.int64))


def build_service() -> RecommendService:
    cfg = Config().with_overrides(
        {
            "model.embedding_dim": 32,
            "model.user_tower_dims": [64, 32],
            "model.item_tower_dims": [64, 32],
        }
    )
    params = two_tower.init_params(
        jax.random.PRNGKey(0), cfg.model, NUM_USERS, NUM_ITEMS
    )
    index = RetrievalIndex(cfg, params, num_users=NUM_USERS, num_items=NUM_ITEMS)
    vocab = VocabPair(
        users=_id_vocab("U", NUM_USERS), items=_id_vocab("I", NUM_ITEMS)
    )
    # default_k matches the benchmarked k so startup warmup covers the
    # traffic's shapes (non-default k compiles lazily, as in production).
    return RecommendService(index, vocab, default_k=10)


def build_service_tpu(num_items: int, embedding_dim: int) -> RecommendService:
    """Production-scale index on the real chip: reference model shapes,
    bf16-resident ANN corpus (the flagship serving layout; docs/serving.md
    records its recall≥target audit)."""
    num_users = 1_000_000  # user-table size doesn't affect search cost
    cfg = Config().with_overrides(
        {
            "model.embedding_dim": embedding_dim,
            "serving.corpus_dtype": "bfloat16",
        }
    )
    print(
        f"# building {num_items}x{embedding_dim} bf16 index on "
        f"{jax.devices()[0].platform} (one-time encode)...",
        flush=True,
    )
    params = two_tower.init_params(
        jax.random.PRNGKey(0), cfg.model, num_users, num_items
    )
    index = RetrievalIndex(cfg, params, num_users=num_users, num_items=num_items)
    vocab = VocabPair(
        users=_id_vocab("U", num_users), items=_id_vocab("I", num_items)
    )
    return RecommendService(index, vocab, default_k=10)


def measure_tunnel_rtt(n: int = 50) -> float:
    """Median round-trip of a minimal chained device call + scalar fetch —
    the per-request transport floor any uncoalesced HTTP number includes."""
    import jax.numpy as jnp

    @jax.jit
    def tick(x):
        return x + 1

    x = jnp.float32(0)
    x = tick(x)
    float(x)  # warm compile + first fetch
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(tick(x))
        times.append(time.perf_counter() - t0)
    return float(np.median(times) * 1e3)


def _payload(route: str, u: int) -> dict:
    if route == "recommend":
        return {"user_idx": u % NUM_USERS, "k": 10}
    if route == "similar_items":
        return {"item_idx": u % NUM_ITEMS, "k": 10}
    if route == "recommend_by_history":
        return {
            "history_idx": [(u + j) % NUM_ITEMS for j in range(4)],
            "k": 10,
        }
    raise ValueError(route)


async def bench(
    service, *, route: str, coalesce: bool, n_requests: int, concurrency: int
):
    from aiohttp.test_utils import TestClient, TestServer

    app = create_app(service, coalesce=coalesce, window_ms=2.0)
    latencies: list[float] = []
    async with TestClient(TestServer(app)) as client:
        # warm the jit caches
        warm = await client.post(f"/{route}", json=_payload(route, 0))
        assert warm.status == 200, await warm.text()

        sem = asyncio.Semaphore(concurrency)

        async def one(u: int) -> None:
            async with sem:
                t0 = time.perf_counter()
                r = await client.post(f"/{route}", json=_payload(route, u))
                body = await r.json()
                latencies.append(time.perf_counter() - t0)
                assert r.status == 200 and len(body["results"][0]["items"]) == 10

        t0 = time.perf_counter()
        await asyncio.gather(*(one(u) for u in range(n_requests)))
        wall = time.perf_counter() - t0
    lat = np.sort(np.array(latencies) * 1e3)
    return {
        "p50_ms": float(lat[int(0.50 * len(lat))]),
        "p90_ms": float(lat[int(0.90 * len(lat))]),
        "p99_ms": float(lat[int(0.99 * len(lat))]),
        "qps": n_requests / wall,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=2000)
    ap.add_argument("--concurrency", type=int, default=32)
    ap.add_argument(
        "--routes",
        type=str,
        default="recommend,similar_items,recommend_by_history",
    )
    ap.add_argument(
        "--tpu", action="store_true",
        help="run against the real chip with a production-scale index "
        "(default platform is forced to CPU so the stack overhead is "
        "measured in isolation)",
    )
    ap.add_argument("--items", type=int, default=10_000_000,
                    help="--tpu index size")
    ap.add_argument("--dim", type=int, default=128, help="--tpu embedding dim")
    ap.add_argument(
        "--sweep", type=str, default=None,
        help="comma-separated concurrency levels (overrides --concurrency); "
        "requests per cell scale as max(--requests/4, 25*concurrency)",
    )
    args = ap.parse_args()

    if args.tpu:
        service = build_service_tpu(args.items, args.dim)
        rtt = measure_tunnel_rtt()
        print(f"# device transport RTT floor: {rtt:.1f} ms/call", flush=True)
        print(json.dumps({"tunnel_rtt_ms": round(rtt, 2)}), flush=True)
    else:
        jax.config.update("jax_platforms", "cpu")
        service = build_service()

    levels = (
        [int(x) for x in args.sweep.split(",")]
        if args.sweep
        else [args.concurrency]
    )
    for route in args.routes.split(","):
        for concurrency in levels:
            n_requests = (
                max(args.requests // 4, 25 * concurrency)
                if args.sweep
                else args.requests
            )
            for coalesce in (False, True):
                r = asyncio.run(
                    bench(
                        service,
                        route=route,
                        coalesce=coalesce,
                        n_requests=n_requests,
                        concurrency=concurrency,
                    )
                )
                print(
                    f"{route:22s} c={concurrency:<3d} "
                    f"coalesce={str(coalesce):5s}  "
                    f"p50 {r['p50_ms']:6.2f} ms  p90 {r['p90_ms']:6.2f} ms  "
                    f"p99 {r['p99_ms']:6.2f} ms  {r['qps']:8.0f} req/s",
                    flush=True,
                )
                print(
                    json.dumps(
                        {
                            "route": route,
                            "concurrency": concurrency,
                            "coalesce": coalesce,
                            "requests": n_requests,
                            **{k: round(v, 2) for k, v in r.items()},
                        }
                    ),
                    flush=True,
                )


if __name__ == "__main__":
    main()
