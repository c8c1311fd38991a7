"""End-to-end HTTP serving-stack benchmark (aiohttp front + coalescing).

Measures what the HTTP layer ADDS on top of the on-device search: JSON
parse, vocab decode, micro-batch coalescing, asyncio scheduling, response
encode. Runs on the CPU backend with a small corpus so the device call is
microseconds and the stack overhead is what's left; total production
latency = this overhead + the device search time recorded in
docs/serving.md (0.37 ms @ 500k, 4.0 ms @ 10M items on v5e).

(Measuring the full path through the axon TPU tunnel would time the
tunnel's D2H latency, not the serving design — see the verify skill notes.)

Usage: python benchmarks/serving_http.py [--requests 2000] [--concurrency 32]
        [--routes recommend,similar_items,recommend_by_history]
Prints p50/p90/p99 per-request latency and sustained QPS per POST route,
coalescing on/off (all three endpoint families coalesce — each has its own
MicroBatcher).
"""

from __future__ import annotations

import argparse
import asyncio
import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from twotower_tpu.config import Config  # noqa: E402
from twotower_tpu.data.vocab import Vocabulary, VocabPair  # noqa: E402
from twotower_tpu.models import two_tower  # noqa: E402
from twotower_tpu.serving.api import RecommendService, create_app  # noqa: E402
from twotower_tpu.serving.index import RetrievalIndex  # noqa: E402

NUM_USERS, NUM_ITEMS = 10_000, 5_000


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
        users=Vocabulary.build(np.array([f"U{i:06d}" for i in range(NUM_USERS)])),
        items=Vocabulary.build(np.array([f"I{i:06d}" for i in range(NUM_ITEMS)])),
    )
    # default_k matches the benchmarked k so startup warmup covers the
    # traffic's shapes (non-default k compiles lazily, as in production).
    return RecommendService(index, vocab, default_k=10)


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
    args = ap.parse_args()

    service = build_service()
    for route in args.routes.split(","):
        for coalesce in (False, True):
            r = asyncio.run(
                bench(
                    service,
                    route=route,
                    coalesce=coalesce,
                    n_requests=args.requests,
                    concurrency=args.concurrency,
                )
            )
            print(
                f"{route:22s} coalesce={str(coalesce):5s}  "
                f"p50 {r['p50_ms']:6.2f} ms  p90 {r['p90_ms']:6.2f} ms  "
                f"p99 {r['p99_ms']:6.2f} ms  {r['qps']:8.0f} req/s"
            )


if __name__ == "__main__":
    main()
