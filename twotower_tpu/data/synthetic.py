"""Synthetic interaction generator for tests and benchmarks.

No reference analog (the reference's tests hand-build tiny DataFrames,
tests/unit/test_preprocessor.py:277-292); this produces arbitrarily sized,
seeded, power-law-distributed interactions with latent structure so retrieval
metrics are meaningfully above chance — letting us exercise the full train/
eval path without network access to the real Amazon Reviews dataset.
"""

from __future__ import annotations

import numpy as np

from twotower_tpu.data.schema import Interactions


def generate_interactions(
    num_users: int = 1000,
    num_items: int = 500,
    num_interactions: int = 10_000,
    latent_dim: int = 8,
    noise: float = 0.5,
    with_text: bool = False,
    seed: int = 42,
    affinity_scale: float = 1.0,
) -> Interactions:
    """Sample interactions from a latent-factor model.

    Users/items get latent vectors; each interaction draws its item from the
    user's affinity softmax with probability ``1 - noise`` and from a global
    power-law popularity distribution with probability ``noise`` — a true
    component mixture, so the power-law head adds realistic skew without
    multiplying into every affinity draw (an additive ``log(popularity)``
    logit term lets one zipf-head item dominate the whole catalog at small
    ``num_items``). A two-tower model can recover the latent structure and
    beat random Recall@K by a wide margin. ``affinity_scale`` sharpens the
    softmax: at large catalogs (10k+ items) raise it to ~3 so per-user mass
    concentrates enough for a meaningful recall ceiling.
    """
    rng = np.random.default_rng(seed)
    u_lat = rng.normal(size=(num_users, latent_dim)).astype(np.float32)
    i_lat = rng.normal(size=(num_items, latent_dim)).astype(np.float32)
    popularity = rng.zipf(1.5, size=num_items).astype(np.float64)
    popularity /= popularity.sum()

    users = rng.integers(0, num_users, size=num_interactions)
    items = np.empty(num_interactions, dtype=np.int64)

    # Vectorized per-chunk sampling: gumbel-argmax over affinity logits,
    # mixed per-row with popularity draws.
    chunk = 8192
    for start in range(0, num_interactions, chunk):
        end = min(start + chunk, num_interactions)
        uu = users[start:end]
        logits = (
            np.float32(affinity_scale) * (u_lat[uu] @ i_lat.T)
            / np.float32(np.sqrt(latent_dim))
        )
        gumbel = -np.log(
            -np.log(rng.random(logits.shape, dtype=np.float32) + 1e-12) + 1e-12
        )
        aff_items = np.argmax(logits + gumbel, axis=1)
        pop_items = rng.choice(num_items, size=end - start, p=popularity)
        use_pop = rng.random(end - start) < noise
        items[start:end] = np.where(use_pop, pop_items, aff_items)

    affinity = np.einsum("nd,nd->n", u_lat[users], i_lat[items]) / np.sqrt(latent_dim)
    rating = np.clip(np.round(3.0 + affinity + 0.5 * rng.normal(size=num_interactions)), 1, 5)
    base_ts = 1_600_000_000
    timestamp = base_ts + np.sort(rng.integers(0, 3 * 365 * 86400, size=num_interactions))

    text = None
    title = None
    if with_text:
        words = np.array(
            ["great", "terrible", "quality", "product", "love", "broken",
             "works", "fast", "shipping", "recommend", "money", "waste"],
            dtype=object,
        )
        text = np.array(
            [" ".join(rng.choice(words, size=rng.integers(5, 20))) for _ in range(num_interactions)],
            dtype=object,
        )
        title = np.array(
            [" ".join(rng.choice(words, size=2)) for _ in range(num_interactions)], dtype=object
        )

    return Interactions(
        user_id=np.array([f"U{u:07d}" for u in users], dtype=object),
        item_id=np.array([f"I{i:07d}" for i in items], dtype=object),
        rating=rating.astype(np.float32),
        timestamp=timestamp.astype(np.int64),
        text=text,
        title=title,
    )
