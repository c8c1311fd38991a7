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


def _affinity_items_np(u_lat, i_lat, users, affinity_scale, rng):
    """Chunked numpy gumbel-argmax (small workloads / no accelerator)."""
    latent_dim = u_lat.shape[1]
    items = np.empty(len(users), dtype=np.int64)
    chunk = 8192
    for start in range(0, len(users), chunk):
        end = min(start + chunk, len(users))
        uu = users[start:end]
        logits = (
            np.float32(affinity_scale) * (u_lat[uu] @ i_lat.T)
            / np.float32(np.sqrt(latent_dim))
        )
        gumbel = -np.log(
            -np.log(rng.random(logits.shape, dtype=np.float32) + 1e-12) + 1e-12
        )
        items[start:end] = np.argmax(logits + gumbel, axis=1)
    return items


def _affinity_items_jax(u_lat, i_lat, users, affinity_scale, seed):
    """Device-side gumbel-argmax: the [chunk, num_items] logits live in
    accelerator HBM and the matmul runs on the MXU; only the winning item
    ids come back to the host. Deterministic for a fixed seed (its own
    PRNG stream — values differ from the numpy path, the distribution is
    identical)."""
    import jax
    import jax.numpy as jnp

    latent_dim = u_lat.shape[1]
    chunk = 8192
    n = len(users)
    padded = -(-n // chunk) * chunk
    users_p = np.pad(users, (0, padded - n)).reshape(padded // chunk, chunk)

    @jax.jit
    def sample_chunk(key, uu, u_lat_d, i_lat_d):
        logits = (
            jnp.float32(affinity_scale)
            * (u_lat_d[uu] @ i_lat_d.T)
            / jnp.sqrt(jnp.float32(latent_dim))
        )
        gumbel = jax.random.gumbel(key, logits.shape, jnp.float32)
        return jnp.argmax(logits + gumbel, axis=1)

    u_lat_d, i_lat_d = jnp.asarray(u_lat), jnp.asarray(i_lat)
    root = jax.random.PRNGKey(seed)
    out = [
        sample_chunk(jax.random.fold_in(root, i), jnp.asarray(row), u_lat_d, i_lat_d)
        for i, row in enumerate(users_p)
    ]
    return np.asarray(jnp.concatenate(out))[:n].astype(np.int64)


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

    # Gumbel-argmax over the full [chunk, num_items] affinity logits is the
    # FLOP/bandwidth hot spot (it IS a softmax sample, exactly): at 1M
    # interactions x 100k items it streams hundreds of GB, minutes-to-hours
    # on a throttled host but milliseconds on an accelerator's MXU — so the
    # affinity draw dispatches to JAX past a size threshold.
    if num_interactions * num_items >= 1 << 28:
        aff_items = _affinity_items_jax(u_lat, i_lat, users, affinity_scale, seed)
    else:
        aff_items = _affinity_items_np(u_lat, i_lat, users, affinity_scale, rng)
    pop_items = rng.choice(num_items, size=num_interactions, p=popularity)
    use_pop = rng.random(num_interactions) < noise
    items = np.where(use_pop, pop_items, aff_items).astype(np.int64)

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
