"""Property-based tests (hypothesis) for the trickiest static-shape plumbing:
batch dedup, a2a owner-bucketing, and the bucketed lookup under a mesh.

These complement the golden-value tests: instead of hand-picked fixtures,
hypothesis drives skewed/duplicated/adversarial id patterns through the same
invariants a correct implementation must hold for EVERY input.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytest.importorskip("hypothesis")  # dev extra; skip cleanly where absent
from hypothesis import given, settings, strategies as st  # noqa: E402

from twotower_tpu.training.sparse import dedup_rows

pytestmark = pytest.mark.filterwarnings("ignore::DeprecationWarning")


def _ids_strategy(max_id: int, size: int):
    # Mix of uniform ids and heavy duplication (small alphabets).
    return st.one_of(
        st.lists(st.integers(0, max_id - 1), min_size=size, max_size=size),
        st.lists(st.integers(0, 2), min_size=size, max_size=size),
    )


class TestDedupRowsProperties:
    @settings(max_examples=30, deadline=None)
    @given(ids=_ids_strategy(max_id=50, size=32), seed=st.integers(0, 2**31 - 1))
    def test_scatter_of_dedup_equals_dense_accumulation(self, ids, seed):
        """Scatter-adding the deduped (target, summed) pairs must equal the
        dense np.add.at accumulation over the raw (id, grad) stream, and the
        dead row must stay untouched."""
        e, n_rows, dead = 4, 64, 63
        rng = np.random.default_rng(seed)
        ids = np.asarray(ids, np.int32)
        grads = rng.normal(size=(len(ids), e)).astype(np.float32)

        targets, summed, valid = dedup_rows(
            jnp.asarray(ids), jnp.asarray(grads), dead
        )
        targets, summed, valid = map(np.asarray, (targets, summed, valid))

        got = np.zeros((n_rows, e), np.float32)
        np.add.at(got, targets, summed * valid[:, None])
        want = np.zeros((n_rows, e), np.float32)
        np.add.at(want, ids, grads)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
        assert np.all(got[dead] == 0.0)

        # Valid targets are unique (each row Adam-updated at most once).
        tv = targets[valid]
        assert len(tv) == len(set(tv.tolist()))


class TestBucketByOwnerProperties:
    @settings(max_examples=30, deadline=None)
    @given(
        ids=_ids_strategy(max_id=64, size=24),
        cap=st.integers(1, 24),
        num_shards=st.sampled_from([1, 2, 4, 8]),
    )
    def test_bucketing_invariants(self, ids, cap, num_shards):
        from twotower_tpu.parallel.a2a import _bucket_by_owner

        rows_per_shard = 64 // num_shards
        ids = np.asarray(ids, np.int32)
        out = _bucket_by_owner(jnp.asarray(ids), rows_per_shard, num_shards, cap)
        sorted_ids, sorted_owner, dest, slot, order, bucket_pos, dropped = map(
            np.asarray, out
        )

        # The sort is a permutation and the inverse reconstructs the input.
        assert sorted(order.tolist()) == list(range(len(ids)))
        np.testing.assert_array_equal(ids[order], sorted_ids)

        owner = np.clip(ids // rows_per_shard, 0, num_shards - 1)
        np.testing.assert_array_equal(owner[order], sorted_owner)

        # Non-overflow entries go to their owner; DUPLICATE ids share one
        # (dest, slot) (dedup-before-exchange) while distinct ids never
        # collide; overflow entries all land in the trash bucket.
        overflow = bucket_pos >= cap
        np.testing.assert_array_equal(dest[~overflow], sorted_owner[~overflow])
        assert np.all(dest[overflow] == num_shards)
        slot_to_id: dict[tuple[int, int], int] = {}
        for d, s, i in zip(
            dest[~overflow].tolist(),
            slot[~overflow].tolist(),
            sorted_ids[~overflow].tolist(),
        ):
            assert slot_to_id.setdefault((d, s), i) == i  # no clobbering
        assert np.all(slot < cap)

        # Same id -> same slot everywhere (the dedup invariant).
        for i in set(sorted_ids.tolist()):
            sel = sorted_ids == i
            assert len(set(zip(dest[sel].tolist(), slot[sel].tolist()))) == 1

        # Drop accounting: capacity bounds UNIQUE ids per owner; an entry
        # drops iff its id is beyond the owner's first `cap` unique ids.
        want_drops = 0
        for s in range(num_shards):
            sel_ids = sorted_ids[sorted_owner == s]
            uniq, counts = np.unique(sel_ids, return_counts=True)
            want_drops += int(counts[cap:].sum())
        assert int(dropped) == want_drops


class TestAlltoallLookupProperties:
    @settings(max_examples=8, deadline=None)
    @given(
        seed=st.integers(0, 2**31 - 1),
        cap=st.sampled_from([2, 4, 8, 16]),
    )
    def test_non_overflow_ids_get_their_rows(self, seed, cap):
        """For every id whose owner bucket did NOT overflow, the returned row
        must equal table[id] exactly; the drop count must match the sum of
        per-(device, owner) bucket overflows."""
        from jax.experimental.shard_map import shard_map
        from jax.sharding import Mesh, PartitionSpec as P

        from twotower_tpu.parallel.a2a import alltoall_lookup

        devs = jax.devices()
        if len(devs) < 8:
            pytest.skip("needs 8 virtual devices")
        mesh = Mesh(np.array(devs[:8]), ("x",))
        n_rows, e, per_dev = 64, 4, 16
        rng = np.random.default_rng(seed)
        table = rng.normal(size=(n_rows, e)).astype(np.float32)
        ids = rng.integers(0, n_rows, 8 * per_dev).astype(np.int32)

        def body(t, i):
            rows, dropped = alltoall_lookup(
                t, i, axis_name="x", capacity=cap, return_stats=True
            )
            return rows, dropped[None]  # [1] per device -> [8] gathered

        fn = shard_map(
            body,
            mesh=mesh,
            in_specs=(P("x", None), P("x")),
            out_specs=(P("x"), P("x")),
            check_rep=False,
        )
        rows, dropped = fn(jnp.asarray(table), jnp.asarray(ids))
        rows = np.asarray(rows)
        dropped = int(np.asarray(dropped).sum())

        rows_per_shard = n_rows // 8
        want_drops = 0
        for d in range(8):
            chunk = ids[d * per_dev : (d + 1) * per_dev]
            owners = chunk // rows_per_shard
            # Dedup-before-exchange: capacity bounds UNIQUE ids per owner.
            # An entry survives iff its id is among the first `cap` unique
            # ids (ascending — the bucketing sorts by id) of its owner.
            ok = np.zeros(per_dev, bool)
            for o in range(8):
                sel = owners == o
                uniq = np.unique(chunk[sel])  # ascending
                kept = set(uniq[:cap].tolist())
                ok[sel] = np.isin(chunk[sel], list(kept))
                want_drops += int((~ok[sel]).sum())
            got = rows[d * per_dev : (d + 1) * per_dev]
            np.testing.assert_allclose(
                got[ok], table[chunk[ok]], rtol=0, atol=0,
                err_msg=f"device {d} non-overflow rows corrupted",
            )
        assert dropped == want_drops


class TestTwoPassProperties:
    @settings(max_examples=12, deadline=None)
    @given(
        seed=st.integers(0, 2**31 - 1),
        n=st.integers(300, 40_000),
        k=st.sampled_from([1, 3, 17, 64]),
        valid_frac=st.floats(0.05, 1.0),
        chunk=st.sampled_from([2048, 10_007, 16384]),  # incl. non-64-multiple
    )
    def test_twopass_equals_plain_scan(self, seed, n, k, valid_frac, chunk):
        """For ANY corpus size, k, chunk (even non-block-multiple), and
        valid bound, the two-pass exact search returns the plain scan's
        values with in-range, duplicate-free finite-score indices."""
        from twotower_tpu.ops.topk import topk_mips, topk_mips_twopass

        rng = np.random.default_rng(seed)
        nv = max(k, int(n * valid_frac))
        q = jnp.asarray(rng.normal(size=(4, 12)), jnp.float32)
        items = jnp.asarray(rng.normal(size=(n, 12)), jnp.float32)
        v1, _ = topk_mips(q, items, k, num_valid=nv)
        v2, i2 = topk_mips_twopass(
            q, items, k, chunk_size=chunk, block=64, row_slab=2, num_valid=nv
        )
        np.testing.assert_allclose(
            np.asarray(v1), np.asarray(v2), rtol=3e-6, atol=3e-6
        )
        v2, i2 = np.asarray(v2), np.asarray(i2)
        for row_v, row_i in zip(v2, i2):
            finite = row_i[np.isfinite(row_v)]
            assert len(set(finite.tolist())) == len(finite)
            if len(finite):
                assert finite.max() < nv
