"""Golden-value tests for losses and top-k ops vs NumPy references.

Mirrors the test strategy SURVEY.md §4 prescribes for the TPU build:
loss/metric math is checked against straightforward NumPy implementations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from twotower_tpu.ops import (
    in_batch_softmax_loss,
    topk_mips,
    topk_mips_sharded,
    uniform_sampled_softmax_loss,
)


def _np_softmax_ce(logits: np.ndarray) -> np.ndarray:
    m = logits.max(axis=1, keepdims=True)
    lse = m + np.log(np.exp(logits - m).sum(axis=1, keepdims=True))
    return (lse.squeeze(1) - np.diagonal(logits)).astype(np.float32)


class TestInBatchSoftmax:
    def test_matches_numpy(self, rng):
        b, d = 16, 8
        u = rng.normal(size=(b, d)).astype(np.float32)
        v = rng.normal(size=(b, d)).astype(np.float32)
        idx = np.arange(b, dtype=np.int32)  # all distinct: no masking
        loss, metrics = in_batch_softmax_loss(
            jnp.asarray(u), jnp.asarray(v), jnp.asarray(idx), temperature=0.5
        )
        expected = _np_softmax_ce(u @ v.T / 0.5).mean()
        np.testing.assert_allclose(float(loss), expected, rtol=1e-5)
        assert 0.0 <= float(metrics["accuracy"]) <= 1.0

    def test_logq_correction_shifts_logits(self, rng):
        b, d, n_items = 8, 4, 32
        u = rng.normal(size=(b, d)).astype(np.float32)
        v = rng.normal(size=(b, d)).astype(np.float32)
        idx = rng.choice(n_items, size=b, replace=False).astype(np.int32)
        log_q = np.log(rng.uniform(0.01, 1.0, size=n_items)).astype(np.float32)
        loss, _ = in_batch_softmax_loss(
            jnp.asarray(u), jnp.asarray(v), jnp.asarray(idx),
            temperature=1.0, log_q=jnp.asarray(log_q),
        )
        logits = u @ v.T - log_q[idx][None, :]
        np.testing.assert_allclose(float(loss), _np_softmax_ce(logits).mean(), rtol=1e-5)

    def test_accidental_hits_masked(self):
        # Rows 0 and 1 share the same positive item: each must not see the
        # other's copy as a negative — loss should equal the 2-distinct case
        # with the duplicate column removed.
        d = 4
        u = np.eye(2, d).astype(np.float32)
        v = np.tile(np.ones((1, d), np.float32), (2, 1))
        idx = np.array([7, 7], np.int32)
        loss, _ = in_batch_softmax_loss(
            jnp.asarray(u), jnp.asarray(v), jnp.asarray(idx), temperature=1.0
        )
        # with the off-diagonal masked, each row's softmax is over 1 logit
        np.testing.assert_allclose(float(loss), 0.0, atol=1e-6)

    def test_padding_rows_ignored(self, rng):
        # Zero-weight rows contribute no loss AND their columns are masked
        # out as negatives: the loss must equal the unpadded 6-row batch.
        b, d = 8, 4
        u = rng.normal(size=(b, d)).astype(np.float32)
        v = rng.normal(size=(b, d)).astype(np.float32)
        idx = np.arange(b, dtype=np.int32)
        w = np.ones(b, np.float32)
        w[-2:] = 0.0
        loss_w, _ = in_batch_softmax_loss(
            jnp.asarray(u), jnp.asarray(v), jnp.asarray(idx),
            temperature=1.0, weights=jnp.asarray(w),
        )
        expected = _np_softmax_ce(u[:6] @ v[:6].T).mean()
        np.testing.assert_allclose(float(loss_w), expected, rtol=1e-5)

    def test_block_form_matches_full(self, rng):
        from twotower_tpu.ops.losses import in_batch_softmax_block

        b, d = 16, 8
        u = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, 12, b), jnp.int32)  # some dups
        log_q = jnp.asarray(np.log(rng.uniform(0.01, 1.0, 12)), jnp.float32)
        w = jnp.asarray(np.r_[np.ones(14), 0.0, 0.0], jnp.float32)
        full_pe, full_c, full_rd = in_batch_softmax_block(
            u, v, idx, 0, temperature=0.3, log_q=log_q, weights_all=w
        )
        for off, rows in ((0, 8), (8, 8), (4, 4)):
            pe, c, rd = in_batch_softmax_block(
                u[off : off + rows], v, idx, off,
                temperature=0.3, log_q=log_q, weights_all=w,
            )
            np.testing.assert_allclose(
                np.asarray(pe), np.asarray(full_pe)[off : off + rows], rtol=1e-5
            )
            np.testing.assert_allclose(
                np.asarray(c), np.asarray(full_c)[off : off + rows]
            )
            np.testing.assert_allclose(
                np.asarray(rd), np.asarray(full_rd)[off : off + rows], rtol=1e-5
            )

    def test_grad_is_finite(self, rng):
        b, d = 8, 4
        u = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)
        idx = jnp.asarray(np.array([1, 1, 2, 3, 4, 5, 6, 7]), jnp.int32)

        def f(u):
            return in_batch_softmax_loss(u, v, idx, temperature=0.1)[0]

        g = jax.grad(f)(u)
        assert np.isfinite(np.asarray(g)).all()

    def test_uniform_sampled(self, rng):
        b, d, n = 8, 4, 16
        u = rng.normal(size=(b, d)).astype(np.float32)
        p = rng.normal(size=(b, d)).astype(np.float32)
        neg = rng.normal(size=(n, d)).astype(np.float32)
        loss, _ = uniform_sampled_softmax_loss(
            jnp.asarray(u), jnp.asarray(p), jnp.asarray(neg), temperature=1.0
        )
        logits = np.concatenate([(u * p).sum(1)[:, None], u @ neg.T], axis=1)
        m = logits.max(axis=1, keepdims=True)
        lse = (m + np.log(np.exp(logits - m).sum(1, keepdims=True))).squeeze(1)
        np.testing.assert_allclose(float(loss), (lse - logits[:, 0]).mean(), rtol=1e-5)


class TestTopKMips:
    @pytest.mark.parametrize("n_items,chunk", [(100, 64), (1000, 128), (257, 128)])
    def test_matches_argsort(self, rng, n_items, chunk):
        b, d, k = 8, 16, 10
        q = rng.normal(size=(b, d)).astype(np.float32)
        items = rng.normal(size=(n_items, d)).astype(np.float32)
        vals, idx = topk_mips(jnp.asarray(q), jnp.asarray(items), k, chunk_size=chunk)
        scores = q @ items.T
        ref_idx = np.argsort(-scores, axis=1)[:, :k]
        ref_vals = np.take_along_axis(scores, ref_idx, axis=1)
        np.testing.assert_allclose(np.asarray(vals), ref_vals, rtol=1e-4)
        # indices may permute among exact ties; compare via scores
        got_scores = np.take_along_axis(scores, np.asarray(idx), axis=1)
        np.testing.assert_allclose(got_scores, ref_vals, rtol=1e-4)

    def test_k_exceeds_corpus_raises(self, rng):
        q = jnp.zeros((2, 4))
        items = jnp.zeros((3, 4))
        with pytest.raises(ValueError):
            topk_mips(q, items, 5)

    @pytest.mark.parametrize(
        "n_items,k,num_valid",
        [
            (60_000, 100, None),   # prefilter path, chunk-multiple padding
            (50_000, 50, 49_777),  # prefilter + pre-padded valid mask
            (20_000, 100, None),   # below 4*k*block -> plain-scan fallback
            (3_000, 7, None),      # deep fallback, one chunk
        ],
    )
    def test_twopass_matches_plain_scan(self, rng, n_items, k, num_valid):
        """topk_mips_twopass (block-maxima prefilter + candidate rescore —
        the large-corpus exact path for evaluation and exact serving) must
        return the plain scan's values and indices, including num_valid
        masking and the small-corpus fallback."""
        from twotower_tpu.ops.topk import topk_mips_twopass

        b, d = 16, 24
        q = rng.normal(size=(b, d)).astype(np.float32)
        items = rng.normal(size=(n_items, d)).astype(np.float32)
        kw = {} if num_valid is None else {"num_valid": num_valid}
        v1, i1 = topk_mips(jnp.asarray(q), jnp.asarray(items), k, **kw)
        v2, i2 = topk_mips_twopass(
            jnp.asarray(q), jnp.asarray(items), k,
            chunk_size=16384, block=64, row_slab=8, **kw,
        )
        # Values agree to the last ulp (different reduction shapes).
        np.testing.assert_allclose(
            np.asarray(v1), np.asarray(v2), rtol=2e-6, atol=2e-6
        )
        # No duplicate or out-of-range indices; scores of returned indices
        # match the reference values.
        scores = q @ items.T
        idx = np.asarray(i2)
        limit = n_items if num_valid is None else num_valid
        assert idx.max() < limit
        for row in idx:
            assert len(set(row.tolist())) == k
        got = np.take_along_axis(scores, idx, axis=1)
        np.testing.assert_allclose(got, np.asarray(v1), rtol=2e-5)

    def test_twopass_chunk_rounds_block_exceeds_raises(self, rng):
        from twotower_tpu.ops.topk import topk_mips_twopass

        # block > chunk is a hard error...
        with pytest.raises(ValueError, match="block"):
            topk_mips_twopass(
                jnp.zeros((2, 4)), jnp.ones((100, 4)), 5,
                chunk_size=100, block=256,
            )
        # ...but a non-block-multiple chunk just rounds down internally
        # (callers tuning memory shouldn't have to know the block): same
        # result as the plain scan.
        q = rng.normal(size=(4, 8)).astype(np.float32)
        items = rng.normal(size=(40_000, 8)).astype(np.float32)
        v1, _ = topk_mips(jnp.asarray(q), jnp.asarray(items), 10)
        v2, _ = topk_mips_twopass(
            jnp.asarray(q), jnp.asarray(items), 10,
            chunk_size=10_007, block=64,  # 10007 % 64 != 0
        )
        np.testing.assert_allclose(
            np.asarray(v1), np.asarray(v2), rtol=2e-6, atol=2e-6
        )

    def test_twopass_mostly_invalid_corpus_no_duplicates(self, rng):
        """num_valid far below the static corpus (the mostly-padding-shard
        regime of the sharded search, valid < k*block): repeated -inf
        block slots must NOT rescore a real block twice — results equal
        the plain scan with no duplicated ids (r3 review finding)."""
        from twotower_tpu.ops.topk import _twopass_core

        b, d, n, k, nv = 8, 16, 60_000, 100, 150  # 150 < k*block = 6400
        q = rng.normal(size=(b, d)).astype(np.float32)
        items = rng.normal(size=(n, d)).astype(np.float32)
        v1, i1 = topk_mips(jnp.asarray(q), jnp.asarray(items), k, num_valid=nv)
        # Call the core directly: the public wrapper's fallback would take
        # the plain scan for such a small valid count, but the SHARDED
        # dispatch decides on the static shard size and hits the core.
        v2, i2 = _twopass_core(
            jnp.asarray(q), jnp.asarray(items), k, 16384, 64, 8, nv
        )
        v1, v2 = np.asarray(v1), np.asarray(v2)
        i2 = np.asarray(i2)
        # The nv real candidates agree exactly; the rest are -inf.
        np.testing.assert_allclose(v1[:, :nv], v2[:, :nv], rtol=2e-6, atol=2e-6)
        assert np.all(np.isneginf(v2[:, nv:]))
        for row_v, row_i in zip(v2, i2):
            real = row_i[np.isfinite(row_v)]
            assert len(set(real.tolist())) == len(real)  # no dup real ids
            assert real.max(initial=-1) < nv

    def test_sharded_matches_global(self, rng):
        from jax.sharding import Mesh, PartitionSpec as P
        from jax.experimental.shard_map import shard_map

        devices = np.array(jax.devices()[:8]).reshape(8)
        mesh = Mesh(devices, ("model",))
        b, d, n, k = 4, 8, 64 * 8, 5
        q = rng.normal(size=(b, d)).astype(np.float32)
        items = rng.normal(size=(n, d)).astype(np.float32)

        fn = shard_map(
            lambda qq, ii: topk_mips_sharded(qq, ii, k, axis_name="model", chunk_size=128),
            mesh=mesh,
            in_specs=(P(), P("model", None)),
            out_specs=(P(), P()),
            check_rep=False,
        )
        vals, idx = fn(jnp.asarray(q), jnp.asarray(items))
        ref_vals, ref_idx = topk_mips(jnp.asarray(q), jnp.asarray(items), k, chunk_size=128)
        np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals), rtol=1e-4)
        scores = q @ items.T
        np.testing.assert_allclose(
            np.take_along_axis(scores, np.asarray(idx), axis=1),
            np.asarray(ref_vals),
            rtol=1e-4,
        )


    @pytest.mark.parametrize("num_items", [None, 30_000])
    def test_sharded_twopass_branch_matches_global(self, rng, num_items):
        """Shards large enough to trigger the per-shard two-pass exact
        path (rows > 4*k*block) must still merge to the global exact
        top-k, including the uneven last shard via num_items masking."""
        from jax.sharding import Mesh, PartitionSpec as P
        from jax.experimental.shard_map import shard_map

        devices = np.array(jax.devices()[:8]).reshape(8)
        mesh = Mesh(devices, ("model",))
        b, d, k = 4, 8, 8
        rows = 4096  # per shard: 4096 > 4*8*64 = 2048 -> twopass branch
        n_pad = rows * 8
        n = num_items or n_pad
        q = rng.normal(size=(b, d)).astype(np.float32)
        items = rng.normal(size=(n, d)).astype(np.float32)
        items_pad = np.zeros((n_pad, d), np.float32)
        items_pad[:n] = items

        fn = shard_map(
            lambda qq, ii: topk_mips_sharded(
                qq, ii, k, axis_name="model", num_items=n
            ),
            mesh=mesh,
            in_specs=(P(), P("model", None)),
            out_specs=(P(), P()),
            check_rep=False,
        )
        vals, idx = fn(jnp.asarray(q), jnp.asarray(items_pad))
        ref_vals, _ = topk_mips(jnp.asarray(q), jnp.asarray(items), k)
        np.testing.assert_allclose(
            np.asarray(vals), np.asarray(ref_vals), rtol=2e-6, atol=2e-6
        )
        idx = np.asarray(idx)
        assert idx.max() < n
        scores = q @ items.T
        np.testing.assert_allclose(
            np.take_along_axis(scores, idx, axis=1),
            np.asarray(ref_vals),
            rtol=1e-4,
        )
        for row in idx:
            assert len(set(row.tolist())) == k

    @pytest.mark.parametrize("quant", ["none", "global", "per_row"])
    def test_approx_sharded_matches_global(self, rng, quant):
        from jax.sharding import Mesh, PartitionSpec as P
        from jax.experimental.shard_map import shard_map

        from twotower_tpu.ops.topk import (
            quantize_corpus,
            topk_mips_approx,
            topk_mips_approx_sharded,
        )

        devices = np.array(jax.devices()[:8]).reshape(8)
        mesh = Mesh(devices, ("model",))
        b, d, n, k = 4, 8, 64 * 8, 5
        q = rng.normal(size=(b, d)).astype(np.float32)
        items = rng.normal(size=(n, d)).astype(np.float32)
        if quant == "none":
            corpus, scale = jnp.asarray(items), None
            in_specs = (P(), P("model", None))
            args = (jnp.asarray(q), corpus)
        else:
            corpus, scale = quantize_corpus(
                jnp.asarray(items), per_row=quant == "per_row"
            )
            scale_spec = P("model") if quant == "per_row" else P()
            in_specs = (P(), P("model", None), scale_spec)
            args = (jnp.asarray(q), corpus, scale)

        def body(qq, ii, ss=None):
            return topk_mips_approx_sharded(
                qq, ii, k, axis_name="model", item_scale_shard=ss
            )

        fn = shard_map(
            body, mesh=mesh, in_specs=in_specs, out_specs=(P(), P()),
            check_rep=False,
        )
        vals, idx = fn(*args)
        ref_vals, ref_idx = topk_mips_approx(
            jnp.asarray(q), corpus, k, item_scale=scale
        )
        # CPU approx_max_k is exact, so shard + merge reproduces the
        # single-device result bit-for-bit (same quantization on both).
        np.testing.assert_allclose(
            np.asarray(vals), np.asarray(ref_vals), rtol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))

    def test_exact_sharded_pad_rows_cannot_displace_negative_scores(self, rng):
        """Zero-filled shard padding must not displace real negative-scoring
        items from a shard's local top-k: tpu_mips_exact promises bit parity
        with the single-device exact search."""
        from jax.sharding import Mesh, PartitionSpec as P
        from jax.experimental.shard_map import shard_map

        devices = np.array(jax.devices()[:8]).reshape(8)
        mesh = Mesh(devices, ("model",))
        b, d, k = 3, 8, 6
        num_items = 100  # not divisible by 8 -> last shard holds pad rows
        rows = -(-num_items // 8) * 8
        # All-positive queries x all-negative items -> every score negative:
        # zero pad rows (score 0) would win every local top-k slot if not
        # masked before the local search.
        q = np.abs(rng.normal(size=(b, d))).astype(np.float32) + 0.1
        items = -(np.abs(rng.normal(size=(num_items, d))).astype(np.float32) + 0.1)
        padded = np.zeros((rows, d), np.float32)  # build-time zero fill
        padded[:num_items] = items

        fn = shard_map(
            lambda qq, ii: topk_mips_sharded(
                qq, ii, k, axis_name="model", chunk_size=128, num_items=num_items
            ),
            mesh=mesh, in_specs=(P(), P("model", None)),
            out_specs=(P(), P()), check_rep=False,
        )
        vals, idx = fn(jnp.asarray(q), jnp.asarray(padded))
        assert (np.asarray(idx) < num_items).all()
        ref_vals, ref_idx = topk_mips(jnp.asarray(q), jnp.asarray(items), k)
        np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))

    def test_int8_corpus_without_scale_raises(self, rng):
        """Silently casting float queries to an int8 corpus zeroes every
        score; both search paths must reject the call instead."""
        from twotower_tpu.ops.topk import quantize_corpus, topk_mips_approx

        items = rng.normal(size=(64, 8)).astype(np.float32)
        q8, _ = quantize_corpus(jnp.asarray(items))
        q = jnp.asarray(rng.normal(size=(2, 8)).astype(np.float32))
        with pytest.raises(ValueError, match="item_scale"):
            topk_mips_approx(q, q8, 4)
        with pytest.raises(TypeError, match="int8"):
            topk_mips(q, q8, 4)

    def test_approx_sharded_masks_shard_padding(self, rng):
        from jax.sharding import Mesh, PartitionSpec as P
        from jax.experimental.shard_map import shard_map

        from twotower_tpu.ops.topk import topk_mips, topk_mips_approx_sharded

        devices = np.array(jax.devices()[:8]).reshape(8)
        mesh = Mesh(devices, ("model",))
        b, d, k = 3, 8, 4
        num_items = 100  # not divisible by 8 -> shards pad to 13 rows
        rows = -(-num_items // 8) * 8
        items = rng.normal(size=(num_items, d)).astype(np.float32)
        padded = np.full((rows, d), 50.0, np.float32)  # poison pad rows
        padded[:num_items] = items
        q = rng.normal(size=(b, d)).astype(np.float32)

        fn = shard_map(
            lambda qq, ii: topk_mips_approx_sharded(
                qq, ii, k, axis_name="model", num_items=num_items
            ),
            mesh=mesh, in_specs=(P(), P("model", None)),
            out_specs=(P(), P()), check_rep=False,
        )
        vals, idx = fn(jnp.asarray(q), jnp.asarray(padded))
        assert (np.asarray(idx) < num_items).all()
        ref_vals, _ = topk_mips(jnp.asarray(q), jnp.asarray(items), k)
        np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals), rtol=1e-5)


class TestTopKApprox:
    def test_matches_exact_on_cpu(self, rng):
        from twotower_tpu.ops.topk import topk_mips_approx

        q = rng.normal(size=(8, 16)).astype(np.float32)
        items = rng.normal(size=(1000, 16)).astype(np.float32)
        vals, idx = topk_mips_approx(jnp.asarray(q), jnp.asarray(items), 10)
        scores = q @ items.T
        ref_idx = np.argsort(-scores, axis=1)[:, :10]
        ref_vals = np.take_along_axis(scores, ref_idx, axis=1)
        # CPU lowering of approx_max_k is exact; require high overlap anyway
        overlap = np.mean([
            len(set(np.asarray(idx[b]).tolist()) & set(ref_idx[b].tolist())) / 10
            for b in range(8)
        ])
        assert overlap >= 0.9
        np.testing.assert_allclose(np.asarray(vals)[:, 0], ref_vals[:, 0], rtol=1e-4)

    def test_query_chunking(self, rng):
        from twotower_tpu.ops.topk import topk_mips_approx

        q = rng.normal(size=(70, 8)).astype(np.float32)  # not a chunk multiple
        items = rng.normal(size=(300, 8)).astype(np.float32)
        vals, idx = topk_mips_approx(
            jnp.asarray(q), jnp.asarray(items), 5, query_chunk=32
        )
        assert vals.shape == (70, 5) and idx.shape == (70, 5)
        assert (np.asarray(idx) >= 0).all() and (np.asarray(idx) < 300).all()

    def test_item_chunked_matches_unchunked(self, rng):
        from twotower_tpu.ops.topk import topk_mips_approx

        q = rng.normal(size=(8, 16)).astype(np.float32)
        items = rng.normal(size=(1000, 16)).astype(np.float32)
        v1, i1 = topk_mips_approx(jnp.asarray(q), jnp.asarray(items), 10)
        # query_chunk * item_chunk budget of 2048 < 8 * 1000 scores forces
        # the blocked path (equal 128-multiple blocks + exact merge).
        v2, i2 = topk_mips_approx(
            jnp.asarray(q), jnp.asarray(items), 10, query_chunk=8, item_chunk=256
        )
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    @pytest.mark.parametrize("per_row", [False, True])
    def test_int8_quantized_matches_float(self, rng, per_row):
        from twotower_tpu.ops.topk import quantize_corpus, topk_mips_approx

        q = rng.normal(size=(17, 32)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        items = rng.normal(size=(2000, 32)).astype(np.float32)
        items /= np.linalg.norm(items, axis=1, keepdims=True)
        qc, scale = quantize_corpus(jnp.asarray(items), per_row=per_row)
        assert np.asarray(qc).dtype == np.int8
        assert scale.shape == ((2000,) if per_row else ())
        # Round-trip: dequantized rows are within half an LSB per element.
        scale_np = np.asarray(scale)
        deq = np.asarray(qc, np.float32) * (
            scale_np[:, None] if per_row else scale_np
        )
        assert np.max(np.abs(deq - items)) <= np.max(scale_np) * 0.5 + 1e-7
        ref_idx = np.argsort(-(q @ items.T), axis=1)[:, :20]
        for kwargs in ({}, {"query_chunk": 8, "item_chunk": 512}):
            vals, idx = topk_mips_approx(
                jnp.asarray(q), qc, 20, item_scale=scale, **kwargs
            )
            overlap = np.mean([
                len(set(np.asarray(idx[b]).tolist()) & set(ref_idx[b].tolist())) / 20
                for b in range(17)
            ])
            assert overlap >= 0.9
            ref_scores = np.take_along_axis(q @ items.T, np.asarray(idx), axis=1)
            np.testing.assert_allclose(np.asarray(vals), ref_scores, atol=0.02)

    def test_int8_zero_rows_and_validation(self, rng):
        from twotower_tpu.ops.topk import quantize_corpus, topk_mips_approx

        items = rng.normal(size=(100, 8)).astype(np.float32)
        items[50:] = 0.0  # e.g. layout padding rows
        qc, scale = quantize_corpus(jnp.asarray(items), per_row=True)
        assert (np.asarray(scale)[50:] == 0).all()
        assert (np.asarray(qc)[50:] == 0).all()
        q = rng.normal(size=(4, 8)).astype(np.float32)
        with pytest.raises(ValueError, match="int8"):
            topk_mips_approx(jnp.asarray(q), jnp.asarray(items), 5, item_scale=scale)
        with pytest.raises(ValueError, match="item_scale shape"):
            topk_mips_approx(jnp.asarray(q), qc, 5, item_scale=scale[:10])
        # All-zero corpus quantizes to zeros with a zero global scale.
        qz, sz = quantize_corpus(jnp.zeros((16, 8)))
        assert float(sz) == 0.0 and (np.asarray(qz) == 0).all()

    def test_num_valid_prepadded_matches(self, rng):
        from twotower_tpu.ops.topk import topk_mips, topk_mips_approx

        q = rng.normal(size=(8, 16)).astype(np.float32)
        items = rng.normal(size=(900, 16)).astype(np.float32)
        # 1024 = 4 blocks of 256 under item_chunk=256: a pre-padded corpus
        # the blocked path reshapes for free (large values in the pad rows
        # must never surface thanks to the num_valid mask).
        padded = np.full((1024, 16), 100.0, np.float32)
        padded[:900] = items
        # Build-time padding + num_valid must reproduce the unpadded search
        # on every path: approx single-shot, approx blocked, exact scan.
        for kwargs in (
            {},
            {"query_chunk": 8, "item_chunk": 256},
        ):
            v_ref, i_ref = topk_mips_approx(jnp.asarray(q), jnp.asarray(items), 10, **kwargs)
            v, i = topk_mips_approx(
                jnp.asarray(q), jnp.asarray(padded), 10, num_valid=900, **kwargs
            )
            np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), rtol=1e-5)
            np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
        v_ref, i_ref = topk_mips(jnp.asarray(q), jnp.asarray(items), 10, chunk_size=128)
        v, i = topk_mips(
            jnp.asarray(q), jnp.asarray(padded), 10, chunk_size=128, num_valid=900
        )
        np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))

    def test_num_valid_validation(self, rng):
        import pytest

        from twotower_tpu.ops.topk import topk_mips_approx

        q = jnp.zeros((2, 8))
        items = jnp.zeros((100, 8))
        with pytest.raises(ValueError):
            topk_mips_approx(q, items, 10, num_valid=200)
        with pytest.raises(ValueError):
            topk_mips_approx(q, items, 10, num_valid=5)  # k > num_valid

    def test_empty_query_batch(self):
        """b=0 must return empty results, not divide by zero (reachable from
        the serving layer before its validation was added)."""
        from twotower_tpu.ops.topk import topk_mips_approx

        v, i = topk_mips_approx(jnp.zeros((0, 8)), jnp.zeros((100, 8)), 10)
        assert v.shape == (0, 10) and i.shape == (0, 10)


class TestMixedLoss:
    def test_matches_numpy_reference(self, rng):
        """Mixed Negative Sampling golden test: [B, B+M] logits where
        in-batch columns are corrected by log q(item) and uniform columns
        by -log(num_items); accidental hits masked in both blocks."""
        from twotower_tpu.ops.losses import mixed_sampled_softmax_loss

        b, d, m, n, t = 8, 4, 6, 50, 0.1
        u = rng.normal(size=(b, d)).astype(np.float32)
        v = rng.normal(size=(b, d)).astype(np.float32)
        nv = rng.normal(size=(m, d)).astype(np.float32)
        idx = rng.integers(0, n, b).astype(np.int32)
        idx[5] = idx[1]  # duplicate positive (in-batch accidental hit)
        neg_idx = rng.integers(0, n, m).astype(np.int32)
        neg_idx[2] = idx[3]  # uniform accidental hit
        w = np.ones(b, np.float32)
        w[-1] = 0.0  # padding row
        freqs = rng.uniform(0.01, 1.0, n).astype(np.float32)
        log_q = np.log(freqs / freqs.sum())

        loss, metrics = mixed_sampled_softmax_loss(
            jnp.asarray(u), jnp.asarray(v), jnp.asarray(idx),
            jnp.asarray(nv), jnp.asarray(neg_idx),
            temperature=t, log_q=jnp.asarray(log_q), num_items=n,
            weights=jnp.asarray(w),
        )

        neg_inf = -1e9
        s = u @ v.T / t - log_q[idx][None, :]
        eye = np.eye(b, dtype=bool)
        mask = (idx[None, :] == idx[:, None]) | (w[None, :] == 0.0)
        s = np.where(mask & ~eye, neg_inf, s)
        ns = u @ nv.T / t + np.log(n)
        ns = np.where(neg_idx[None, :] == idx[:, None], neg_inf, ns)
        all_logits = np.concatenate([s, ns], axis=1)
        lse = np.log(np.exp(all_logits - all_logits.max(1, keepdims=True)).sum(1)) + all_logits.max(1)
        per = lse - np.diag(s)
        ref_loss = (per * w).sum() / w.sum()
        np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-5)
        ref_acc = ((np.diag(s) >= all_logits.max(1)) * w).sum() / w.sum()
        np.testing.assert_allclose(float(metrics["accuracy"]), ref_acc, atol=1e-6)

    def test_logq_requires_num_items(self, rng):
        from twotower_tpu.ops.losses import mixed_sampled_softmax_loss

        u = jnp.ones((2, 4)); v = jnp.ones((2, 4)); nv = jnp.ones((3, 4))
        with pytest.raises(ValueError, match="num_items"):
            mixed_sampled_softmax_loss(
                u, v, jnp.zeros(2, jnp.int32), nv, jnp.zeros(3, jnp.int32),
                log_q=jnp.zeros(10),
            )

    def test_no_correction_without_logq(self, rng):
        """log_q=None disables BOTH corrections together (the relative shift
        between blocks is what matters)."""
        from twotower_tpu.ops.losses import mixed_sampled_softmax_loss

        b, d, m = 4, 4, 8
        u = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)
        nv = jnp.asarray(rng.normal(size=(m, d)), jnp.float32)
        idx = jnp.arange(b, dtype=jnp.int32)
        nidx = jnp.arange(10, 10 + m, dtype=jnp.int32)
        l1, _ = mixed_sampled_softmax_loss(u, v, idx, nv, nidx, num_items=100)
        l2, _ = mixed_sampled_softmax_loss(u, v, idx, nv, nidx)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
