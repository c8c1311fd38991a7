"""On-device MIPS top-k over a (possibly huge) item corpus.

This replaces the reference's declared FAISS/Annoy ANN dependency
(reference: pyproject.toml:38-39, README.md:54) with an exact on-TPU
maximum-inner-product search: the corpus is streamed through the MXU in
static-shape chunks under ``lax.scan``, carrying a running per-query top-k
that is merged chunk-by-chunk. Exact (not approximate) so evaluation metrics
are bit-reproducible; at TPU matmul speeds brute force beats CPU ANN well
past 10M items. No Pallas kernel here by design: the hot ops are already
TPU-native primitives (MXU matmul, ``lax.top_k`` sort network, and
``lax.approx_max_k``'s PartialReduce custom call), so a hand-written kernel
has nothing left to fuse — the profile-first scope note in
``ops/pallas_kernels.py`` applies. Measured confirmation (v5e, 10M x 128
int8, round 3): an XLA-composed s8-matmul + per-block-max scan — the
prefilter half alone, no candidate rescore — is already SLOWER than the
full ``approx_max_k`` search at every batch size (1.9 vs 1.6 ms @ B=1,
14 vs 1.2 ms @ B=64): the PartialReduce primitive fuses the reduction
into the stream in a way composed HLO cannot, so the ANN path stays on
the hardware primitive and the exact path's two-pass prefilter
(``topk_mips_twopass``) only competes where exactness is required.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


def _pad_items(item_emb: Array, chunk_size: int) -> tuple[Array, int]:
    n = item_emb.shape[0]
    padded = -(-n // chunk_size) * chunk_size
    if padded != n:
        item_emb = jnp.pad(item_emb, ((0, padded - n), (0, 0)))
    return item_emb, n


def _blocked_layout(n: int, item_chunk: int, k: int) -> tuple[int, int]:
    """Equal-size 128-multiple item blocks covering ``n`` rows.

    ``ceil(n / item_chunk)`` blocks of ``ceil(n / num_blocks)`` rows (rounded
    up to the 128 lane width) pad by at most ``128 * num_blocks`` rows —
    versus up to ``item_chunk - 1`` for fixed-size blocks. The distinction
    is not the pad rows themselves but the copy they force: ``jnp.pad``
    inside the jit materializes a second full corpus in HBM *per call*
    (measured 12.4 -> 4.4 ms at B=1 over 10M bf16 rows on v5e when the
    reshape is free instead). A 10M corpus lands exactly on five 2,000,000
    row blocks; callers with awkward sizes can pre-pad once at build time
    to ``ann_padded_rows`` and pass ``num_valid``.
    """
    num_blocks = -(-n // item_chunk)
    per_block = -(-n // num_blocks)
    block = -(-per_block // 128) * 128
    block = max(block, -(-k // 128) * 128)
    return num_blocks, block


def ann_padded_rows(n: int, *, item_chunk: int = 1 << 21, k: int = 2048) -> int:
    """Corpus row count that makes ``topk_mips_approx`` copy-free.

    Build-time helper for resident indexes: pad the item corpus up to this
    size once (with ``num_valid=n`` masking at query time) and the blocked
    search reshapes the corpus for free instead of re-padding a multi-GB
    buffer inside the jit on every request. Corpora that fit one item block
    always take the single-shot path and need no padding. ``k`` is an upper
    bound on the ``k`` that will be served (only its 128-rounding matters).
    """
    if n <= item_chunk:
        return n
    num_blocks, block = _blocked_layout(n, item_chunk, k)
    return num_blocks * block


def exact_padded_rows(n: int, *, chunk_size: int = 131072) -> int:
    """Corpus row count that makes the exact searches copy-free at scale.

    Below ~1M rows the per-call pad copy is a few MB and not worth resident
    memory; past it the chunk-multiple pad costs up to ~12.5% extra
    resident rows right at the threshold (1,048,577 -> 1,179,648) shrinking
    to <1% at 10M — budget HBM off ``exact_padded_rows(n)``, not ``n``.
    The default matches ``topk_mips_twopass``'s chunk (the large-corpus
    exact path) — a multiple of it is also a multiple of any smaller
    power-of-two chunk ``topk_mips`` runs with.
    """
    if n < 1 << 20:
        return n
    return -(-n // chunk_size) * chunk_size


def exact_scan_chunk(batch_rows: int) -> int:
    """Corpus-stream chunk for the exact searches, given the query batch.

    Large chunks win (the per-chunk ``lax.top_k`` dominates small ones —
    docs/evaluation.md), bounded by a 2 GB ``batch_rows x chunk x 4``
    score-buffer budget and 131072 (past which the XLA compile itself
    exhausts memory at eval batch sizes). Always a POWER OF TWO in
    [8192, 131072], so it divides any 131072-aligned resident corpus
    (``exact_padded_rows``) — no per-call pad copy — and is trivially a
    two-pass block multiple. The ONE formula shared by ``Evaluator``, the
    sharded eval step, and ``topk_mips_sharded``'s auto mode.
    """
    mem_cap = (2 << 30) // (4 * max(batch_rows, 1))
    capped = min(131072, max(8192, mem_cap))
    return 1 << (capped.bit_length() - 1)


def _topk_mips_scan(
    query_emb: Array, item_emb: Array, k: int, chunk_size: int, n_real
) -> tuple[Array, Array]:
    """Exact chunked-scan core. ``n_real`` bounds the valid corpus rows and
    may be a TRACED scalar (the sharded search bounds each shard's valid
    rows dynamically — the bound only feeds a ``jnp.where`` column mask);
    columns at index >= n_real score ``-inf`` and never surface."""
    if item_emb.dtype == jnp.int8:
        raise TypeError(
            "exact MIPS is the float path; int8 corpora are searched by "
            "topk_mips_approx with item_scale= (see quantize_corpus) — "
            "casting float queries to int8 would zero every score"
        )
    n = item_emb.shape[0]
    chunk_size = min(chunk_size, -(-n // 128) * 128)
    # each scan step takes a top-k over one chunk: the chunk must hold >= k
    chunk_size = max(chunk_size, -(-k // 128) * 128)
    item_emb, _ = _pad_items(item_emb, chunk_size)
    num_chunks = item_emb.shape[0] // chunk_size
    chunks = item_emb.reshape(num_chunks, chunk_size, item_emb.shape[1])

    batch = query_emb.shape[0]
    init = (
        jnp.full((batch, k), -jnp.inf, jnp.float32),
        jnp.full((batch, k), -1, jnp.int32),
    )

    def step(carry, inp):
        top_vals, top_idx = carry
        chunk, chunk_id = inp
        # [B, C] scores on the MXU, f32 accumulation. Precision HIGHEST:
        # the TPU default truncates f32 operands to bf16 (measured ~2e-3
        # relative score error — silently ranks at bf16 fidelity) at no
        # measurable cost in the integrated scan (13.3 s per 4096-row
        # batch at 10M x 128 on v5e before AND after — the per-chunk
        # top_k dominates, not the matmul passes); "exact" search must
        # mean f32 arithmetic, not just a non-approximate algorithm.
        scores = jax.lax.dot_general(
            query_emb.astype(chunk.dtype),
            chunk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        base = chunk_id * chunk_size
        col = jax.lax.broadcasted_iota(jnp.int32, (1, chunk_size), 1) + base
        scores = jnp.where(col < n_real, scores, -jnp.inf)
        # Merge running top-k with this chunk's top-k (cheaper than sorting
        # the full concatenation when chunk_size >> k).
        c_vals, c_pos = jax.lax.top_k(scores, k)
        c_idx = c_pos.astype(jnp.int32) + base
        all_vals = jnp.concatenate([top_vals, c_vals], axis=1)
        all_idx = jnp.concatenate([top_idx, c_idx], axis=1)
        new_vals, sel = jax.lax.top_k(all_vals, k)
        new_idx = jnp.take_along_axis(all_idx, sel, axis=1)
        return (new_vals, new_idx), None

    (vals, idx), _ = jax.lax.scan(
        step, init, (chunks, jnp.arange(num_chunks, dtype=jnp.int32))
    )
    return vals, idx


@functools.partial(jax.jit, static_argnames=("k", "chunk_size", "num_valid"))
def topk_mips(
    query_emb: Array,
    item_emb: Array,
    k: int,
    *,
    chunk_size: int = 8192,
    num_valid: int | None = None,
) -> tuple[Array, Array]:
    """Exact top-k inner-product search.

    Args:
      query_emb: ``[B, D]`` queries.
      item_emb: ``[N, D]`` corpus (padded internally to a chunk multiple;
        padding rows score ``-inf`` and never surface).
      k: number of neighbours.
      chunk_size: items per scan step — bounds peak memory at
        ``B * chunk_size`` scores; keep it a multiple of 128 for MXU tiling.
      num_valid: real corpus rows when ``item_emb`` was pre-padded by the
        caller (resident serving indexes pad once at build time so no
        per-call pad copy happens here); rows at index >= num_valid are
        masked to ``-inf``.

    Returns:
      (scores ``[B, k]`` float32 descending, indices ``[B, k]`` int32).
    """
    n = item_emb.shape[0]
    n_real = n if num_valid is None else num_valid
    if not 0 < n_real <= n:
        raise ValueError(f"num_valid={num_valid} out of range for corpus size {n}")
    if k > n_real:
        raise ValueError(f"k={k} exceeds corpus size {n_real}")
    return _topk_mips_scan(query_emb, item_emb, k, chunk_size, n_real)


def _twopass_block_scan(
    query_emb: Array, item_emb: Array, k: int, chunk_size: int,
    block: int, n_real,
) -> Array:
    """Pass 1 of the two-pass exact search: running top-k BLOCK maxima.

    Streams the corpus like ``_topk_mips_scan`` but reduces each chunk's
    ``[B, C]`` scores to per-``block`` maxima before the top-k merge, so
    the expensive ``lax.top_k`` runs over ``C/block`` columns instead of
    ``C`` (measured v5e: top_k(100) over 131072 cols is 206 ms vs ~3 ms
    over 2048). Returns the global ids ``[B, k]`` of the top-k blocks.
    """
    n = item_emb.shape[0]
    num_chunks = n // chunk_size
    nb = chunk_size // block
    chunks = item_emb.reshape(num_chunks, chunk_size, item_emb.shape[1])
    batch = query_emb.shape[0]
    kb = min(k, nb)
    init = (
        jnp.full((batch, k), -jnp.inf, jnp.float32),
        jnp.full((batch, k), 0, jnp.int32),
    )

    def step(carry, inp):
        top_vals, top_idx = carry
        chunk, chunk_id = inp
        # HIGHEST precision: the prefilter's coverage proof needs pass-1
        # block maxima and the pass-2 rescore to agree at f32 fidelity
        # (and it is free at this shape — see _topk_mips_scan).
        scores = jax.lax.dot_general(
            query_emb.astype(chunk.dtype),
            chunk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        base = chunk_id * chunk_size
        col = jax.lax.broadcasted_iota(jnp.int32, (1, chunk_size), 1) + base
        scores = jnp.where(col < n_real, scores, -jnp.inf)
        bmax = scores.reshape(batch, nb, block).max(axis=2)
        c_vals, c_pos = jax.lax.top_k(bmax, kb)
        c_idx = c_pos.astype(jnp.int32) + chunk_id * nb
        all_vals = jnp.concatenate([top_vals, c_vals], axis=1)
        all_idx = jnp.concatenate([top_idx, c_idx], axis=1)
        new_vals, sel = jax.lax.top_k(all_vals, k)
        new_idx = jnp.take_along_axis(all_idx, sel, axis=1)
        return (new_vals, new_idx), None

    (_, blk_idx), _ = jax.lax.scan(
        step, init, (chunks, jnp.arange(num_chunks, dtype=jnp.int32))
    )
    return blk_idx


@functools.partial(
    jax.jit,
    static_argnames=("k", "chunk_size", "block", "num_valid", "row_slab"),
)
def topk_mips_twopass(
    query_emb: Array,
    item_emb: Array,
    k: int,
    *,
    chunk_size: int = 131072,
    block: int = 64,
    num_valid: int | None = None,
    row_slab: int = 256,
) -> tuple[Array, Array]:
    """Exact top-k MIPS via block-maxima prefilter + candidate rescore.

    The plain exact scan (``topk_mips``) is dominated by per-chunk
    ``lax.top_k`` over the full score width. This computes the same result
    in two corpus-bounded passes:

    1. stream the corpus once keeping the top-k **blocks** of ``block``
       contiguous rows by block-maximum (cheap reduction + small top-k);
    2. gather ONLY those ``k x block`` candidate rows per query (contiguous
       ``block``-row segments, so the gather streams efficiently), rescore,
       and take the exact top-k.

    Correctness: the true top-k elements occupy at most ``k`` distinct
    blocks, and any block containing one has max >= the k-th score — so at
    most ``k`` blocks have max >= tau and the top-k blocks by maximum cover
    every top-k element. Two caveats vs ``topk_mips``: ties exactly at the
    k-th score may resolve to a different (equally-scored) index set, and
    the rescore is a batched matvec rather than the scan's [B, C] matmul,
    so scores can differ in the LAST ULP (measured <= 4e-7 relative) —
    rank flips only between items that close, far below metric run
    variance. Each implementation is individually deterministic.

    Measured v5e, 10M x 128 f32, B=4096, k=100: 3.0 s vs 13.3 s for the
    plain scan at its tuned chunk (docs/evaluation.md). Use for large
    corpora; small ones (fewer than ``4k`` blocks) fall back internally.
    """
    n = item_emb.shape[0]
    n_real = n if num_valid is None else num_valid
    if not 0 < n_real <= n:
        raise ValueError(f"num_valid={num_valid} out of range for corpus size {n}")
    if k > n_real:
        raise ValueError(f"k={k} exceeds corpus size {n_real}")
    if block > chunk_size:
        raise ValueError(f"block={block} exceeds chunk_size={chunk_size}")
    # Round down to a block multiple (the pass-1 reshape needs it; callers
    # tuning the chunk for memory shouldn't have to know the block).
    chunk_size = chunk_size // block * block
    # Small corpora: the prefilter needs comfortably more blocks than k to
    # pay for its second pass; the plain scan is already fast there.
    if n_real <= 4 * k * block:
        return _topk_mips_scan(query_emb, item_emb, k, chunk_size, n_real)
    return _twopass_core(
        query_emb, item_emb, k, chunk_size, block, row_slab, n_real
    )


def _twopass_core(
    query_emb: Array, item_emb: Array, k: int, chunk_size: int,
    block: int, row_slab: int, n_real,
) -> tuple[Array, Array]:
    """Two-pass body; ``n_real`` may be a TRACED scalar (the sharded
    search bounds each shard's valid rows dynamically) — it only feeds
    ``jnp.where`` masks, never Python control flow."""
    item_emb, _ = _pad_items(item_emb, chunk_size)
    padded = item_emb.shape[0]
    blk_idx = _twopass_block_scan(
        query_emb, item_emb, k, chunk_size, block, n_real
    )

    batch, d = query_emb.shape
    # When fewer than k blocks have finite maxima (a traced n_real much
    # smaller than the static corpus — e.g. a mostly-padding shard in the
    # sharded search), top_k fills the remaining slots from -inf entries
    # whose block ids can REPEAT (the scan's init ids overlap chunk 0's).
    # A repeated block would rescore its valid rows twice and return
    # duplicate item ids, so mask every slot whose block id already
    # appeared earlier in the row. All VALID candidates survive: finite-max
    # blocks are distinct by construction (each global block id enters the
    # merge exactly once).
    dup = jnp.tril(
        blk_idx[:, :, None] == blk_idx[:, None, :], k=-1
    ).any(axis=2)  # [B, k]: slot equals some earlier slot
    kl = k * block
    cand = (
        blk_idx[:, :, None] * block
        + jnp.arange(block, dtype=jnp.int32)[None, None, :]
    ).reshape(batch, kl)
    cand = jnp.minimum(cand, padded - 1)
    slot_ok = jnp.repeat(~dup, block, axis=1)  # [B, kl]

    # Rescore in row slabs so the gathered [slab, k*block, D] candidate
    # tensor stays bounded (~`row_slab * kl * D * 4` bytes).
    slab = max(1, min(row_slab, batch))
    pad_rows = (-batch) % slab
    if pad_rows:
        query_emb = jnp.pad(query_emb, ((0, pad_rows), (0, 0)))
        cand = jnp.pad(cand, ((0, pad_rows), (0, 0)))
        slot_ok = jnp.pad(slot_ok, ((0, pad_rows), (0, 0)))
    num_slabs = query_emb.shape[0] // slab

    def rescore(args):
        q_s, c_s, ok_s = args
        vecs = item_emb[c_s]  # [slab, kl, D] — contiguous block segments
        # Same cast direction as the scan path: queries meet the corpus in
        # the CORPUS dtype with f32 MXU accumulation, so a bf16 corpus
        # scores bit-identically to topk_mips.
        sc = jnp.einsum(
            "rkd,rd->rk",
            vecs,
            q_s.astype(vecs.dtype),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        sc = jnp.where(ok_s & (c_s < n_real), sc, -jnp.inf)
        v, p = jax.lax.top_k(sc, k)
        return v, jnp.take_along_axis(c_s, p, axis=1).astype(jnp.int32)

    vals, idx = jax.lax.map(
        rescore,
        (
            query_emb.reshape(num_slabs, slab, d),
            cand.reshape(num_slabs, slab, kl),
            slot_ok.reshape(num_slabs, slab, kl),
        ),
    )
    vals = vals.reshape(num_slabs * slab, k)[:batch]
    idx = idx.reshape(num_slabs * slab, k)[:batch]
    return vals, idx


def quantize_corpus(item_emb: Array, *, per_row: bool = False) -> tuple[Array, Array]:
    """Symmetric int8 quantization of a corpus matrix.

    Returns ``(q [N, D] int8, scale)`` with ``q * scale ~= item_emb``.
    Used by the serving index for ``serving.corpus_dtype="int8"`` /
    ``"int8_rowscale"``: at 10M items the corpus HBM stream — the dominant
    large-catalog search cost — halves again vs bfloat16 and the score
    matmul runs as native s8 x s8 on the MXU.

    ``per_row=False`` (default): ONE scalar f32 scale for the whole
    corpus. Raw s32 scores are then monotonic in the true scores per
    query row, so the search applies the scale only to the final ``[B,k]``
    values — no per-score epilogue pass. Measured v5e, 10M x 128 corpus:
    4.2 ms @ B=256 vs 6.0 ms bf16, recall@100 0.971 vs exact f32.

    ``per_row=True``: f32 scale per row (``[N]``) — tighter quantization
    (recall@100 0.979) but per-item scales must multiply the full score
    matrix before top-k, an extra HBM pass XLA cannot fuse into the
    ``approx_max_k`` custom call (6.9 ms @ B=256; fastest option at B=1).
    Rows that are all zero (e.g. layout padding) get scale 0.
    """
    item_emb = item_emb.astype(jnp.float32)
    if per_row:
        absmax = jnp.max(jnp.abs(item_emb), axis=1)
        scale = absmax / 127.0
        inv = jnp.where(scale > 0, 1.0 / jnp.maximum(scale, 1e-30), 0.0)
        q = jnp.clip(jnp.round(item_emb * inv[:, None]), -127, 127)
        return q.astype(jnp.int8), scale
    scale = jnp.max(jnp.abs(item_emb)) / 127.0
    inv = jnp.where(scale > 0, 1.0 / jnp.maximum(scale, 1e-30), 0.0)
    q = jnp.clip(jnp.round(item_emb * inv), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _quantize_queries(query_emb: Array) -> tuple[Array, Array]:
    """Per-row dynamic int8 quantization of the query block (same scheme)."""
    q = query_emb.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(q), axis=1)
    scale = absmax / 127.0
    inv = jnp.where(scale > 0, 1.0 / jnp.maximum(scale, 1e-30), 0.0)
    qi = jnp.clip(jnp.round(q * inv[:, None]), -127, 127).astype(jnp.int8)
    return qi, scale


@functools.partial(
    jax.jit,
    static_argnames=("k", "recall_target", "query_chunk", "item_chunk", "num_valid"),
)
def topk_mips_approx(
    query_emb: Array,
    item_emb: Array,
    k: int,
    *,
    recall_target: float = 0.95,
    query_chunk: int = 256,
    item_chunk: int = 1 << 21,
    num_valid: int | None = None,
    item_scale: Array | None = None,
) -> tuple[Array, Array]:
    """Approximate top-k via the TPU PartialReduce primitive
    (``lax.approx_max_k``) — the serving-path ANN equivalent of the
    reference's FAISS/Annoy plan (reference: pyproject.toml:38-39), ~300x
    faster than the exact scan at 500k items (measured on v5e with hard-sync
    slope timing: 0.37 ms @ B=1, 0.45 ms @ B=256 vs 134 ms exact @ B=256;
    0.98 recall@100 at recall_target=0.95).

    Memory is bounded on both axes: ``query_chunk x item_chunk`` f32 score
    scratch is the ceiling. Small query batches run the whole corpus in ONE
    ``approx_max_k`` under the same budget (no block merge); larger batches
    scan equal-size item blocks (``_blocked_layout`` — sized so a round
    corpus reshapes for free rather than materializing a padded copy every
    call) whose per-block approx top-ks are exactly merged.

    The corpus may be stored bfloat16 (``serving.corpus_dtype``): queries
    are cast to the corpus dtype and scores accumulate in f32 on the MXU.
    At 10M items this halves the HBM stream — the dominant cost (measured
    recall@100 cost < 0.01; see docs/serving.md for the v5e latency table).

    ``num_valid``: real corpus rows when the caller pre-padded ``item_emb``
    (see ``ann_padded_rows``); padding rows are masked to ``-inf``.

    ``item_scale``: f32 dequantization scale(s) for an int8 corpus (from
    ``quantize_corpus``). When given, queries are dynamically quantized
    per row and scores run as a native s8 x s8 -> s32 MXU matmul (2x bf16
    throughput, half the HBM stream). A scalar scale (global quantization)
    is applied only to the final ``[B, k]`` values — raw scores are
    already monotonic per query row; a ``[N]`` scale (per-row) multiplies
    the score matrix before top-k.
    """
    n = item_emb.shape[0]
    n_valid = n if num_valid is None else num_valid
    if not 0 < n_valid <= n:
        raise ValueError(f"num_valid={num_valid} out of range for corpus size {n}")
    if k > n_valid:
        raise ValueError(f"k={k} exceeds corpus size {n_valid}")
    if item_scale is not None:
        if item_emb.dtype != jnp.int8:
            raise ValueError("item_scale given but item_emb is not int8")
        if item_scale.shape not in ((), (n,)):
            raise ValueError(
                f"item_scale shape {item_scale.shape} must be () or ({n},)"
            )
    # (int8 corpus without item_scale is rejected inside the impl, which the
    # sharded path also calls directly — one copy of that check.)
    return _topk_mips_approx_impl(
        query_emb,
        item_emb,
        k,
        recall_target=recall_target,
        query_chunk=query_chunk,
        item_chunk=item_chunk,
        n_valid=n_valid,
        mask_pad=n_valid != n,
        item_scale=item_scale,
    )


def _topk_mips_approx_impl(
    query_emb: Array,
    item_emb: Array,
    k: int,
    *,
    recall_target: float,
    query_chunk: int,
    item_chunk: int,
    n_valid,
    mask_pad: bool,
    item_scale: Array | None,
) -> tuple[Array, Array]:
    """ANN search core. ``n_valid`` bounds the valid corpus rows and may be
    a TRACED scalar (the sharded search bounds each shard's valid rows
    dynamically); ``mask_pad`` statically gates the single-shot branch's
    column mask (the blocked branch always masks — it needs the bound for
    its own layout padding anyway)."""
    n = item_emb.shape[0]
    quantized = item_scale is not None
    if not quantized and item_emb.dtype == jnp.int8:
        raise ValueError(
            "int8 corpus requires item_scale= (from quantize_corpus) — "
            "casting float queries to int8 would zero every score"
        )
    per_row_scale = quantized and item_scale.ndim == 1
    b = query_emb.shape[0]
    if b == 0:  # empty query batch — nothing to search (shape is static)
        return jnp.zeros((0, k), jnp.float32), jnp.zeros((0, k), jnp.int32)
    if quantized:
        query_emb, query_scale = _quantize_queries(query_emb)
    else:
        query_scale = jnp.zeros((b,), jnp.float32)  # unused placeholder
    chunk = min(query_chunk, b)
    padded_b = -(-b // chunk) * chunk
    if padded_b != b:
        query_emb = jnp.pad(query_emb, ((0, padded_b - b), (0, 0)))
        query_scale = jnp.pad(query_scale, (0, padded_b - b))
    q_blocks = query_emb.reshape(padded_b // chunk, chunk, query_emb.shape[1])
    qs_blocks = query_scale.reshape(padded_b // chunk, chunk)

    def scores_for(q, items, q_scale=None, i_scale=None):
        if quantized:
            s = jax.lax.dot_general(
                q,
                items,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            if per_row_scale:
                # Per-item scales change the ranking: apply before top-k.
                # (Query scales are per ROW, hence monotonic — deferred.)
                s = s * i_scale[None, :]
            return s
        return jax.lax.dot_general(
            q.astype(items.dtype),
            items,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def mask_cols(s, base, width):
        col = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1) + base
        return jnp.where(col < n_valid, s, -jnp.inf)

    if n * chunk <= query_chunk * item_chunk:
        # Whole corpus in one PartialReduce under the same scratch budget
        # a full query block would use — no merge, no per-call pad.

        def block(q_and_scale):
            q, qs = q_and_scale
            s = scores_for(q, item_emb, qs, item_scale)
            if mask_pad:
                s = mask_cols(s, 0, n)
            v, i = jax.lax.approx_max_k(s, k, recall_target=recall_target)
            return v, i.astype(jnp.int32)

    else:
        # Item-blocked: approx top-k per corpus block, exact merge across
        # blocks (the global top-k is contained in the union of block
        # top-ks up to each block's recall target).
        num_blocks, block_rows = _blocked_layout(n, item_chunk, k)
        padded_n = num_blocks * block_rows
        items_padded = (
            jnp.pad(item_emb, ((0, padded_n - n), (0, 0))) if padded_n != n else item_emb
        )
        item_blocks = items_padded.reshape(num_blocks, block_rows, item_emb.shape[1])
        if per_row_scale:
            scale_padded = (
                jnp.pad(item_scale, (0, padded_n - n)) if padded_n != n else item_scale
            )
            scale_blocks = scale_padded.reshape(num_blocks, block_rows)
        else:
            scale_blocks = jnp.zeros((num_blocks, 1), jnp.float32)  # unused

        def block(q_and_scale):
            q, qs = q_and_scale

            def step(carry, inp):
                best_v, best_i = carry
                items, iscale, blk = inp
                s = scores_for(q, items, qs, iscale)
                base = blk * block_rows
                s = mask_cols(s, base, block_rows)
                v, i = jax.lax.approx_max_k(s, k, recall_target=recall_target)
                i = i.astype(jnp.int32) + base
                all_v = jnp.concatenate([best_v, v], axis=1)
                all_i = jnp.concatenate([best_i, i], axis=1)
                nv, sel = jax.lax.top_k(all_v, k)
                return (nv, jnp.take_along_axis(all_i, sel, axis=1)), None

            init = (
                jnp.full((chunk, k), -jnp.inf, jnp.float32),
                jnp.full((chunk, k), -1, jnp.int32),
            )
            (v, i), _ = jax.lax.scan(
                step,
                init,
                (item_blocks, scale_blocks, jnp.arange(num_blocks, dtype=jnp.int32)),
            )
            return v, i

    vals, idx = jax.lax.map(block, (q_blocks, qs_blocks))
    vals = vals.reshape(padded_b, k)[:b]
    idx = idx.reshape(padded_b, k)[:b].astype(jnp.int32)
    if quantized:
        # Deferred monotonic scales: per-query-row dynamic scale, plus the
        # global corpus scale when quantization is per-tensor.
        row_scale = query_scale[:b, None]
        if not per_row_scale:
            row_scale = row_scale * item_scale
        vals = vals * row_scale
    return vals, idx


def topk_mips_sharded(
    query_emb: Array,
    item_emb_shard: Array,
    k: int,
    *,
    axis_name: str,
    chunk_size: int | None = None,
    num_items: int | None = None,
) -> tuple[Array, Array]:
    """Cross-shard exact top-k for a corpus row-sharded over ``axis_name``.

    Runs inside ``shard_map``: each device computes local top-k over its
    corpus shard (local indices offset to global ids), then the per-shard
    candidates are all-gathered along the model axis and merged — exact
    because the global top-k is contained in the union of per-shard top-ks.

    ``num_items``: real (unpadded) corpus size — rows at global index >=
    num_items are shard padding and get masked to ``-inf`` INSIDE the local
    search (each shard bounds its own valid rows dynamically), so zero-
    filled pad rows can never displace real negative-scoring candidates
    from a shard's local top-k (equal shards require padding whenever S
    does not divide N).
    """
    shard_id = jax.lax.axis_index(axis_name)
    num_shards = jax.lax.axis_size(axis_name)
    rows = item_emb_shard.shape[0]
    offset = shard_id * rows
    # k may exceed one shard's row count (small catalogs over many shards):
    # each shard contributes its top-min(k, rows) — the union still
    # contains the global top-k (k <= num_items <= shards * rows).
    local_k = min(k, rows)
    valid_local = (
        jnp.clip(num_items - offset, 0, rows) if num_items is not None else rows
    )
    # Auto chunk (the shared exact_scan_chunk formula) unless the caller
    # passed an explicit memory budget — which is then respected exactly.
    if chunk_size is None:
        chunk_size = exact_scan_chunk(query_emb.shape[0])
    # Large shards take the two-pass exact path (block-maxima prefilter +
    # candidate rescore — the same 5-8x win the single-device search
    # measured; the shard row count is STATIC so the dispatch is too, and
    # the traced valid bound only feeds masks inside the core, where
    # mostly-padding shards — even valid_local < k*block — are handled by
    # the duplicate-block mask).
    block = 64
    if rows > 4 * local_k * block and chunk_size >= block:
        local_vals, local_idx = _twopass_core(
            query_emb, item_emb_shard, local_k,
            chunk_size // block * block, block, 256, valid_local,
        )
    else:
        local_vals, local_idx = _topk_mips_scan(
            query_emb, item_emb_shard, local_k, chunk_size, valid_local
        )
    # Pad-slot candidates (always -inf-valued) clamp into the shard's own
    # id range so they can never alias another shard's rows after offset —
    # clip BOTH ends: the plain-scan path's never-filled init slots carry
    # idx -1, which minimum() alone would send to the previous shard's last
    # row.
    local_idx = jnp.clip(local_idx, 0, rows - 1) + offset
    if num_items is not None:
        # Belt over the in-search mask: -inf anything pointing past the real
        # corpus (pad-slot indices from all--inf shards are arbitrary).
        pad = local_idx >= num_items
        local_vals = jnp.where(pad, -jnp.inf, local_vals)
    # [S, B, local_k] along the model axis — rides ICI.
    all_vals = jax.lax.all_gather(local_vals, axis_name)
    all_idx = jax.lax.all_gather(local_idx, axis_name)
    b = query_emb.shape[0]
    all_vals = jnp.moveaxis(all_vals, 0, 1).reshape(b, num_shards * local_k)
    all_idx = jnp.moveaxis(all_idx, 0, 1).reshape(b, num_shards * local_k)
    vals, sel = jax.lax.top_k(all_vals, k)
    idx = jnp.take_along_axis(all_idx, sel, axis=1)
    return vals, idx


def topk_mips_approx_sharded(
    query_emb: Array,
    item_emb_shard: Array,
    k: int,
    *,
    axis_name: str,
    recall_target: float = 0.95,
    query_chunk: int = 256,
    item_chunk: int = 1 << 21,
    num_items: int | None = None,
    item_scale_shard: Array | None = None,
) -> tuple[Array, Array]:
    """Cross-shard ANN top-k: the serving search for a row-sharded corpus.

    The multi-chip counterpart of ``topk_mips_approx`` for catalogs sharded
    over ``axis_name`` (BASELINE configs 4-5: 10M+ items spread over the
    model axis). Runs inside ``shard_map``: each device searches its local
    shard with ``approx_max_k`` (int8-quantized shards supported via
    ``item_scale_shard`` — per-row ``[rows]`` slices or the replicated
    scalar global scale), local candidates are offset to global ids and
    all-gathered along ``axis_name`` (k*S rows per query ride ICI, never
    the corpus), and the union is merged with an exact ``top_k`` — so the
    only approximation is each shard's own recall target, exactly like the
    single-device path's per-block approximation.

    ``num_items``: real (unpadded) global corpus size. Shard-padding rows
    (global index >= num_items) are masked to ``-inf`` INSIDE the local
    search — each shard passes its dynamic valid-row bound down to the
    score mask, so pad rows can neither outrank real items nor displace
    negative-scoring candidates, and no per-request pass over the resident
    shard is ever made (the column mask fuses into the score epilogue;
    the shard itself is streamed exactly once).
    """
    shard_id = jax.lax.axis_index(axis_name)
    num_shards = jax.lax.axis_size(axis_name)
    rows = item_emb_shard.shape[0]
    offset = shard_id * rows
    # k may exceed one shard's row count (small catalogs over many shards):
    # each shard contributes its top-min(k, rows); the union still contains
    # the global top-k.
    local_k = min(k, rows)
    valid_local = (
        jnp.clip(num_items - offset, 0, rows) if num_items is not None else rows
    )
    local_vals, local_idx = _topk_mips_approx_impl(
        query_emb,
        item_emb_shard,
        local_k,
        recall_target=recall_target,
        query_chunk=query_chunk,
        item_chunk=item_chunk,
        n_valid=valid_local,
        mask_pad=num_items is not None,
        item_scale=item_scale_shard,
    )
    local_idx = local_idx + offset
    if num_items is not None:
        # Belt over the in-search mask: -inf anything pointing past the real
        # corpus (pad-slot indices from all--inf shards are arbitrary).
        pad = local_idx >= num_items
        local_vals = jnp.where(pad, -jnp.inf, local_vals)
    all_vals = jax.lax.all_gather(local_vals, axis_name)
    all_idx = jax.lax.all_gather(local_idx, axis_name)
    b = query_emb.shape[0]
    all_vals = jnp.moveaxis(all_vals, 0, 1).reshape(b, num_shards * local_k)
    all_idx = jnp.moveaxis(all_idx, 0, 1).reshape(b, num_shards * local_k)
    vals, sel = jax.lax.top_k(all_vals, k)
    idx = jnp.take_along_axis(all_idx, sel, axis=1)
    return vals, idx
