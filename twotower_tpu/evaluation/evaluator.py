"""Full-corpus retrieval evaluator.

Realizes the reference's declared ``evaluate-model`` capability (reference:
pyproject.toml:69, configs/data_config.yaml:71) the TPU way: encode the whole
item corpus through the candidate tower once per evaluation (chunked, on
device), then stream user batches through a jitted query-tower -> exact MIPS
top-k -> metrics pipeline. Exact brute-force scoring (not ANN), so metrics
are deterministic and reproducible — the analog of TFRS FactorizedTopK.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from twotower_tpu.config import Config
from twotower_tpu.evaluation.metrics import merge_metric_sums, metrics_at_k
from twotower_tpu.logging_utils import get_logger
from twotower_tpu.models import two_tower
from twotower_tpu.ops.topk import topk_mips_approx, topk_mips_twopass

logger = get_logger(__name__)

Array = jax.Array


class Evaluator:
    """Recall@K / NDCG@K over the full item corpus."""

    @staticmethod
    def auto_chunk_size(num_items: int, batch_size: int) -> int:
        """Corpus-stream chunk for the exact search.

        The exact path is ``ops.topk.topk_mips_twopass`` (block-maxima
        prefilter + candidate rescore — 1.9 s per 4096-row batch at
        10M x 128 on v5e vs 42.6 s for the round-2 fixed-8192-chunk scan,
        22x); its pass-1 wants the largest chunk the score buffer allows
        (fewer scan steps). Delegates to ``ops.topk.exact_scan_chunk``
        (power-of-two, 2 GB score budget, 131072 cap) — then CLAMPS to the
        corpus size (rounded up to the 64-row two-pass block): a 1k-item
        corpus must not be pre-padded to a 131072-row chunk, which would
        stream ~131x more rows per eval batch than the corpus holds.
        """
        from twotower_tpu.ops.topk import exact_scan_chunk

        chunk = exact_scan_chunk(batch_size)
        if num_items < chunk:
            chunk = max(64, -(-num_items // 64) * 64)
        return chunk

    def __init__(
        self,
        config: Config,
        num_items: int,
        *,
        batch_size: int = 4096,
        corpus_chunk_size: int | None = None,
        item_tokens=None,
        mesh=None,
    ):
        """``mesh``: a multi-device mesh switches evaluation to the sharded
        path — the encoded corpus stays row-sharded ``P(model, None)`` and
        queries split over ``data`` (``parallel.spmd.make_sharded_eval_step``)
        instead of replicating the corpus per device. Under multi-controller
        runs every process passes the SAME full val arrays; each contributes
        its addressable batch rows and the psummed metrics come back
        identical everywhere (early stopping agrees by construction)."""
        self.config = config
        self.num_items = num_items
        tokens = jnp.asarray(item_tokens) if item_tokens is not None else None
        self.ks = tuple(sorted(config.retrieval.top_k_eval))
        self.max_k = min(max(self.ks), num_items)
        self.batch_size = batch_size
        # Explicit chunks round down to the two-pass block multiple so the
        # corpus pre-pad below matches the search's internal rounding (a
        # mismatch would mean a full pad copy per batch).
        self.corpus_chunk_size = (
            max(64, corpus_chunk_size // 64 * 64)
            if corpus_chunk_size is not None
            else self.auto_chunk_size(num_items, batch_size)
        )
        self.mesh = mesh if (mesh is not None and mesh.devices.size > 1) else None
        self._span_rows = None
        if self.mesh is not None:
            from twotower_tpu.parallel.spmd import make_sharded_eval_step
            from twotower_tpu.parallel.sharding import batch_shardings

            self._sharded_encode, self._sharded_evalb = make_sharded_eval_step(
                config, self.mesh, num_items, self.max_k, item_tokens=item_tokens
            )
            self._batch_sharding = batch_shardings(self.mesh, config.mesh)
            if jax.process_count() > 1:
                from twotower_tpu.data.pipeline import span_row_indices
                from twotower_tpu.parallel.sharding import process_row_spans

                self._span_rows = span_row_indices(
                    process_row_spans(self._batch_sharding, batch_size),
                    batch_size,
                )

        mcfg = config.model
        exact = config.retrieval.eval_exact
        # Exact mode: encode pads the corpus to the search chunk multiple
        # ONCE (fused into the encode program) so the per-batch search
        # never makes a 5 GB pad copy of a 10M-row corpus inside the jit;
        # padding rows are masked via num_valid. Approx mode keeps the raw
        # row count — approx_max_k's blocked layout prefers it (a round
        # corpus reshapes for free; see ops.topk._blocked_layout).
        corpus_rows = (
            -(-num_items // self.corpus_chunk_size) * self.corpus_chunk_size
            if exact
            else num_items
        )

        # bf16 validation residency (retrieval.eval_corpus_dtype): halves
        # the eval corpus HBM; config validation restricts it to approx
        # mode (the exact path promises f32 scores).
        corpus_dtype = config.retrieval.eval_corpus_jnp_dtype()

        @jax.jit
        def _encode_corpus(params) -> Array:
            emb = two_tower.embed_item_table(
                params, mcfg, num_items, item_tokens=tokens
            ).astype(corpus_dtype)
            return jnp.pad(emb, ((0, corpus_rows - num_items), (0, 0)))

        def _batch_metrics(params, corpus, user_idx, true_item, weight, max_k: int):
            user_emb = two_tower.embed_users(params, user_idx, mcfg, train=False)
            if exact:
                _, topk_idx = topk_mips_twopass(
                    user_emb, corpus, max_k,
                    chunk_size=self.corpus_chunk_size, num_valid=num_items,
                )
            else:
                # approx_max_k validation path (retrieval.eval_exact=false):
                # ~100x faster at large corpora; final test runs should stay
                # exact for metric fidelity.
                _, topk_idx = topk_mips_approx(
                    user_emb, corpus, max_k, num_valid=num_items
                )
            ks = tuple(k for k in self.ks if k <= max_k) or (max_k,)
            return metrics_at_k(topk_idx, true_item, ks, weights=weight)

        @functools.partial(jax.jit, static_argnames=("max_k",))
        def _eval_batch(params, corpus, user_idx, true_item, weight, max_k: int):
            return _batch_metrics(params, corpus, user_idx, true_item, weight, max_k)

        @functools.partial(jax.jit, static_argnames=("max_k",))
        def _eval_scan(params, corpus, u, it, w, max_k: int):
            """Whole-split evaluation as ONE device program.

            The per-batch host loop costs ~0.44 s/batch of pure transport on
            the axon tunnel (3 device_puts + a sync device_get per 4096-row
            batch) while the approx search itself is 9.9 ms/batch at
            10M x 128 (measured round 4, slope method) — a 44x overhead. A
            ``lax.scan`` over pre-staged ``[nb, bs]`` index arrays keeps the
            whole validation on device with a single scalar-tree fetch at
            the end, the TPU-native shape for this loop.
            """

            def body(carry, batch):
                bu, bi, bw = batch
                m = _batch_metrics(params, corpus, bu, bi, bw, max_k)
                # metrics_at_k returns weighted MEANS over max(sum(w),1);
                # multiplying back by sum(w) recovers exact sums (padding
                # batches have sum(w)==0 and contribute nothing).
                wsum = bw.sum()
                sums, tot = carry
                return ({k: sums[k] + m[k] * wsum for k in sums}, tot + wsum), None

            ks = tuple(k for k in self.ks if k <= max_k) or (max_k,)
            keys = (
                [f"recall@{k}" for k in ks]
                + [f"ndcg@{k}" for k in ks]
                + ["mrr"]
            )
            init = ({k: jnp.float32(0) for k in keys}, jnp.float32(0))
            (sums, total), _ = jax.lax.scan(body, init, (u, it, w))
            return sums, total

        self._encode_corpus = _encode_corpus
        self._eval_batch = _eval_batch
        self._eval_scan = _eval_scan
        # None = untried; False = scan disabled (retrieval.eval_device_scan
        # false, or a compile failure — giant exact score buffers can OOM
        # the compiler when nested in the outer scan) -> per-batch loop.
        self._scan_ok: bool | None = (
            None if config.retrieval.eval_device_scan else False
        )
        self._scan_budget_s = float(config.retrieval.eval_scan_budget_s)

    @staticmethod
    def plan_segments(
        nb: int, per_batch_s: float, budget_s: float, probe: int
    ) -> tuple[int, int]:
        """Size the post-probe scan segments: ``(segment_len, n_segments)``
        covering the ``nb - probe`` remaining batches with per-program
        runtime ~<= ``budget_s`` (the tunneled worker kills any single
        program past 60 s — see retrieval.eval_scan_budget_s). Segments are
        sized EVENLY (ceil(rem / ceil(rem/S_max))) so one compiled shape
        covers them all with under one batch of zero-weight padding each."""
        rem = nb - probe
        if rem <= 0:
            return 0, 0
        s_max = max(probe, int(budget_s / max(per_batch_s, 1e-9)))
        s_max = min(s_max, rem)
        n_seg = -(-rem // s_max)
        s_even = -(-rem // n_seg)
        return s_even, n_seg

    def _run_scan_segmented(self, params, corpus, u, it, w) -> dict[str, float]:
        """Run the device-resident scan in TIME-BUDGETED segments.

        One monolithic whole-split program is killed by the tunneled
        worker's 60 s single-program execution watchdog (root-caused round
        5, benchmarks/eval_scan_probe.py: a trivial fori_loop dies at
        60.0 s too — shape/memory-independent). Strategy: run two
        fixed-size probe segments (the second, compile-free one measures
        per-batch seconds), then cover the rest with evenly-sized segments
        predicted to stay under ``retrieval.eval_scan_budget_s``. Two
        compiled shapes total; per-segment host sync costs ~0.5 s on the
        tunnel vs ~0.44 s/batch for the per-batch loop — the scan's
        dispatch win survives segmentation."""
        import time as _time

        nb = u.shape[0]
        sums_acc: dict[str, float] = {}
        total_acc = 0.0

        def run(lo: int, hi: int, shape: int) -> float:
            """Scan batches [lo, hi), zero-weight-padded to ``shape``;
            returns wall seconds (device_get is the hard sync)."""
            su, si, sw = u[lo:hi], it[lo:hi], w[lo:hi]
            pad = shape - (hi - lo)
            if pad:
                bs = u.shape[1]
                su = np.concatenate([su, np.zeros((pad, bs), np.int32)])
                si = np.concatenate([si, np.zeros((pad, bs), np.int32)])
                sw = np.concatenate([sw, np.zeros((pad, bs), np.float32)])
            t0 = _time.perf_counter()
            sums, tot = self._eval_scan(
                params, corpus,
                jnp.asarray(su), jnp.asarray(si), jnp.asarray(sw),
                self.max_k,
            )
            sums = jax.device_get(sums)
            nonlocal total_acc
            for k, v in sums.items():
                sums_acc[k] = sums_acc.get(k, 0.0) + float(v)
            total_acc += float(tot)
            return _time.perf_counter() - t0

        budget = self._scan_budget_s
        if budget <= 0 or nb <= 8:
            run(0, nb, nb)
        else:
            probe = 4
            run(0, probe, probe)  # compile + exec
            t_exec = run(probe, 2 * probe, probe)  # exec only
            per_batch = max(t_exec / probe, 1e-9)
            s_even, n_seg = self.plan_segments(
                nb, per_batch, budget, 2 * probe
            )
            if n_seg:
                logger.info(
                    "eval scan: %d batches in %d segments of %d "
                    "(~%.1f s/segment under the %.0f s program budget)",
                    nb, n_seg + 2, s_even, s_even * per_batch, budget,
                )
            pos = 2 * probe
            for _ in range(n_seg):
                hi = min(pos + s_even, nb)
                run(pos, hi, s_even)
                pos = hi
        denom = max(total_acc, 1e-12)
        return {k: v / denom for k, v in sums_acc.items()}

    def _put_batch(self, arr: np.ndarray):
        """Host batch array -> sharded device array. Multi-controller: each
        process supplies only its addressable rows of the (identical) global
        batch; the runtime assembles the sharded array."""
        if self._span_rows is not None:
            return jax.make_array_from_process_local_data(
                self._batch_sharding, arr[self._span_rows], arr.shape
            )
        return jax.device_put(arr, self._batch_sharding)

    def _pack_batches(self, user_idx: np.ndarray, item_idx: np.ndarray):
        """Pad + reshape an eval split to ``[nb, batch_size]`` scan operands
        (padding rows carry weight 0)."""
        n = len(user_idx)
        bs = self.batch_size
        nb = max(1, -(-n // bs))
        u = np.zeros(nb * bs, np.int32)
        it = np.zeros(nb * bs, np.int32)
        w = np.zeros(nb * bs, np.float32)
        u[:n] = user_idx
        it[:n] = item_idx
        w[:n] = 1.0
        return u.reshape(nb, bs), it.reshape(nb, bs), w.reshape(nb, bs)

    def evaluate(
        self,
        params,
        user_idx: np.ndarray,
        item_idx: np.ndarray,
    ) -> dict[str, float]:
        """Single-positive protocol: for each (user, held-out item) row, rank
        the full corpus for the user and score where the item lands.

        Single-device: the whole split runs as one jitted ``lax.scan`` with a
        single metrics fetch (see ``_eval_scan``). Mesh-sharded: per-batch
        dispatch (multi-controller batches are assembled per process via
        ``make_array_from_process_local_data``; metrics psum inside the step).
        """
        sharded = self.mesh is not None
        corpus = (
            self._sharded_encode(params) if sharded else self._encode_corpus(params)
        )
        if not sharded and self._scan_ok is not False:
            u, it, w = self._pack_batches(user_idx, item_idx)
            try:
                out = self._run_scan_segmented(params, corpus, u, it, w)
                self._scan_ok = True
            except Exception:
                if self._scan_ok:  # worked before: a real runtime error
                    raise
                logger.warning(
                    "device-resident eval scan failed to compile; falling "
                    "back to the per-batch loop", exc_info=True,
                )
                self._scan_ok = False
            else:
                logger.info(
                    "evaluated %d rows over %d items: %s",
                    len(user_idx), self.num_items,
                    {k: round(v, 4) for k, v in sorted(out.items())},
                )
                return out
        n = len(user_idx)
        bs = self.batch_size
        batch_metrics = []
        batch_weights = []
        for start in range(0, n, bs):
            u = np.asarray(user_idx[start : start + bs], np.int32)
            it = np.asarray(item_idx[start : start + bs], np.int32)
            real = len(u)
            if real < bs:  # pad to static shape; padding rows weight 0
                pad = bs - real
                u = np.concatenate([u, np.zeros(pad, np.int32)])
                it = np.concatenate([it, np.zeros(pad, np.int32)])
            w = np.zeros(bs, np.float32)
            w[:real] = 1.0
            if sharded:
                m = self._sharded_evalb(
                    params,
                    corpus,
                    self._put_batch(u),
                    self._put_batch(it),
                    self._put_batch(w),
                )
            else:
                m = self._eval_batch(
                    params, corpus, jnp.asarray(u), jnp.asarray(it),
                    jnp.asarray(w), self.max_k,
                )
            batch_metrics.append(jax.device_get(m))
            batch_weights.append(float(real))
        out = merge_metric_sums(batch_metrics, batch_weights)
        logger.info(
            "evaluated %d rows over %d items: %s",
            n,
            self.num_items,
            {k: round(v, 4) for k, v in sorted(out.items())},
        )
        return out

    def make_evaluate_fn(self, user_idx: np.ndarray, item_idx: np.ndarray):
        """Bind an eval split for the Trainer's ``evaluate_fn`` hook."""

        def fn(params) -> dict[str, float]:
            return self.evaluate(params, user_idx, item_idx)

        return fn
