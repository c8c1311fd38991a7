"""Transformer text encoder: HF tokenizer ids + pretrained-embedding init.

The reference declares ``transformers>=4.35.0`` and ``max_sequence_length:
512`` but never wires any text encoder into its (placeholder) model layer
(reference: pyproject.toml:27, configs/data_config.yaml:42; SURVEY.md §2.2
row 29). This module is the transformer realization, designed TPU-first by
keeping the transformer OFF the train step's hot path:

- ``encode`` / ``encode_per_item``: a real WordPiece/BPE tokenizer produces
  the SAME static-shape ``[N, max_tokens]`` int32 contract the hashed
  n-gram encoder emits (ids shifted +1 so 0 stays the PAD bucket), so the
  towers' masked-mean embedding-bag, the sparse a2a row routing, the eval
  corpus encode, and serving all work unchanged — zero new plumbing.
- ``word_embedding_init``: the checkpoint's word-embedding matrix,
  PCA-projected to ``embedding_dim`` and RMS-matched to the random-init
  scale, as the text table's initial value. Pretrained lexical semantics,
  still fully trainable, zero per-step transformer cost — mean-pooled
  pretrained word vectors are the classic strong text baseline for
  retrieval towers.
- ``encode_vectors``: full-model contextual vectors via jitted fixed-shape
  Flax batches on the accelerator, for offline similarity artifacts and
  cold-start item onboarding.

Zero-egress contract: tokenizer/model load from LOCAL directories only
(``local_files_only=True``); nothing downloads at train time. ``transformers``
is imported lazily so the core framework never requires it.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from twotower_tpu.features.text_encoder import PAD_ID, select_first_item_texts
from twotower_tpu.logging_utils import get_logger

logger = get_logger(__name__)


class TransformerTextEncoder:
    """HF-tokenizer text -> fixed-shape token ids (+ optional model access).

    Emits the hashed encoder's exact output contract: ``[N, max_tokens]``
    int32, token 0 = PAD. Real token ids are shifted +1 (``num_buckets`` =
    tokenizer vocab size + 1) so id 0 stays the mask sentinel regardless of
    which id the tokenizer's own pad token has.
    """

    def __init__(
        self,
        model_path: str | None = None,
        *,
        tokenizer: Any = None,
        flax_model: Any = None,
        max_tokens: int = 32,
    ):
        if tokenizer is None:
            if not model_path:
                raise ValueError(
                    "TransformerTextEncoder needs model_path or tokenizer"
                )
            from transformers import AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(
                model_path, local_files_only=True
            )
        self.tokenizer = tokenizer
        self.max_tokens = int(max_tokens)
        self.model_path = model_path
        self._model = flax_model

    @property
    def num_buckets(self) -> int:
        """Text-table rows: tokenizer vocab + the shifted-in PAD bucket 0.

        ``len(tokenizer)`` (not ``vocab_size``) so added special tokens
        count."""
        return len(self.tokenizer) + 1

    # -- token encoding (training-path contract) --------------------------

    def encode(self, texts: np.ndarray) -> np.ndarray:
        """``[N]`` text column -> ``[N, max_tokens]`` int32, PAD = 0.

        Deduplicates whole texts first (titles and short reviews repeat
        heavily) and batch-tokenizes the distinct set once.
        """
        norm = np.array(
            ["" if t is None else str(t) for t in texts], dtype=object
        )
        uniq, inverse = np.unique(norm, return_inverse=True)
        out_u = np.full((len(uniq), self.max_tokens), PAD_ID, np.int32)
        nonempty = [i for i, t in enumerate(uniq.tolist()) if t]
        if nonempty:
            enc = self.tokenizer(
                [str(uniq[i]) for i in nonempty],
                truncation=True,
                max_length=self.max_tokens,
                padding="max_length",
                return_attention_mask=True,
            )
            ids = np.asarray(enc["input_ids"], np.int64)
            mask = np.asarray(enc["attention_mask"], np.int64)
            out_u[nonempty] = ((ids + 1) * mask).astype(np.int32)
        return out_u[inverse.reshape(norm.shape)]

    def encode_per_item(
        self,
        item_idx: np.ndarray,
        texts: np.ndarray | None,
        num_items: int,
        titles: np.ndarray | None = None,
    ) -> np.ndarray:
        """Per-item token table ``[num_items, max_tokens]`` — the same
        first-non-empty-occurrence selection (title preferred) as the hashed
        encoder (``select_first_item_texts``), then one batched tokenizer
        pass over the distinct item texts."""
        table = np.full((num_items, self.max_tokens), PAD_ID, np.int32)
        items, item_texts = select_first_item_texts(
            item_idx, texts, num_items, titles
        )
        if len(items):
            table[items] = self.encode(np.array(item_texts, dtype=object))
        return table

    # -- pretrained weights ------------------------------------------------

    def _require_model(self) -> Any:
        if self._model is None:
            if not self.model_path:
                raise ValueError(
                    "no flax_model given and no model_path to load one from"
                )
            from transformers import FlaxAutoModel

            self._model = FlaxAutoModel.from_pretrained(
                self.model_path, local_files_only=True
            )
        return self._model

    def _word_embeddings(self) -> np.ndarray:
        """The checkpoint's input word-embedding matrix ``[V, H]``.

        Found structurally: a 2-D leaf in the Flax param tree whose leading
        dim matches ``len(tokenizer)`` (preferred — covers checkpoints whose
        embedding matrix was resized for added tokens) or the base
        ``vocab_size``; among size-ties, paths containing "embed"/"wte" win.
        Architecture-agnostic, no per-model map.
        """
        import jax

        model = self._require_model()
        sizes = (len(self.tokenizer), self.tokenizer.vocab_size)
        flat = jax.tree_util.tree_flatten_with_path(model.params)[0]
        hits = [
            ("/".join(str(k) for k in path).lower(), np.asarray(leaf))
            for path, leaf in flat
            if getattr(leaf, "ndim", 0) == 2 and leaf.shape[0] in sizes
        ]
        if not hits:
            raise ValueError(
                f"no [vocab in {set(sizes)}, H] embedding leaf in the model "
                "params"
            )
        # Prefer the resized (len(tokenizer)) match, then embed-like paths.
        hits.sort(
            key=lambda h: (
                h[1].shape[0] != sizes[0],
                not ("embed" in h[0] or "wte" in h[0]),
            )
        )
        path, emb = hits[0]
        logger.info("word embeddings from %s: %s", path, emb.shape)
        return emb.astype(np.float32)

    def word_embedding_init(
        self, embedding_dim: int, *, pad_multiple: int | None = None
    ) -> np.ndarray:
        """Text-table init ``[padded_rows(num_buckets), embedding_dim]`` from
        the pretrained word embeddings.

        ``H -> embedding_dim`` by PCA (top principal directions of the
        centered matrix) when H exceeds it, zero-padding otherwise; rows are
        RMS-matched to the random initializer's ``1/sqrt(E)`` scale so the
        towers see the same activation magnitudes either way. Row 0 (PAD)
        and rows past the matched vocab stay zero (both are masked/never
        gathered). ``pad_multiple`` defaults to the table layout's own
        ``two_tower.LANE`` so init shape and model shape can never drift.
        """
        from twotower_tpu.models.two_tower import LANE, padded_rows

        if pad_multiple is None:
            pad_multiple = LANE

        emb = self._word_embeddings()
        v, h = emb.shape
        e = int(embedding_dim)
        centered = emb - emb.mean(axis=0, keepdims=True)
        if h > e:
            # Eigendecomposition of the [H, H] covariance — cheaper than a
            # full SVD of [V, H] and identical principal directions.
            cov = centered.T @ centered
            _, vecs = np.linalg.eigh(cov)  # ascending eigenvalues
            proj = centered @ vecs[:, ::-1][:, :e]
        elif h < e:
            proj = np.concatenate(
                [centered, np.zeros((v, e - h), np.float32)], axis=1
            )
        else:
            proj = centered
        rms = float(np.sqrt(np.mean(np.square(proj)))) or 1.0
        proj = proj * ((1.0 / np.sqrt(e)) / rms)
        table = np.zeros(
            (padded_rows(self.num_buckets, pad_multiple), e), np.float32
        )
        # +1: the id shift that keeps 0 = PAD. v is the MATCHED matrix's row
        # count (len(tokenizer) when the checkpoint was resized for added
        # tokens), so every pretrained row lands in the table.
        table[1 : v + 1] = proj
        return table

    # -- full-model contextual vectors (offline) ---------------------------

    def encode_vectors(
        self, texts: np.ndarray, *, batch_size: int = 128
    ) -> np.ndarray:
        """Masked-mean pooled last-hidden-state vectors ``[N, H]``.

        Runs the full Flax model in jitted FIXED-SHAPE batches (one compile;
        the tail batch is padded and sliced off) on whatever accelerator JAX
        has — the offline path for similarity artifacts and cold-start item
        onboarding, not part of the train step.
        """
        import jax
        import jax.numpy as jnp

        model = self._require_model()
        norm = ["" if t is None else str(t) for t in texts]
        n = len(norm)
        if n == 0:
            # Stable trailing dim even for empty input so callers can
            # concatenate: read H off the model config (hidden_size, or
            # n_embd for GPT-style configs).
            cfg = getattr(model, "config", None)
            hidden = int(
                getattr(cfg, "hidden_size", None)
                or getattr(cfg, "n_embd", 0)
                or 0
            )
            return np.zeros((0, hidden), np.float32)
        enc = self.tokenizer(
            norm,
            truncation=True,
            max_length=self.max_tokens,
            padding="max_length",
            return_attention_mask=True,
        )
        ids = np.asarray(enc["input_ids"], np.int32)
        mask = np.asarray(enc["attention_mask"], np.int32)
        # Empty texts still tokenize to [CLS][SEP]-style frames; their
        # vectors are well-defined (special-token context) — callers gate on
        # emptiness if they need zeros.

        @jax.jit
        def pooled(ids_b, mask_b):
            hidden = model(input_ids=ids_b, attention_mask=mask_b)[0]
            m = mask_b.astype(hidden.dtype)[:, :, None]
            return jnp.sum(hidden * m, axis=1) / jnp.maximum(
                jnp.sum(m, axis=1), 1.0
            )

        outs = []
        for start in range(0, n, batch_size):
            ids_b = ids[start : start + batch_size]
            mask_b = mask[start : start + batch_size]
            pad = batch_size - len(ids_b)
            if pad:
                ids_b = np.pad(ids_b, ((0, pad), (0, 0)))
                mask_b = np.pad(mask_b, ((0, pad), (0, 0)))
                # All-pad rows make the mask denominator 0/0-guarded above.
            out = np.asarray(pooled(ids_b, mask_b), np.float32)
            outs.append(out[: batch_size - pad if pad else batch_size])
        return np.concatenate(outs, axis=0)


def build_text_encoder(model_cfg: Any) -> Any:
    """Config-dispatched encoder factory (train CLI / tooling entry).

    Returns ``None`` when the text tower is off, a ``HashedNgramEncoder``
    for ``text_encoder='hashed'`` (needs ``text_buckets > 0``), or a
    ``TransformerTextEncoder`` for ``'transformer'`` (buckets come from the
    tokenizer — callers must resolve ``model.text_buckets`` to
    ``encoder.num_buckets``, see ``training/train.py``).
    """
    if model_cfg.text_encoder == "transformer":
        return TransformerTextEncoder(
            model_cfg.text_model_path, max_tokens=model_cfg.text_tokens
        )
    if model_cfg.text_buckets > 0:
        from twotower_tpu.features.text_encoder import HashedNgramEncoder

        return HashedNgramEncoder(
            num_buckets=model_cfg.text_buckets,
            max_tokens=model_cfg.text_tokens,
        )
    return None
