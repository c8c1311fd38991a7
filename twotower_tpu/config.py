"""Typed configuration tree for the TPU two-tower retrieval engine.

Mirrors the capability schema of the reference repo's single source of truth
(reference: configs/data_config.yaml:1-71 and src/data/base.py:17-32), but as
a validated dataclass tree with YAML loading and dotted-path CLI overrides.

Design notes (TPU-first):
- Every field that shapes a compiled program (batch size, embedding dim,
  tower widths, top-k list) is a static Python value so jitted functions
  trace once per config, never per step.
- Mesh/sharding topology lives here too (the reference has no distributed
  config at all; see SURVEY.md section 2.2 row 22).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

import yaml

# ---------------------------------------------------------------------------
# Leaf config sections
# ---------------------------------------------------------------------------


@dataclass
class DatasetConfig:
    """Dataset source description (reference: src/data/base.py:17-32).

    The reference's ``DatasetConfig.__post_init__`` enforces that the
    k-core thresholds are present; we keep that contract and extend it.
    """

    name: str = "amazon_reviews_2023"
    source: str = "McAuley-Lab/Amazon-Reviews-2023"
    categories: list[str] = field(default_factory=lambda: ["All_Beauty"])
    cache_dir: str = "data/cache"
    cache_max_age_hours: float = 24.0
    sample_size: int | None = None
    seed: int = 42

    def __post_init__(self) -> None:
        if not self.name:
            raise ValueError("dataset.name must be non-empty")
        if not self.categories:
            raise ValueError("dataset.categories must be non-empty")
        if self.sample_size is not None and self.sample_size <= 0:
            raise ValueError("dataset.sample_size must be positive when set")


@dataclass
class FilteringConfig:
    """Row-level filters (reference: configs/data_config.yaml:46-51)."""

    min_rating: float = 1.0
    max_rating: float = 5.0
    remove_duplicates: bool = True
    min_text_length: int = 10
    max_text_length: int = 2000

    def __post_init__(self) -> None:
        if self.min_rating > self.max_rating:
            raise ValueError("filtering.min_rating must be <= max_rating")


@dataclass
class PreprocessingConfig:
    """Preprocessing thresholds (reference: configs/data_config.yaml:33-52).

    ``min_interactions_per_user/item`` drive the iterative k-core filter
    (reference: src/data/preprocessor.py:192-211).
    """

    text_fields: list[str] = field(
        default_factory=lambda: ["title", "text", "features", "description"]
    )
    min_interactions_per_user: int = 5
    min_interactions_per_item: int = 5
    max_kcore_iterations: int = 10
    max_sequence_length: int = 512
    train_split: float = 0.8
    val_split: float = 0.1
    test_split: float = 0.1
    lowercase: bool = True
    remove_html: bool = True
    remove_urls: bool = True
    remove_special_chars: bool = True
    remove_stopwords: bool = False
    stem_words: bool = False
    filtering: FilteringConfig = field(default_factory=FilteringConfig)

    def __post_init__(self) -> None:
        if self.min_interactions_per_user < 1 or self.min_interactions_per_item < 1:
            raise ValueError("min_interactions_per_{user,item} must be >= 1")
        total = self.train_split + self.val_split + self.test_split
        if abs(total - 1.0) > 1e-6:
            raise ValueError(f"splits must sum to 1.0, got {total}")


@dataclass
class ModelConfig:
    """Two-tower architecture (reference: configs/data_config.yaml:54-59)."""

    embedding_dim: int = 128
    user_tower_dims: list[int] = field(default_factory=lambda: [512, 256, 128])
    item_tower_dims: list[int] = field(default_factory=lambda: [512, 256, 128])
    dropout_rate: float = 0.1
    l2_regularization: float = 1e-6
    # TPU-first extensions: compute dtype for the MXU hot path; params stay f32.
    compute_dtype: str = "bfloat16"
    normalize_embeddings: bool = True
    # Text tower (0 buckets disables; reference declares transformers +
    # max_sequence_length 512 but never wires text in — SURVEY.md §2.2 row 29).
    text_buckets: int = 0
    text_tokens: int = 32
    # "hashed": deterministic hashed n-gram bag (features/text_encoder.py).
    # "transformer": a HF tokenizer's real token ids + optional pretrained
    # word-embedding init (features/transformer_encoder.py); requires
    # text_model_path (a LOCAL directory — zero-egress contract) and
    # auto-resolves text_buckets to the tokenizer's vocab size + 1.
    text_encoder: str = "hashed"
    text_model_path: str = ""
    # Initialize the text table from the checkpoint's word embeddings
    # (PCA-projected to embedding_dim) when weights exist at text_model_path.
    text_pretrained_init: bool = True

    def __post_init__(self) -> None:
        if self.embedding_dim <= 0:
            raise ValueError("model.embedding_dim must be positive")
        if self.text_encoder not in ("hashed", "transformer"):
            raise ValueError(
                f"model.text_encoder must be 'hashed' or 'transformer', "
                f"got {self.text_encoder!r}"
            )
        if self.text_encoder == "transformer" and not self.text_model_path:
            raise ValueError(
                "model.text_encoder='transformer' requires model.text_model_path "
                "(a local tokenizer/model directory)"
            )
        if not self.user_tower_dims or not self.item_tower_dims:
            raise ValueError("tower dims must be non-empty")
        if self.user_tower_dims[-1] != self.item_tower_dims[-1]:
            raise ValueError(
                "user and item towers must share a final dim "
                f"({self.user_tower_dims[-1]} != {self.item_tower_dims[-1]})"
            )
        if not 0.0 <= self.dropout_rate < 1.0:
            raise ValueError("model.dropout_rate must be in [0, 1)")

    @property
    def output_dim(self) -> int:
        return self.user_tower_dims[-1]


@dataclass
class TrainingConfig:
    """Optimizer/loop hyperparameters (reference: configs/data_config.yaml:61-66)."""

    batch_size: int = 1024
    learning_rate: float = 0.001
    epochs: int = 50
    patience: int = 5
    validation_freq: int = 1
    optimizer: str = "adam"
    weight_decay: float = 0.0
    warmup_steps: int = 0
    # Cosine decay to ~1% of peak over this many post-warmup steps
    # (0 = constant lr after warmup). One schedule drives BOTH the dense
    # optax chain and the sparse lazy-Adam rows (make_lr_fn mirrors
    # make_optimizer).
    decay_steps: int = 0
    seed: int = 42
    # Sparse (lazy-Adam, scatter-add) embedding-table updates — the
    # TPU-native fast path (training/sparse.py); disable for exact dense
    # optax semantics.
    sparse_table_updates: bool = True
    # Precompute id dedup on the HOST input pipeline (np.unique per batch,
    # hidden behind prefetch) instead of in-device argsort+segment ops —
    # measured −7.2% step time on v5e (training/host_dedup.py). Applies to
    # the single-device sparse step; the mesh path dedups at the owner
    # shard after the a2a regardless.
    host_dedup: bool = True
    log_every_steps: int = 100
    checkpoint_dir: str = "models/artifacts"
    keep_checkpoints: int = 3
    # Background checkpoint writes (single-controller runs): save() snapshots
    # the state on device (HBM copy, ~ms) and a worker thread does the
    # device->host fetch + Orbax write while training continues; pending
    # saves coalesce to the newest (= best) state and flush() at the end of
    # fit guarantees durability. On a high-latency transport the fetch is
    # the whole save cost (measured 270 s for the 5.7 GB config-3 state vs
    # the 63 s epoch it blocked). Costs one extra state copy in HBM until
    # fetched. Multi-process runs ignore this (collective sync save).
    async_checkpoint: bool = True
    # Minimum seconds between async checkpoint write STARTS (0 = none).
    # When every epoch improves, saves coalesce to the newest state but an
    # unthrottled worker keeps the device transport continuously busy
    # fetching; an idle window between writes gives input transfers and
    # validation fetches clean air. flush() ignores the window.
    checkpoint_min_interval_s: float = 0.0
    early_stopping_metric: str = "recall@10"
    # Host-loop segment size: >1 groups that many consecutive train steps
    # into ONE jitted lax.scan dispatch over stacked [S, B] batches. On a
    # high-latency device transport (the tunneled single-chip path) the
    # per-step dispatch overhead dominates streamed-input training
    # (measured ~8.7 ms/step at B=8192 vs ~6 ms of device compute); the
    # segment scan amortizes it S-fold while keeping the streaming input
    # path's bounded memory. 0/1 = per-step dispatch (default). Applies to
    # the single-device host loop; --device-loop subsumes it in-memory,
    # and the mesh path keeps per-step dispatch (multi-host batch
    # assembly is per-process).
    segment_steps: int = 0

    def effective_sparse_updates(self) -> bool:
        """Sparse row updates implement lazy ADAM specifically; fall back to
        the dense path for any other optimizer/decay configuration."""
        return (
            self.sparse_table_updates
            and self.optimizer.lower() == "adam"
            and self.weight_decay == 0.0
        )

    def __post_init__(self) -> None:
        if self.batch_size <= 0:
            raise ValueError("training.batch_size must be positive")
        if self.learning_rate <= 0:
            raise ValueError("training.learning_rate must be positive")
        if self.patience < 0:
            raise ValueError("training.patience must be >= 0")
        if self.segment_steps < 0:
            raise ValueError("training.segment_steps must be >= 0")
        if self.decay_steps < 0:
            raise ValueError("training.decay_steps must be >= 0")


@dataclass
class RetrievalConfig:
    """Loss/eval schema (reference: configs/data_config.yaml:68-71)."""

    candidate_sampling: str = "in_batch"
    temperature: float = 0.1
    logq_correction: bool = True
    # uniform/mixed branches: shared negatives sampled per step
    num_negatives: int = 1024
    # Sparse MESH step only: keep the in-batch candidate columns shard-
    # LOCAL (each data shard's rows score that shard's b/D item columns,
    # plus — for mixed — the shared sampled negatives) instead of
    # all-gathering the full global item-column block along ``data``. At
    # pod scale the item-column all_gather is the scaling wall (60 MiB/
    # step/device at 64 chips — docs/architecture.md dossier); dropping it
    # restores comm < compute. The negative pool per row shrinks from B-1
    # to b/D-1 (+num_negatives for mixed) — prefer mixed with a larger
    # num_negatives when enabling this. No-op on a single data shard
    # (local == global) and for uniform sampling (already gather-free).
    shard_local_negatives: bool = False
    # exact brute-force eval (metric-faithful) vs approx_max_k (fast val)
    eval_exact: bool = True
    # Validation-corpus residency: "bfloat16" halves the eval corpus HBM
    # (5.1 -> 2.6 GB at 10M x 128 — the difference between fitting and not
    # fitting next to the training state on one chip). Throughput is ~equal
    # (measured 132 -> 128 ms/4096-row batch at 10M: eval batches are
    # MXU-bound, not stream-bound). Validation mode only (eval_exact=false;
    # the exact path promises f32 scores).
    eval_corpus_dtype: str = "float32"
    # Whole-split lax.scan evaluation (one dispatch per time-budgeted
    # segment, one metrics fetch each). false = per-batch dispatch.
    eval_device_scan: bool = True
    # Max seconds a single dispatched eval program may run. Root-caused in
    # round 5 (benchmarks/eval_scan_probe.py): the round-4 "scanned exact
    # eval crashes the TPU worker" failure was a 60-second single-program
    # execution WATCHDOG on the tunneled worker — a trivial matmul
    # fori_loop dies at exactly 60.0 s, independent of shapes or memory.
    # The evaluator measures per-batch time on the first probe segments
    # and sizes subsequent scan segments to stay under this budget, so the
    # device scan is safe BY CONSTRUCTION at any corpus/split scale.
    # <= 0 disables segmentation (one whole-split program — only safe on
    # hardware without an execution watchdog).
    eval_scan_budget_s: float = 30.0
    top_k_eval: list[int] = field(default_factory=lambda: [1, 5, 10, 20, 50, 100])

    def __post_init__(self) -> None:
        if self.eval_corpus_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                "retrieval.eval_corpus_dtype must be 'float32' or "
                f"'bfloat16', got {self.eval_corpus_dtype!r}"
            )
        if self.eval_corpus_dtype == "bfloat16" and self.eval_exact:
            raise ValueError(
                "retrieval.eval_corpus_dtype='bfloat16' is approx-validation "
                "only (the exact evaluator promises f32-precision scores). "
                "Either keep eval_exact=false, or — for exact final numbers "
                "on a bf16-validation config — override BOTH: "
                "retrieval.eval_exact=true retrieval.eval_corpus_dtype=float32"
            )
        if self.candidate_sampling not in ("in_batch", "uniform", "mixed"):
            raise ValueError(
                f"retrieval.candidate_sampling must be 'in_batch', 'uniform' "
                f"or 'mixed', got {self.candidate_sampling!r}"
            )
        if self.temperature <= 0:
            raise ValueError("retrieval.temperature must be positive")
        if self.num_negatives <= 0:
            raise ValueError("retrieval.num_negatives must be positive")
        if not self.top_k_eval or any(k <= 0 for k in self.top_k_eval):
            raise ValueError("retrieval.top_k_eval must be positive ints")

    @property
    def max_k(self) -> int:
        return max(self.top_k_eval)

    def eval_corpus_jnp_dtype(self):
        """The eval-corpus residency dtype as a jnp dtype — the ONE
        derivation site shared by the replicated and sharded eval encodes
        (lazy import: the config module stays importable without jax)."""
        import jax.numpy as jnp

        return jnp.dtype(self.eval_corpus_dtype)


@dataclass
class MeshConfig:
    """Device mesh topology — TPU-native extension (no reference analog;
    SURVEY.md section 2.2 row 22 documents the reference's zero parallelism).

    ``data`` is the batch axis (DP for the dense towers); ``model`` is the
    row-sharding axis for the embedding tables. On a multi-host slice the
    data axis should map onto DCN and the model axis onto ICI.
    """

    data_axis: str = "data"
    model_axis: str = "model"
    num_data: int = -1  # -1: infer from available devices
    num_model: int = 1
    shard_embeddings: bool = True
    # Sparse mesh path's all-to-all bucket sizing: <= 0 means worst-case-safe
    # (zero dropped ids, but S x more a2a traffic than necessary); f > 0
    # sizes buckets at f x the uniform expectation of UNIQUE ids per owner
    # (duplicates dedup before the exchange, so hot items are capacity-free).
    # Guidance: 2.0 is +8 sigma of binomial skew at per-peer slices >= 1024
    # over 16 devices — zero drops in practice (drops are counted in the
    # step metric ``dropped_ids`` either way; overflow never corrupts other
    # rows). The flagship presets set 2.0-2.5; see PARITY.md for measured
    # traffic/step-time numbers.
    a2a_capacity_factor: float = 0.0
    # Model groups crossing hosts route the embedding all-to-all over DCN
    # instead of ICI — build_mesh rejects that loudly unless this explicit
    # escape hatch is set (legitimate only when the model axis carries no
    # table traffic, e.g. dense replicated-table topologies or tests).
    allow_dcn_model_axis: bool = False
    # Dense-tower gradient all-reduce precision on the sparse mesh path:
    # "bfloat16" halves the ring-all-reduce bytes (the second-largest term
    # of the pod-scale step traffic — docs/architecture.md dossier); Adam
    # moments and the update itself stay f32. Default f32 preserves bit
    # parity with the single-device step.
    dense_grad_dtype: str = "float32"

    def __post_init__(self) -> None:
        if self.num_model < 1:
            raise ValueError("mesh.num_model must be >= 1")
        if self.dense_grad_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                "mesh.dense_grad_dtype must be 'float32' or 'bfloat16', "
                f"got {self.dense_grad_dtype!r}"
            )


@dataclass
class ServingConfig:
    """Serving surface (reference: pyproject.toml:36-39,68; README.md:54)."""

    host: str = "0.0.0.0"  # nosec B104 - serving bind address, same as reference intent
    port: int = 8000
    top_k: int = 100
    max_batch_size: int = 256
    # tpu_mips: approx_max_k ANN (FAISS-equivalent, ~1 ms @ 500k items);
    # tpu_mips_exact: exact chunked-scan MIPS; cpu_flat: native C++ fallback.
    index_type: str = "tpu_mips"
    recall_target: float = 0.95
    # Resident corpus precision: "auto" = bfloat16 under the ANN index
    # (halves the HBM stream that dominates large-catalog latency; 10M-item
    # B=1 drops 19.3 -> 9.6 ms on v5e at < 0.01 recall@100 cost) and
    # float32 under the exact indexes (whose contract is bit-parity with
    # evaluation). "int8" (ANN only) quantizes the corpus symmetrically
    # with one global f32 scale, halving the stream again and scoring via
    # native s8 x s8 MXU matmuls (10M items: 4.2 ms @ B=256 vs 6.0 bf16,
    # recall@100 0.971); "int8_rowscale" keeps per-row scales (recall
    # 0.979, fastest at B=1, slower at coalesced batch sizes).
    corpus_dtype: str = "auto"
    # Micro-batch coalescing of concurrent /recommend requests (aiohttp
    # front): wait up to coalesce_window_ms to merge waiters into one
    # device call. 0 disables coalescing.
    coalesce_window_ms: float = 2.0
    # Per-request caps for the result-filtering surfaces: ids a /recommend
    # may exclude (seen-item filtering) and history items a cold-start
    # /recommend_by_history query may pool. Both bound the extra search
    # depth (k + exclusions) and the jit shape space (history widths are
    # bucketed to powers of two up to max_history).
    max_exclude: int = 256
    max_history: int = 256

    def __post_init__(self) -> None:
        if self.index_type not in ("tpu_mips", "tpu_mips_exact", "cpu_flat"):
            raise ValueError(f"unknown serving.index_type {self.index_type!r}")
        if not 0.0 < self.recall_target <= 1.0:
            raise ValueError("serving.recall_target must be in (0, 1]")
        if self.corpus_dtype not in (
            "auto", "bfloat16", "float32", "int8", "int8_rowscale"
        ):
            raise ValueError(f"unknown serving.corpus_dtype {self.corpus_dtype!r}")
        if self.corpus_dtype not in ("auto", "float32") and self.index_type != "tpu_mips":
            raise ValueError(
                f"serving.corpus_dtype={self.corpus_dtype!r} requires "
                "index_type='tpu_mips' (the exact indexes guarantee "
                "bit-parity with evaluation, which any reduced-precision "
                "resident corpus — bfloat16 or int8 — would break)"
            )
        if self.coalesce_window_ms < 0:
            raise ValueError("serving.coalesce_window_ms must be >= 0")
        if self.max_exclude < 0:
            raise ValueError("serving.max_exclude must be >= 0")
        if self.max_history < 1:
            raise ValueError("serving.max_history must be >= 1")

    def resolve_corpus_dtype(self) -> str:
        if self.corpus_dtype != "auto":
            return self.corpus_dtype
        return "bfloat16" if self.index_type == "tpu_mips" else "float32"


# ---------------------------------------------------------------------------
# Root config
# ---------------------------------------------------------------------------


@dataclass
class Config:
    """Root configuration tree."""

    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    preprocessing: PreprocessingConfig = field(default_factory=PreprocessingConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    training: TrainingConfig = field(default_factory=TrainingConfig)
    retrieval: RetrievalConfig = field(default_factory=RetrievalConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    serving: ServingConfig = field(default_factory=ServingConfig)

    # ------------------------------------------------------------------
    # Construction helpers
    # ------------------------------------------------------------------

    @classmethod
    def from_dict(cls, raw: dict[str, Any]) -> "Config":
        """Build from a (possibly partial) nested dict.

        Accepts both this package's layout and the reference YAML layout in
        which ``training``/``retrieval`` nest under ``model``
        (reference: configs/data_config.yaml:54-71).
        """
        raw = dict(raw)
        model_raw = dict(raw.get("model") or {})
        # Reference layout: hoist model.training / model.retrieval to top level.
        for key in ("training", "retrieval"):
            if key in model_raw and key not in raw:
                raw[key] = model_raw.pop(key)
            else:
                model_raw.pop(key, None)
        raw["model"] = model_raw

        sections: dict[str, Any] = {}
        for f in dataclasses.fields(cls):
            section_raw = raw.get(f.name)
            if section_raw is None:
                continue
            sections[f.name] = _build_section(f.type, section_raw)
        return cls(**sections)

    @classmethod
    def from_yaml(cls, path: str | Path) -> "Config":
        with open(path) as fh:
            raw = yaml.safe_load(fh) or {}
        return cls.from_dict(raw)

    def to_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, sort_keys=True)

    def with_overrides(self, overrides: dict[str, Any]) -> "Config":
        """Apply dotted-path overrides, e.g. {"training.batch_size": 4096}."""
        raw = self.to_dict()
        for dotted, value in overrides.items():
            node = raw
            *parents, leaf = dotted.split(".")
            for part in parents:
                if part not in node or not isinstance(node[part], dict):
                    raise KeyError(f"unknown config path: {dotted}")
                node = node[part]
            if leaf not in node:
                raise KeyError(f"unknown config path: {dotted}")
            node[leaf] = value
        return Config.from_dict(raw)


def _build_section(section_type: Any, raw: Any) -> Any:
    """Instantiate a dataclass section from a raw dict, recursing into
    nested dataclass fields and ignoring unknown keys (forward compat)."""
    if isinstance(section_type, str):
        section_type = _SECTION_TYPES.get(_last_name(section_type), None)
    if section_type is None or not dataclasses.is_dataclass(section_type):
        return raw
    if not isinstance(raw, dict):
        raise TypeError(f"expected dict for {section_type}, got {type(raw)}")
    known = {f.name: f for f in dataclasses.fields(section_type)}
    kwargs: dict[str, Any] = {}
    for key, value in raw.items():
        f = known.get(key)
        if f is None:
            continue  # forward/unknown keys tolerated, like yaml.safe_load use in ref
        if dataclasses.is_dataclass(_resolve_field_type(f)) and isinstance(value, dict):
            kwargs[key] = _build_section(_resolve_field_type(f), value)
        else:
            kwargs[key] = value
    return section_type(**kwargs)


def _resolve_field_type(f: dataclasses.Field) -> Any:
    t = f.type
    if isinstance(t, str):
        return _SECTION_TYPES.get(_last_name(t))
    return t


def _last_name(type_str: str) -> str:
    return type_str.split(".")[-1].strip().lower().replace("config", "") or type_str


# Keys match _last_name() output for each section dataclass name.
_SECTION_TYPES = {
    "dataset": DatasetConfig,
    "preprocessing": PreprocessingConfig,
    "model": ModelConfig,
    "training": TrainingConfig,
    "retrieval": RetrievalConfig,
    "mesh": MeshConfig,
    "serving": ServingConfig,
    "filtering": FilteringConfig,
}


def load_config(
    path: str | Path | None = None, overrides: dict[str, Any] | None = None
) -> Config:
    """Load config from YAML (or defaults) and apply dotted overrides."""
    cfg = Config.from_yaml(path) if path else Config()
    if overrides:
        cfg = cfg.with_overrides(overrides)
    return cfg


def load_config_for_checkpoint(
    checkpoint_dir: str | Path,
    path: str | Path | None = None,
    overrides: dict[str, Any] | None = None,
) -> Config:
    """Config resolution for checkpoint consumers (serve/evaluate CLIs).

    Base = the resolved-config snapshot train-model saved next to the
    checkpoint (``config.json``), so consumers rebuild the exact trained
    model shape without re-passing every override. An explicit ``--config``
    path replaces the snapshot; dotted overrides always apply last.
    """
    if path is None:
        snap = Path(checkpoint_dir) / "config.json"
        if snap.exists():
            cfg = Config.from_dict(json.loads(snap.read_text()))
            if overrides:
                cfg = cfg.with_overrides(overrides)
            return cfg
    return load_config(path, overrides)


def parse_cli_overrides(pairs: list[str]) -> dict[str, Any]:
    """Parse ``key=value`` CLI override strings with YAML-typed values.

    YAML 1.1 treats bare scientific notation (``1e-5``) as a STRING
    (floats need ``1.0e-5``) — a silent foot-gun for CLI overrides like
    ``model.l2_regularization=1e-5`` that only explodes later inside a
    jitted comparison. Numeric-looking strings are coerced here.
    """
    out: dict[str, Any] = {}
    for pair in pairs:
        if "=" not in pair:
            raise ValueError(f"override must be key=value, got {pair!r}")
        key, _, value = pair.partition("=")
        v = yaml.safe_load(value)
        if isinstance(v, str):
            try:
                v = int(v)
            except ValueError:
                try:
                    v = float(v)
                except ValueError:
                    pass
        out[key.strip()] = v
    return out
