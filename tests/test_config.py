"""Config tree tests (reference analog: tests/unit/test_base.py DatasetConfig
validation at :57-66)."""

import dataclasses

import pytest

from twotower_tpu.config import (
    Config,
    DatasetConfig,
    ModelConfig,
    PreprocessingConfig,
    RetrievalConfig,
    load_config,
    parse_cli_overrides,
)


def test_defaults_match_reference_schema():
    cfg = Config()
    # reference: configs/data_config.yaml:54-71
    assert cfg.model.embedding_dim == 128
    assert cfg.model.user_tower_dims == [512, 256, 128]
    assert cfg.model.item_tower_dims == [512, 256, 128]
    assert cfg.model.dropout_rate == 0.1
    assert cfg.model.l2_regularization == 1e-6
    assert cfg.training.batch_size == 1024
    assert cfg.training.learning_rate == 0.001
    assert cfg.training.epochs == 50
    assert cfg.training.patience == 5
    assert cfg.retrieval.candidate_sampling == "in_batch"
    assert cfg.retrieval.temperature == 0.1
    assert cfg.retrieval.top_k_eval == [1, 5, 10, 20, 50, 100]
    # reference: configs/data_config.yaml:40-45
    assert cfg.preprocessing.min_interactions_per_user == 5
    assert cfg.preprocessing.min_interactions_per_item == 5
    assert cfg.preprocessing.train_split == 0.8


def test_dataset_config_validation():
    with pytest.raises(ValueError):
        DatasetConfig(name="")
    with pytest.raises(ValueError):
        DatasetConfig(categories=[])
    with pytest.raises(ValueError):
        DatasetConfig(sample_size=0)


def test_split_validation():
    with pytest.raises(ValueError):
        PreprocessingConfig(train_split=0.9, val_split=0.2, test_split=0.1)


def test_model_validation():
    with pytest.raises(ValueError):
        ModelConfig(user_tower_dims=[64, 32], item_tower_dims=[64, 16])
    with pytest.raises(ValueError):
        ModelConfig(embedding_dim=0)


def test_retrieval_validation():
    with pytest.raises(ValueError):
        RetrievalConfig(candidate_sampling="bogus")
    with pytest.raises(ValueError):
        RetrievalConfig(temperature=0.0)
    assert RetrievalConfig().max_k == 100


def test_serving_corpus_dtype_validation():
    from twotower_tpu.config import ServingConfig

    # ANY reduced-precision resident corpus breaks the exact indexes'
    # bit-parity-with-evaluation contract, not just int8.
    for dtype in ("int8", "int8_rowscale", "bfloat16"):
        with pytest.raises(ValueError):
            ServingConfig(index_type="tpu_mips_exact", corpus_dtype=dtype)
        with pytest.raises(ValueError):
            ServingConfig(index_type="cpu_flat", corpus_dtype=dtype)
        ServingConfig(index_type="tpu_mips", corpus_dtype=dtype)  # allowed
    # float32 / auto stay exact on every index type.
    for dtype in ("auto", "float32"):
        cfg = ServingConfig(index_type="tpu_mips_exact", corpus_dtype=dtype)
        assert cfg.resolve_corpus_dtype() == "float32"


def test_from_dict_accepts_reference_nested_layout():
    # The reference nests training/retrieval under model
    # (configs/data_config.yaml:61-71); we accept both layouts.
    raw = {
        "model": {
            "embedding_dim": 64,
            "training": {"batch_size": 256},
            "retrieval": {"temperature": 0.2},
        }
    }
    cfg = Config.from_dict(raw)
    assert cfg.model.embedding_dim == 64
    assert cfg.training.batch_size == 256
    assert cfg.retrieval.temperature == 0.2


def test_yaml_roundtrip(tmp_path):
    cfg = Config()
    p = tmp_path / "cfg.yaml"
    import yaml

    p.write_text(yaml.safe_dump(cfg.to_dict()))
    loaded = Config.from_yaml(p)
    assert loaded.to_dict() == cfg.to_dict()


def test_default_yaml_loads():
    from pathlib import Path

    cfg = load_config(Path(__file__).resolve().parents[1] / "configs" / "default.yaml")
    assert cfg.model.embedding_dim == 128
    assert cfg.mesh.shard_embeddings is True


def test_overrides():
    cfg = Config().with_overrides({"training.batch_size": 4096})
    assert cfg.training.batch_size == 4096
    with pytest.raises(KeyError):
        Config().with_overrides({"training.nope": 1})


def test_parse_cli_overrides():
    out = parse_cli_overrides(["training.batch_size=512", "model.compute_dtype=float32"])
    assert out == {"training.batch_size": 512, "model.compute_dtype": "float32"}
    with pytest.raises(ValueError):
        parse_cli_overrides(["bad-pair"])


def test_unknown_keys_tolerated():
    cfg = Config.from_dict({"model": {"embedding_dim": 32, "future_field": 1}})
    assert cfg.model.embedding_dim == 32
    assert not hasattr(cfg.model, "future_field") or isinstance(
        dataclasses.asdict(cfg.model), dict
    )


def test_platform_cpu_only_parsing():
    """JAX_PLATFORMS="tpu,cpu" is fallback ordering (prefer TPU) and must
    not be treated as a cpu-only request by the CLI platform guard."""
    from twotower_tpu.utils.platform import _is_cpu_only

    assert _is_cpu_only("cpu")
    assert _is_cpu_only(" CPU ")
    assert not _is_cpu_only("tpu,cpu")
    assert not _is_cpu_only("cpu,tpu")
    assert not _is_cpu_only("tpu")
    assert not _is_cpu_only("")


def test_shipped_config_presets_load():
    """Every YAML under configs/ must load into a valid Config (the five
    BASELINE.json scale presets + default)."""
    from pathlib import Path

    from twotower_tpu.config import load_config

    cfg_dir = Path(__file__).resolve().parents[1] / "configs"
    paths = sorted(cfg_dir.glob("*.yaml"))
    assert len(paths) >= 6  # default + 5 scale presets
    for path in paths:
        cfg = load_config(path)
        assert cfg.model.embedding_dim > 0
        assert cfg.mesh.num_model >= 1


def test_cli_override_scientific_notation():
    """YAML 1.1 parses bare '1e-5' as a STRING — the override parser must
    coerce numeric-looking values (round-5 bug: model.l2_regularization=1e-5
    crashed inside the jitted loss with a str/int comparison)."""
    from twotower_tpu.config import parse_cli_overrides

    out = parse_cli_overrides([
        "model.l2_regularization=1e-5",
        "training.learning_rate=2.5E-3",
        "training.epochs=3",
        "dataset.name=books",
        "model.user_tower_dims=[64,32]",
    ])
    assert out["model.l2_regularization"] == pytest.approx(1e-5)
    assert isinstance(out["model.l2_regularization"], float)
    assert out["training.learning_rate"] == pytest.approx(2.5e-3)
    assert out["training.epochs"] == 3
    assert out["dataset.name"] == "books"
    assert out["model.user_tower_dims"] == [64, 32]
