"""Transformer text encoder (features/transformer_encoder.py).

Tests run fully offline: the tokenizer is a tiny WordPiece vocab written
in-test and the model is a randomly-initialized 1-layer FlaxBertModel built
from config — mirroring the reference's mocked-ingestion test strategy
(SURVEY.md §4) for the one dependency (`transformers`) the reference
declares but never wires in (reference pyproject.toml:27).
"""

from __future__ import annotations

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

from twotower_tpu.features.text_encoder import HashedNgramEncoder  # noqa: E402
from twotower_tpu.features.transformer_encoder import (  # noqa: E402
    TransformerTextEncoder,
    build_text_encoder,
)

VOCAB = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
    "hello", "world", "book", "##s", "great", "read", "a", "the",
]


@pytest.fixture(scope="module")
def tok_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_bert")
    (d / "vocab.txt").write_text("\n".join(VOCAB))
    tok = transformers.BertTokenizer(vocab_file=str(d / "vocab.txt"))
    tok.save_pretrained(str(d))
    cfg = transformers.BertConfig(
        vocab_size=len(VOCAB),
        hidden_size=24,
        num_hidden_layers=1,
        num_attention_heads=2,
        intermediate_size=32,
        max_position_embeddings=64,
    )
    model = transformers.FlaxBertModel(cfg, seed=0)
    model.save_pretrained(str(d))
    return str(d)


@pytest.fixture(scope="module")
def encoder(tok_dir):
    return TransformerTextEncoder(tok_dir, max_tokens=8)


class TestTokenContract:
    def test_shape_and_pad(self, encoder):
        out = encoder.encode(np.array(["hello world", "", None], dtype=object))
        assert out.shape == (3, 8) and out.dtype == np.int32
        assert (out[1] == 0).all() and (out[2] == 0).all()
        # Non-empty rows: CLS + tokens + SEP, then PAD(0).
        assert out[0, 0] != 0

    def test_shift_keeps_zero_for_pad_only(self, encoder):
        """Real ids are shifted +1 — token 0 appears ONLY as padding, even
        though the tokenizer's own [PAD] id is 0."""
        out = encoder.encode(np.array(["hello"], dtype=object))
        n_real = int((out[0] != 0).sum())
        # [CLS] hello [SEP]
        assert n_real == 3
        cls_id = encoder.tokenizer.cls_token_id
        assert out[0, 0] == cls_id + 1

    def test_ids_bounded_by_buckets(self, encoder):
        out = encoder.encode(
            np.array(["the great books", "a read", "hello hello"], dtype=object)
        )
        assert out.max() < encoder.num_buckets
        assert encoder.num_buckets == len(VOCAB) + 1

    def test_truncation_is_static_shape(self, encoder):
        out = encoder.encode(np.array([" ".join(["hello"] * 50)], dtype=object))
        assert out.shape == (1, 8)
        assert (out[0] != 0).all()

    def test_dedup_matches_direct(self, encoder):
        texts = np.array(
            ["hello world", "great read", "hello world", "great read"],
            dtype=object,
        )
        out = encoder.encode(texts)
        np.testing.assert_array_equal(out[0], out[2])
        np.testing.assert_array_equal(out[1], out[3])


class TestPerItem:
    def test_first_occurrence_title_preferred(self, encoder):
        item_idx = np.array([1, 0, 1, 2])
        texts = np.array(["great read", "hello", None, ""], dtype=object)
        titles = np.array(["book", None, "world", None], dtype=object)
        table = encoder.encode_per_item(item_idx, texts, 4, titles=titles)
        # item 1 <- row 0: "book great read"; item 0 <- row 1: "hello";
        # item 2 has no text anywhere -> PAD row; item 3 never appears.
        exp1 = encoder.encode(np.array(["book great read"], dtype=object))[0]
        exp0 = encoder.encode(np.array(["hello"], dtype=object))[0]
        np.testing.assert_array_equal(table[1], exp1)
        np.testing.assert_array_equal(table[0], exp0)
        assert (table[2] == 0).all() and (table[3] == 0).all()

    def test_same_selection_as_hashed_encoder(self, encoder):
        """Both encoders must pick the same text per item (the shared
        select_first_item_texts) — only the tokenization differs."""
        rng = np.random.default_rng(0)
        item_idx = rng.integers(0, 10, 40)
        texts = np.array(
            [rng.choice(["hello world", "great read", ""]) for _ in range(40)],
            dtype=object,
        )
        hashed = HashedNgramEncoder(num_buckets=64, max_tokens=8)
        h_table = hashed.encode_per_item(item_idx, texts, 10)
        t_table = encoder.encode_per_item(item_idx, texts, 10)
        # An item is text-less for one encoder iff it is for the other.
        np.testing.assert_array_equal(
            (h_table != 0).any(axis=1), (t_table != 0).any(axis=1)
        )


class TestPretrainedInit:
    def test_word_embedding_init_shape_and_zeros(self, encoder):
        e = 16
        table = encoder.word_embedding_init(e, pad_multiple=8)
        from twotower_tpu.models.two_tower import padded_rows

        assert table.shape == (padded_rows(encoder.num_buckets, 8), e)
        assert (table[0] == 0).all()  # PAD bucket
        v = encoder.tokenizer.vocab_size
        assert (table[v + 1 :] == 0).all()  # beyond-vocab padding rows
        assert np.abs(table[1 : v + 1]).sum() > 0
        # RMS matched to the random init's 1/sqrt(E) scale.
        rms = np.sqrt(np.mean(np.square(table[1 : v + 1])))
        assert 0.5 / np.sqrt(e) < rms < 2.0 / np.sqrt(e)

    def test_pca_when_hidden_exceeds_embedding(self, encoder):
        table = encoder.word_embedding_init(8, pad_multiple=8)  # H=24 -> 8
        assert table.shape[1] == 8

    def test_zero_pad_when_hidden_below_embedding(self, encoder):
        table = encoder.word_embedding_init(40, pad_multiple=8)  # H=24 -> 40
        v = encoder.tokenizer.vocab_size
        assert (table[1 : v + 1, 24:] == 0).all()

    def test_init_params_accepts_table(self, encoder, tiny_config):
        import jax

        from twotower_tpu.models import two_tower

        cfg = tiny_config.with_overrides(
            {"model.text_buckets": encoder.num_buckets}
        ).model
        init = encoder.word_embedding_init(cfg.embedding_dim, pad_multiple=128)
        params = two_tower.init_params(
            jax.random.PRNGKey(0), cfg, 20, 10, text_embedding_init=init
        )
        np.testing.assert_array_equal(np.asarray(params["text_embedding"]), init)

    def test_init_params_rejects_wrong_shape(self, encoder, tiny_config):
        import jax

        from twotower_tpu.models import two_tower

        cfg = tiny_config.with_overrides(
            {"model.text_buckets": encoder.num_buckets}
        ).model
        with pytest.raises(ValueError, match="text_embedding_init"):
            two_tower.init_params(
                jax.random.PRNGKey(0), cfg, 20, 10,
                text_embedding_init=np.zeros((3, 3), np.float32),
            )


class TestVectors:
    def test_encode_vectors_shape_and_batch_invariance(self, encoder):
        texts = np.array(
            ["hello world", "great read", "the books", "a book", "world"],
            dtype=object,
        )
        v_small = encoder.encode_vectors(texts, batch_size=2)
        v_big = encoder.encode_vectors(texts, batch_size=8)
        assert v_small.shape == (5, 24)
        np.testing.assert_allclose(v_small, v_big, rtol=1e-4, atol=1e-5)
        assert np.isfinite(v_small).all()


class TestConfigDispatch:
    def test_build_hashed(self, tiny_config):
        enc = build_text_encoder(
            tiny_config.with_overrides({"model.text_buckets": 64}).model
        )
        assert isinstance(enc, HashedNgramEncoder)

    def test_build_none_when_off(self, tiny_config):
        assert build_text_encoder(tiny_config.model) is None

    def test_build_transformer(self, tiny_config, tok_dir):
        enc = build_text_encoder(
            tiny_config.with_overrides(
                {
                    "model.text_encoder": "transformer",
                    "model.text_model_path": tok_dir,
                    "model.text_tokens": 8,
                }
            ).model
        )
        assert isinstance(enc, TransformerTextEncoder)
        assert enc.num_buckets == len(VOCAB) + 1

    def test_config_requires_path(self, tiny_config):
        with pytest.raises(ValueError, match="text_model_path"):
            tiny_config.with_overrides({"model.text_encoder": "transformer"})

    def test_config_rejects_unknown_encoder(self, tiny_config):
        with pytest.raises(ValueError, match="text_encoder"):
            tiny_config.with_overrides({"model.text_encoder": "bert"})


class TestEndToEnd:
    def test_train_cli_with_transformer_text(self, tok_dir, tmp_path):
        """Full train-model run: tokenizer ids + pretrained init resolve,
        the config snapshot records the resolved bucket count, and the
        checkpoint round-trips through evaluate-model."""
        import json

        from twotower_tpu.training.train import main as train_main

        ckpt = tmp_path / "ckpt"
        rc = train_main(
            [
                "--synthetic", "--synthetic-users", "60",
                "--synthetic-items", "40", "--synthetic-interactions", "2000",
                "--synthetic-text",
                "--checkpoint-dir", str(ckpt),
                "--no-eval",
                "--override", "training.epochs=1", "training.batch_size=32",
                "model.embedding_dim=16", "model.user_tower_dims=[16]",
                "model.item_tower_dims=[16]",
                "model.text_encoder=transformer",
                f"model.text_model_path={tok_dir}",
                "model.text_tokens=8",
                "preprocessing.min_interactions_per_user=2",
                "preprocessing.min_interactions_per_item=2",
            ]
        )
        assert rc == 0
        snap = json.loads((ckpt / "config.json").read_text())
        assert snap["model"]["text_buckets"] == len(VOCAB) + 1
        assert (ckpt / "item_tokens.npz").exists()
        tokens = np.load(ckpt / "item_tokens.npz")["tokens"]
        assert tokens.shape[1] == 8 and tokens.max() < len(VOCAB) + 1

        from twotower_tpu.evaluation.evaluate import main as eval_main

        rc = eval_main(
            [
                "--checkpoint-dir", str(ckpt),
                "--synthetic", "--synthetic-users", "60",
                "--synthetic-items", "40", "--synthetic-interactions", "2000",
            ]
        )
        assert rc == 0
