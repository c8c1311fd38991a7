"""Data layer: columnar schema, preprocessing, vocab, batch pipeline."""

from twotower_tpu.data.base import DataLoader, DataProcessor, DataSaver, DataValidator

from twotower_tpu.data.pipeline import BatchPipeline, DevicePrefetcher
from twotower_tpu.data.preprocess import InteractionFilter, Preprocessor, Splits
from twotower_tpu.data.schema import Interactions, from_columns, from_dataframe
from twotower_tpu.data.synthetic import generate_interactions
from twotower_tpu.data.vocab import VocabPair, Vocabulary

__all__ = [
    "DataLoader",
    "DataProcessor",
    "DataSaver",
    "DataValidator",
    "BatchPipeline",
    "DevicePrefetcher",
    "InteractionFilter",
    "Interactions",
    "Preprocessor",
    "Splits",
    "VocabPair",
    "Vocabulary",
    "from_columns",
    "from_dataframe",
    "generate_interactions",
]
