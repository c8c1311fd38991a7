"""Feature layer: columnar feature engineering + optional text encoders
(hashed n-gram and HF-transformer; the latter imports ``transformers``
lazily, so it is not re-exported here)."""

from twotower_tpu.features.engineer import FeatureEngineer
from twotower_tpu.features.text_encoder import HashedNgramEncoder

__all__ = ["FeatureEngineer", "HashedNgramEncoder"]
