"""Feature layer: columnar feature engineering + optional text encoder."""

from twotower_tpu.features.engineer import FeatureEngineer

__all__ = ["FeatureEngineer"]
