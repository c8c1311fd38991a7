"""Model layer: two-tower retrieval model as pure functions over pytrees."""

from twotower_tpu.models import two_tower
from twotower_tpu.models.two_tower import (
    embed_item_table,
    embed_items,
    embed_users,
    forward,
    init_params,
    param_count,
)

__all__ = [
    "two_tower",
    "init_params",
    "forward",
    "embed_users",
    "embed_items",
    "embed_item_table",
    "param_count",
]
