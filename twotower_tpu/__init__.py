"""twotower_tpu — a TPU-native two-tower retrieval engine.

A from-scratch JAX/XLA/Pallas framework covering the full role of the
reference repo ``coop-columb/two-tower-amazon-recommender`` (see SURVEY.md):
streaming data pipeline (k-core filtering, vocab build, temporal splits),
dual-MLP-tower model over sharded embedding tables, in-batch sampled-softmax
training with log-Q correction, Recall@K/NDCG@K evaluation via on-TPU top-k
MIPS kernels, and a serving path — designed SPMD-first over a GSPMD mesh.
"""

from twotower_tpu.config import Config, load_config

__version__ = "0.1.0"

__all__ = ["Config", "load_config", "__version__"]
