"""Parallelism layer: mesh construction, sharding rules, SPMD steps."""

from twotower_tpu.parallel.mesh import build_mesh, initialize_multihost
from twotower_tpu.parallel.sharding import (
    batch_shardings,
    shard_state,
    state_shardings,
)
from twotower_tpu.parallel.a2a import (
    alltoall_lookup,
    psum_lookup,
    sharded_embedding_lookup,
)
from twotower_tpu.parallel.sparse_spmd import (
    make_sparse_sharded_train_step,
    use_sparse_mesh_path,
)
from twotower_tpu.parallel.spmd import make_sharded_eval_step, make_sharded_train_step

__all__ = [
    "build_mesh",
    "initialize_multihost",
    "batch_shardings",
    "shard_state",
    "state_shardings",
    "make_sharded_eval_step",
    "make_sharded_train_step",
    "make_sparse_sharded_train_step",
    "use_sparse_mesh_path",
    "alltoall_lookup",
    "psum_lookup",
    "sharded_embedding_lookup",
]
