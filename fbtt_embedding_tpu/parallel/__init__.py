"""Multi-chip parallelism: meshes, sharded TT-embedding lookups, the
batch-sharded fused train step, sharded caches, and multi-host glue."""

from fbtt_embedding_tpu.parallel.mesh import make_mesh
from fbtt_embedding_tpu.parallel.multihost import (
    initialize_distributed,
    make_hybrid_mesh,
)
from fbtt_embedding_tpu.parallel.sharded import (
    csr_step_adapter,
    make_dp_cached_lookup,
    make_dp_lookup,
    make_dp_serving_fn,
    make_row_owned_cached_lookup,
    make_row_owned_fused_train_step,
    make_row_owned_populate,
    make_sharded_fused_train_step,
    make_table_sharded_fused_train_step,
    make_table_sharded_lookup,
    shard_cache_weight_by_owner,
    shard_params_for_table_parallel,
    shard_table_sharded_params,
)

__all__ = [
    "csr_step_adapter",
    "make_mesh",
    "make_hybrid_mesh",
    "initialize_distributed",
    "make_dp_lookup",
    "make_dp_cached_lookup",
    "make_dp_serving_fn",
    "make_row_owned_cached_lookup",
    "make_row_owned_fused_train_step",
    "make_row_owned_populate",
    "make_sharded_fused_train_step",
    "make_table_sharded_fused_train_step",
    "make_table_sharded_lookup",
    "shard_table_sharded_params",
    "shard_cache_weight_by_owner",
    "shard_params_for_table_parallel",
]
