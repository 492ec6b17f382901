"""Multi-chip parallelism: meshes and sharded TT-embedding lookups."""

from fbtt_embedding_tpu.parallel.mesh import make_mesh
from fbtt_embedding_tpu.parallel.sharded import (
    make_dp_cached_lookup,
    make_dp_lookup,
    make_table_sharded_lookup,
    shard_params_for_table_parallel,
)

__all__ = [
    "make_mesh",
    "make_dp_lookup",
    "make_dp_cached_lookup",
    "make_table_sharded_lookup",
    "shard_params_for_table_parallel",
]
