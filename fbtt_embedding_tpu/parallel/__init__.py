"""Multi-chip sharding: meshes, shard_map lookups, all-to-all exchange."""
