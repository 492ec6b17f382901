"""Core TT-embedding ops: indexing, contraction, pooling, cache, optimizers."""
