"""Utilities: shape factorization, weight init, checkpointing, config."""
