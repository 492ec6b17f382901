"""Shared test helpers: sparse-feature generator and the dense oracle.

Mirrors the reference's differential-testing strategy
(``tt_embeddings_test.py:22-50,95-103``): generate CSR bags with clipped-
normal lengths and uniform indices, and compare against a plain dense
EmbeddingBag built from the materialized TT matrix.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fbtt_embedding_tpu.ops.contraction import tt_matrix_to_full

# Fixed prime-ish test shapes, same values as the reference suite
# (tt_embeddings_test.py:65-70).
TT_P_SHAPES = [7, 9, 11, 5]
TT_Q_SHAPES = [3, 4, 5, 7]
TT_RANKS = [13, 12, 7]


def tt_test_shapes(tt_ndims: int):
    p = TT_P_SHAPES[:tt_ndims]
    q = TT_Q_SHAPES[:tt_ndims]
    r = TT_RANKS[: tt_ndims - 1]
    return p, q, r, int(np.prod(p)), int(np.prod(q))


def generate_sparse_feature(
    rng: np.random.Generator,
    batch_size: int,
    num_embeddings: int,
    pooling_factor: float,
    pooling_factor_std: float,
    num_tables: int = 1,
) -> Tuple[np.ndarray, np.ndarray]:
    """CSR (indices, offsets) with clipped-normal bag lengths."""
    lengths = rng.normal(
        pooling_factor, pooling_factor_std, size=num_tables * batch_size
    )
    lengths = np.clip(np.round(lengths), 1, None).astype(np.int64)
    offsets = np.zeros(num_tables * batch_size + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    indices = rng.integers(0, num_embeddings, size=int(offsets[-1]))
    return indices.astype(np.int64), offsets


def embedding_bag_oracle(
    weight: jnp.ndarray,
    indices: np.ndarray,
    offsets: np.ndarray,
    num_tables: int,
    batch_size: int,
) -> jnp.ndarray:
    """Dense sum-pooling EmbeddingBag (include_last_offset semantics)."""
    nnz = len(indices)
    bag = np.searchsorted(offsets, np.arange(nnz), side="right") - 1
    rows = weight[jnp.asarray(indices)]
    pooled = jax.ops.segment_sum(
        rows, jnp.asarray(bag), num_segments=num_tables * batch_size
    )
    return pooled.reshape(num_tables, batch_size, -1)


def oracle_core_grads(
    tt_cores,
    tt_p_shapes,
    tt_q_shapes,
    tt_ranks,
    indices: np.ndarray,
    offsets: np.ndarray,
    batch_size: int,
    d_output: jnp.ndarray,
    table: int = 0,
) -> List[jnp.ndarray]:
    """Reference-style core grads: autodiff through full materialization
    (mirrors ``tt_embeddings_test.py:162-174``)."""

    def f(cores):
        full = tt_matrix_to_full(
            tt_p_shapes, tt_q_shapes, tt_ranks, cores, table=table
        )
        return embedding_bag_oracle(full, indices, offsets, 1, batch_size)

    _, vjp = jax.vjp(f, tuple(tt_cores))
    (grads,) = vjp(d_output.reshape(1, batch_size, -1))
    return list(grads)
