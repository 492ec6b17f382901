"""Pooled TT-embedding lookup (forward + dense backward).

TPU-native replacement for the reference's forward host driver
(``tt_embeddings_forward_cuda``, ``tt_embeddings_cuda.cu:964-1075``) and
segment-sum pooling kernel (``reduce_output_kernel``,
``tt_embeddings_cuda.cu:920-962``).

Design notes (TPU-first):
  * no chunked pointer-array GEMM loop — the whole nnz batch is one traced
    program; XLA tiles the batched contraction onto the MXU.
  * pooling is ``jax.ops.segment_sum`` — deterministic, no atomics
    (the reference's warp-walk kernel relies on sorted-by-construction
    rowidx; segment_sum has no such requirement).
  * the dense backward is plain JAX autodiff through the contraction chain
    with optional rematerialization, matching the reference's
    recompute-in-backward strategy (``tt_embeddings_cuda.cu:529-545``) at
    the XLA level: nothing but indices is saved from the forward.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from fbtt_embedding_tpu.ops.contraction import tt_rows
from fbtt_embedding_tpu.ops.indexing import rowidx_from_offsets


def pool_rows(
    rows: jnp.ndarray,
    rowidx: jnp.ndarray,
    tableidx: Optional[jnp.ndarray],
    num_tables: int,
    batch_size: int,
) -> jnp.ndarray:
    """Sum-pool per-lookup rows into ``[num_tables, B, D]`` bags."""
    d = rows.shape[-1]
    if num_tables == 1 or tableidx is None:
        seg = rowidx
    else:
        seg = tableidx * batch_size + rowidx
    pooled = jax.ops.segment_sum(
        rows, seg, num_segments=num_tables * batch_size
    )
    return pooled.reshape(num_tables, batch_size, d)


def tt_forward(
    tt_cores: Sequence[jnp.ndarray],
    tt_p_shapes: Sequence[int],
    tt_q_shapes: Sequence[int],
    tt_ranks: Sequence[int],
    batch_size: int,
    indices: jnp.ndarray,
    rowidx: jnp.ndarray,
    tableidx: Optional[jnp.ndarray] = None,
    weights: Optional[jnp.ndarray] = None,
    remat: bool = False,
    precision=None,
) -> jnp.ndarray:
    """Pooled TT-embedding forward: ``[num_tables, B, D]`` sum-pooled output.

    Functional analog of the reference binding ``tt_forward``
    (``tt_embeddings.cpp:132``). Differentiable wrt ``tt_cores`` (dense-grad
    mode); use :mod:`fbtt_embedding_tpu.ops.fused_optim` for the fused
    sparse-update path.

    Args:
      weights: optional ``[nnz]`` per-lookup scale (per-sample weights) —
        generalizes the reference, which only supports unweighted sum.
    """
    num_tables = tt_cores[0].shape[0]

    def rows_fn(cores):
        return tt_rows(
            cores, tt_p_shapes, tt_q_shapes, tt_ranks, indices, tableidx,
            precision=precision,
        )

    if remat:
        rows_fn = jax.checkpoint(rows_fn)
    rows = rows_fn(tuple(tt_cores))
    if weights is not None:
        rows = rows * weights[:, None].astype(rows.dtype)
    return pool_rows(rows, rowidx, tableidx, num_tables, batch_size)


def tt_embedding_bag_forward(
    tt_cores: Sequence[jnp.ndarray],
    tt_p_shapes: Sequence[int],
    tt_q_shapes: Sequence[int],
    tt_ranks: Sequence[int],
    indices: jnp.ndarray,
    offsets: jnp.ndarray,
    batch_size: int,
    weights: Optional[jnp.ndarray] = None,
    remat: bool = False,
    precision=None,
) -> jnp.ndarray:
    """EmbeddingBag-style entry: (indices, offsets) -> ``[T, B, D]``.

    ``offsets`` has ``num_tables * batch_size + 1`` entries,
    ``include_last_offset=True`` semantics (reference test oracle,
    ``tt_embeddings_test.py:95-102``).
    """
    num_tables = tt_cores[0].shape[0]
    nnz = indices.shape[0]
    rowidx, tableidx = rowidx_from_offsets(offsets, nnz, num_tables, batch_size)
    return tt_forward(
        tt_cores, tt_p_shapes, tt_q_shapes, tt_ranks, batch_size,
        indices, rowidx, tableidx if num_tables > 1 else None,
        weights=weights, remat=remat, precision=precision,
    )


def tt_grads_from_row_cotangents(
    tt_cores: Sequence[jnp.ndarray],
    tt_p_shapes: Sequence[int],
    tt_q_shapes: Sequence[int],
    tt_ranks: Sequence[int],
    indices: jnp.ndarray,
    tableidx: Optional[jnp.ndarray],
    d_rows: jnp.ndarray,
    precision=None,
) -> List[jnp.ndarray]:
    """Core gradients given per-lookup row cotangents ``[nnz, D]``.

    Used by the cached path, where cotangents of cache-served lookups are
    zeroed so their gradient flows to ``cache_weight`` only (reference
    routes this by partitioning lookups; we route by masking).
    """
    def rows_fn(cores):
        return tt_rows(
            cores, tt_p_shapes, tt_q_shapes, tt_ranks, indices, tableidx,
            precision=precision,
        )

    _, vjp = jax.vjp(rows_fn, tuple(tt_cores))
    (grads,) = vjp(d_rows.astype(tt_cores[0].dtype))
    return list(grads)


def tt_dense_backward(
    tt_cores: Sequence[jnp.ndarray],
    tt_p_shapes: Sequence[int],
    tt_q_shapes: Sequence[int],
    tt_ranks: Sequence[int],
    batch_size: int,
    indices: jnp.ndarray,
    rowidx: jnp.ndarray,
    tableidx: Optional[jnp.ndarray],
    d_output: jnp.ndarray,
    precision=None,
) -> List[jnp.ndarray]:
    """Dense core gradients for a given output cotangent.

    Functional analog of ``tt_dense_backward`` (``tt_embeddings.cpp:133``):
    returns ``d_tt_cores`` (same shapes as cores) without touching optimizer
    state. Implemented as a VJP of :func:`tt_forward` — the gather's
    transpose is a deterministic scatter-add (the reference uses
    ``atomicAdd``, ``tt_embeddings_cuda.cu:362-377``).
    """
    def fwd(cores):
        return tt_forward(
            cores, tt_p_shapes, tt_q_shapes, tt_ranks, batch_size,
            indices, rowidx, tableidx, precision=precision,
        )

    _, vjp = jax.vjp(fwd, tuple(tt_cores))
    (grads,) = vjp(d_output.astype(tt_cores[0].dtype))
    return list(grads)
