"""TT-core chain contraction: reconstruct embedding rows from TT cores.

TPU-native replacement for the reference's cuBLAS pointer-array batched GEMM
chain (``tt_embeddings_cuda.cu:39-77, 964-1075``). Instead of building device
pointer arrays per lookup, we gather core slices into dense batched operands
and contract with ``lax.dot_general`` batched over the lookup axis — XLA maps
the contraction onto the MXU and fuses the index arithmetic and gathers.

Core storage layout matches the reference (``tt_embeddings_ops.py:516-530``):
core ``t`` is ``[num_tables, p_t, r_t * q_t * r_{t+1}]`` with boundary ranks
``r_0 = r_T = 1``.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from fbtt_embedding_tpu.ops.indexing import decompose_indices


def validate_tt_shapes(
    tt_p_shapes: Sequence[int],
    tt_q_shapes: Sequence[int],
    tt_ranks: Sequence[int],
) -> List[int]:
    """Validate shapes; returns full rank vector [1, *tt_ranks, 1] if needed."""
    ndim = len(tt_p_shapes)
    if len(tt_ranks) == ndim - 1:
        tt_ranks = [1] + list(tt_ranks) + [1]
    assert len(tt_ranks) == ndim + 1, (tt_ranks, ndim)
    assert tt_ranks[0] == 1 and tt_ranks[-1] == 1
    assert len(tt_q_shapes) == ndim
    assert 2 <= ndim <= 4, f"tt_ndim must be in [2, 4], got {ndim}"
    assert all(v > 0 for v in tt_p_shapes)
    assert all(v > 0 for v in tt_q_shapes)
    assert all(v > 0 for v in tt_ranks)
    return list(tt_ranks)


def tt_rows(
    tt_cores: Sequence[jnp.ndarray],
    tt_p_shapes: Sequence[int],
    tt_q_shapes: Sequence[int],
    tt_ranks: Sequence[int],
    indices: jnp.ndarray,
    tableidx: Optional[jnp.ndarray] = None,
    precision=None,
) -> jnp.ndarray:
    """Reconstruct one embedding row per lookup.

    The reconstruction of row ``i`` with per-core indices ``(i_0, .., i_{T-1})``
    is the chain product ``G_0[i_0] @ G_1[i_1] @ ... @ G_{T-1}[i_{T-1}]`` where
    ``G_t[i_t]`` is ``[r_t * q_t, r_{t+1}]``-shaped after regrouping; the
    running operand grows its row dim ``m_t = q_0 * .. * q_t`` (same GEMM
    dims as the reference chain, ``tt_embeddings_cuda.cu:992-1004``).

    Args:
      tt_cores: list of ``[num_tables, p_t, r_t * q_t * r_{t+1}]`` arrays.
      indices: ``[nnz]`` int row ids.
      tableidx: ``[nnz]`` int table ids, or None if num_tables == 1.

    Returns:
      ``[nnz, D]`` rows where ``D = prod(tt_q_shapes)``.
    """
    ranks = validate_tt_shapes(tt_p_shapes, tt_q_shapes, tt_ranks)
    ndim = len(tt_p_shapes)
    nnz = indices.shape[0]
    idx_parts = decompose_indices(indices, tt_p_shapes)

    def gather_core(t: int) -> jnp.ndarray:
        core = tt_cores[t]
        if core.shape[0] == 1 or tableidx is None:
            return core[0][idx_parts[t]]
        return core[tableidx, idx_parts[t]]

    # [nnz, q0 * r1]  (r0 == 1)
    res = gather_core(0)
    m = tt_q_shapes[0]
    for t in range(1, ndim):
        # [nnz, r_t, q_t * r_{t+1}]
        ct = gather_core(t).reshape(nnz, ranks[t], tt_q_shapes[t] * ranks[t + 1])
        # [nnz, m, r_t] x [nnz, r_t, q_t * r_{t+1}] -> [nnz, m, q_t * r_{t+1}]
        res = jax.lax.dot_general(
            res.reshape(nnz, m, ranks[t]),
            ct,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            precision=precision,
            preferred_element_type=jnp.float32,
        )
        m *= tt_q_shapes[t]
        res = res.reshape(nnz, m * ranks[t + 1])
    return res.reshape(nnz, m)


def tt_matrix_to_full(
    tt_p_shapes: Sequence[int],
    tt_q_shapes: Sequence[int],
    tt_ranks: Sequence[int],
    tt_cores: Sequence[jnp.ndarray],
    table: int = 0,
) -> jnp.ndarray:
    """Materialize the full ``[prod(p), prod(q)]`` matrix from TT cores.

    Mirrors the reference's ``tt_matrix_to_full`` (``tt_embeddings_ops.py:
    80-127``): sequential contraction over ranks followed by the even/odd
    (p, q)-axis interleave permutation. ``tt_cores`` are in module storage
    layout ``[num_tables, p_t, r_t * q_t * r_{t+1}]``; ``table`` selects
    which table to materialize.
    """
    ranks = validate_tt_shapes(tt_p_shapes, tt_q_shapes, tt_ranks)
    ndim = len(tt_p_shapes)
    # Core t in [p, r, q, r'] storage -> canonical [r, p, q, r'].
    cores = []
    for t in range(ndim):
        c = tt_cores[t][table].reshape(
            tt_p_shapes[t], ranks[t], tt_q_shapes[t], ranks[t + 1]
        )
        cores.append(jnp.transpose(c, (1, 0, 2, 3)))
    res = cores[0]
    for t in range(1, ndim):
        res = res.reshape(-1, ranks[t]) @ cores[t].reshape(ranks[t], -1)
    # res is [p0, q0, p1, q1, ...]; permute to [p0, p1, .., q0, q1, ..].
    interleaved = []
    for t in range(ndim):
        interleaved += [tt_p_shapes[t], tt_q_shapes[t]]
    res = res.reshape(interleaved)
    perm = list(range(0, 2 * ndim, 2)) + list(range(1, 2 * ndim, 2))
    res = jnp.transpose(res, perm)
    n = 1
    d = 1
    for t in range(ndim):
        n *= tt_p_shapes[t]
        d *= tt_q_shapes[t]
    return res.reshape(n, d)
