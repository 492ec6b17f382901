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

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

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


def _gather_core(core, idx_t, tableidx):
    if core.shape[0] == 1 or tableidx is None:
        return core[0][idx_t]
    return core[tableidx, idx_t]


def _tt_partials(
    tt_cores, tt_p_shapes, tt_q_shapes, ranks, idx_parts, tableidx, precision
) -> List[jnp.ndarray]:
    """All chain partial products Z_0..Z_{T-1}; Z_t is [nnz, m_t * r_{t+1}]
    with m_t = q_0 * .. * q_t. Z_{T-1} is the rows (r_T == 1)."""
    ndim = len(tt_p_shapes)
    nnz = idx_parts[0].shape[0]
    z = [_gather_core(tt_cores[0], idx_parts[0], tableidx)]
    m = tt_q_shapes[0]
    for t in range(1, ndim):
        ct = _gather_core(tt_cores[t], idx_parts[t], tableidx).reshape(
            nnz, ranks[t], tt_q_shapes[t] * ranks[t + 1]
        )
        nxt = jax.lax.dot_general(
            z[-1].reshape(nnz, m, ranks[t]),
            ct,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            precision=precision,
            preferred_element_type=jnp.float32,
        )
        m *= tt_q_shapes[t]
        z.append(nxt.reshape(nnz, m * ranks[t + 1]))
    return z


def _tt_rows_impl(
    tt_cores, tt_p_shapes, tt_q_shapes, tt_ranks, idx_parts, tableidx,
    precision
) -> jnp.ndarray:
    ranks = validate_tt_shapes(tt_p_shapes, tt_q_shapes, tt_ranks)
    z = _tt_partials(
        tt_cores, tt_p_shapes, tt_q_shapes, ranks, idx_parts, tableidx,
        precision,
    )
    return z[-1]


def _onehot_scatter_grad(
    d_flat: jnp.ndarray,      # [nnz, W] per-lookup core-slice cotangents
    idx_t: jnp.ndarray,       # [nnz] core-t row index
    tableidx: Optional[jnp.ndarray],
    num_tables: int,
    p_t: int,
    precision,
) -> jnp.ndarray:
    """Accumulate per-lookup cotangents into a dense core gradient via a
    one-hot GEMM on the MXU.

    XLA's scatter-add on TPU serializes updates (~1ms for nnz=10k at the
    benchmark config); the mathematically identical
    ``one_hot(idx)^T @ d_flat`` runs as a single [P, nnz] x [nnz, W] MXU
    contraction (~30x faster measured) and is equally deterministic. This
    replaces the reference's ``atomicAdd`` scatter
    (``update_d_tt_cores_kernel``, ``tt_embeddings_cuda.cu:362-377``).
    """
    nnz = idx_t.shape[0]
    if num_tables > 1 and tableidx is not None:
        comb = tableidx * p_t + idx_t
        rows = num_tables * p_t
    else:
        comb = idx_t
        rows = p_t
    oh = (
        comb[:, None] == jnp.arange(rows, dtype=comb.dtype)[None, :]
    ).astype(d_flat.dtype)
    g = jax.lax.dot_general(
        oh, d_flat,
        dimension_numbers=(((0,), (0,)), ((), ())),
        precision=precision,
        preferred_element_type=jnp.float32,
    )
    return g.reshape(num_tables, p_t, d_flat.shape[-1])


@functools.lru_cache(maxsize=None)
def _make_tt_rows_vjp(
    tt_p_shapes: Tuple[int, ...],
    tt_q_shapes: Tuple[int, ...],
    ranks: Tuple[int, ...],
    has_tableidx: bool,
    precision,
    grad_precision,
):
    ndim = len(tt_p_shapes)

    def fwd_impl(cores, idx_parts, tableidx):
        return _tt_rows_impl(
            cores, tt_p_shapes, tt_q_shapes, ranks, idx_parts,
            tableidx if has_tableidx else None, precision,
        )

    @jax.custom_vjp
    def rows_fn(cores, idx_parts, tableidx):
        return fwd_impl(cores, idx_parts, tableidx)

    def rows_fwd(cores, idx_parts, tableidx):
        # Save only indices — partials are recomputed in the backward, the
        # reference's activation-recompute strategy
        # (tt_embeddings_cuda.cu:529-545).
        return fwd_impl(cores, idx_parts, tableidx), (
            cores, idx_parts, tableidx)

    def rows_bwd(res, d_rows):
        cores, idx_parts, tableidx = res
        tbl = tableidx if has_tableidx else None
        num_tables = cores[0].shape[0]
        nnz = idx_parts[0].shape[0]
        z = _tt_partials(
            cores, tt_p_shapes, tt_q_shapes, ranks, idx_parts, tbl, precision
        )
        m = 1
        ms = []
        for t in range(ndim):
            m *= tt_q_shapes[t]
            ms.append(m)
        d_cores = [None] * ndim
        d = d_rows  # [nnz, m_{T-1} * r_T]
        for t in range(ndim - 1, 0, -1):
            a = z[t - 1].reshape(nnz, ms[t - 1], ranks[t])
            dzt = d.reshape(nnz, ms[t - 1], tt_q_shapes[t] * ranks[t + 1])
            # dG_t[n] = A[n]^T @ dZ_t[n]  -> [nnz, r_t, q_t*r_{t+1}]
            dg = jax.lax.dot_general(
                a, dzt,
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                precision=precision,
                preferred_element_type=jnp.float32,
            )
            d_cores[t] = _onehot_scatter_grad(
                dg.reshape(nnz, -1), idx_parts[t], tbl, num_tables,
                tt_p_shapes[t], grad_precision,
            )
            # dZ_{t-1}[n] = dZ_t[n] @ G_t[n]^T -> [nnz, m_{t-1}, r_t]
            g = _gather_core(cores[t], idx_parts[t], tbl).reshape(
                nnz, ranks[t], tt_q_shapes[t] * ranks[t + 1]
            )
            d = jax.lax.dot_general(
                dzt, g,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                precision=precision,
                preferred_element_type=jnp.float32,
            ).reshape(nnz, ms[t - 1] * ranks[t])
        d_cores[0] = _onehot_scatter_grad(
            d, idx_parts[0], tbl, num_tables, tt_p_shapes[0], grad_precision
        )
        zero_idx = np.zeros((nnz,), dtype=jax.dtypes.float0)
        zero_parts = tuple(zero_idx for _ in range(ndim))
        return (tuple(d_cores), zero_parts,
                (zero_idx if has_tableidx else None))

    rows_fn.defvjp(rows_fwd, rows_bwd)
    return rows_fn


def tt_rows(
    tt_cores: Sequence[jnp.ndarray],
    tt_p_shapes: Sequence[int],
    tt_q_shapes: Sequence[int],
    tt_ranks: Sequence[int],
    indices: Optional[jnp.ndarray],
    tableidx: Optional[jnp.ndarray] = None,
    precision=None,
    grad_precision=jax.lax.Precision.HIGHEST,
    use_custom_vjp: bool = True,
    idx_parts: Optional[Sequence[jnp.ndarray]] = None,
) -> jnp.ndarray:
    """Reconstruct one embedding row per lookup.

    The reconstruction of row ``i`` with per-core indices ``(i_0, .., i_{T-1})``
    is the chain product ``G_0[i_0] @ G_1[i_1] @ ... @ G_{T-1}[i_{T-1}]`` where
    ``G_t[i_t]`` is ``[r_t * q_t, r_{t+1}]``-shaped after regrouping; the
    running operand grows its row dim ``m_t = q_0 * .. * q_t`` (same GEMM
    dims as the reference chain, ``tt_embeddings_cuda.cu:992-1004``).

    Differentiable wrt ``tt_cores``. By default the backward is a custom
    VJP that (a) recomputes the forward partials instead of saving them
    (reference recompute strategy) and (b) accumulates core grads with
    one-hot MXU GEMMs instead of XLA scatter-adds (see
    :func:`_onehot_scatter_grad`). ``use_custom_vjp=False`` falls back to
    plain autodiff (gather-transpose scatters) — kept for differential
    testing.

    Args:
      tt_cores: list of ``[num_tables, p_t, r_t * q_t * r_{t+1}]`` arrays.
      indices: ``[nnz]`` int row ids (or None when ``idx_parts`` given).
      tableidx: ``[nnz]`` int table ids, or None if num_tables == 1.
      idx_parts: optional precomputed per-core indices — the int64 row-id
        path (``prod(p) >= 2**31``) decomposes on the host
        (:func:`~fbtt_embedding_tpu.ops.indexing.decompose_indices64`)
        and passes the int32 parts here.

    Returns:
      ``[nnz, D]`` rows where ``D = prod(tt_q_shapes)``.
    """
    ranks = validate_tt_shapes(tt_p_shapes, tt_q_shapes, tt_ranks)
    if idx_parts is None:
        idx_parts = decompose_indices(indices, tt_p_shapes)
    idx_parts = tuple(idx_parts)
    if not use_custom_vjp:
        return _tt_rows_impl(
            tt_cores, tt_p_shapes, tt_q_shapes, ranks, idx_parts, tableidx,
            precision,
        )
    fn = _make_tt_rows_vjp(
        tuple(tt_p_shapes), tuple(tt_q_shapes), tuple(ranks),
        tableidx is not None, precision, grad_precision,
    )
    return fn(tuple(tt_cores), idx_parts, tableidx)


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
