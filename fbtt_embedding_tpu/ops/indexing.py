"""Index preprocessing for TT embedding lookups.

TPU-native replacements for the reference's device-side index kernels:

- mixed-radix decomposition of row ids into per-core indices
  (reference: div/mod chains inside ``init_batch_gemm_*`` kernels,
  ``tt_embeddings_cuda.cu:795-799``) — here a vectorized ``(idx // L) % p``
  computed once per batch, fully fused by XLA.
- CSR offsets -> per-lookup (rowidx, tableidx)
  (reference: ``compute_rowidx_kernel``, ``tt_embeddings_cuda.cu:1338-1354``)
  — here a vectorized ``searchsorted`` over static-shape arrays.

Everything here is shape-static and jittable; there is no host/device sync
(the reference's ``preprocess_indices_sync`` D2H copy + stream sync,
``tt_embeddings_cuda.cu:1481-1488``, has no equivalent by design — the cache
partition is handled with masks instead, see ``ops/cache.py``).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def tt_strides(tt_p_shapes: Sequence[int]) -> np.ndarray:
    """Mixed-radix stride vector L with L[t] = prod(p[t+1:]).

    Matches the reference's ``L`` buffer (``tt_embeddings_ops.py:506-512``).
    """
    ndim = len(tt_p_shapes)
    strides = np.ones(ndim, dtype=np.int64)
    for t in range(ndim - 2, -1, -1):
        strides[t] = strides[t + 1] * tt_p_shapes[t + 1]
    return strides


def decompose_indices(
    indices: jnp.ndarray,
    tt_p_shapes: Sequence[int],
) -> List[jnp.ndarray]:
    """Decompose flat row ids into per-core indices.

    ``idx_t = (indices // L[t]) % p_t`` for each TT core t. Requires
    ``prod(p) < 2**31`` (device int32 arithmetic); for larger tables
    decompose on the host with :func:`decompose_indices64` and pass the
    parts down (``idx_parts=`` arguments).

    Args:
      indices: int array ``[nnz]`` of row ids in ``[0, prod(p))``.
      tt_p_shapes: the p-shape of each core.

    Returns:
      list of ``[nnz]`` int32 arrays, one per core.
    """
    if int(np.prod([int(p) for p in tt_p_shapes])) > np.iinfo(np.int32).max:
        raise ValueError(
            "prod(tt_p_shapes) exceeds int32; decompose row ids on the "
            "host with decompose_indices64 and pass idx_parts explicitly"
        )
    strides = tt_strides(tt_p_shapes)
    idx = indices.astype(jnp.int32)
    out = []
    for t, p in enumerate(tt_p_shapes):
        stride = int(strides[t])
        q = idx // stride if stride != 1 else idx
        out.append(q % p if t > 0 else q % p)
    return out


def decompose_indices64(
    indices: "np.ndarray",
    tt_p_shapes: Sequence[int],
) -> List["np.ndarray"]:
    """64-bit mixed-radix decomposition on the HOST (numpy int64).

    Supports ``prod(p) >= 2**31`` — the reference's int64 row-id range
    (``tt_embeddings_ops.py:823`` casts to long) — without enabling
    global jax x64: every per-core index fits int32 (``p_t < 2**31``),
    so the device never sees a 64-bit integer. The split happens once
    per batch at the module boundary, where the request tensors are host
    arrays anyway.

    Delegates to the native C++ loader when built (~10x faster than the
    numpy div/mod chain on large batches); numpy fallback otherwise.
    """
    from fbtt_embedding_tpu import native

    idx = np.asarray(indices, dtype=np.int64).reshape(-1)
    parts = native.decompose_indices64_np(idx, list(tt_p_shapes))
    return [parts[t] for t in range(len(tt_p_shapes))]


def pad_csr_to_fixed(
    indices,
    offsets,
    num_tables: int,
    batch_size: int,
    pooling_factor: int,
    weights=None,
) -> Tuple["np.ndarray", "np.ndarray"]:
    """Host-side CSR -> fixed-pooling re-layout for the sharded entries.

    The reference forward takes arbitrary CSR bags
    (``tt_embeddings_ops.py:821-874``); the mesh entries
    (``parallel/sharded.py``) take static ``[T, B, L]`` — this converts
    between them at line rate (native multithreaded C++ when built,
    numpy fallback): returns ``(idx [T, B, L] int32, w [T, B, L]
    float32)`` where pad slots carry index -1 (dropped by LFU counting
    in every cache mode, missed by probes) and weight 0 (zero
    contribution to forward and backward), so feeding the padded batch
    to :func:`parallel.sharded.make_sharded_fused_train_step` equals
    feeding the CSR batch to the single-device fused step. Raises if a
    bag exceeds ``pooling_factor``.
    """
    from fbtt_embedding_tpu import native

    return native.csr_to_padded_np(
        np.asarray(indices), np.asarray(offsets), num_tables, batch_size,
        pooling_factor,
        None if weights is None else np.asarray(weights))


def rowidx_from_offsets(
    offsets: jnp.ndarray,
    nnz: int,
    num_tables: int,
    batch_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Expand CSR offsets into per-lookup (rowidx, tableidx).

    Offsets are laid out table-major with ``num_tables * batch_size + 1``
    entries (reference semantics, ``tt_embeddings_cuda.cu:1338-1354``):
    bag ``b`` covers lookups ``offsets[b]:offsets[b+1]`` and belongs to
    table ``b // batch_size``, output row ``b % batch_size``.

    Args:
      offsets: ``[num_tables * batch_size + 1]`` int array.
      nnz: static number of lookups (``== offsets[-1]``).

    Returns:
      (rowidx ``[nnz]`` int32 in [0, B), tableidx ``[nnz]`` int32 in [0, T)).
    """
    offs = offsets.astype(jnp.int32)
    # bag id of each lookup = number of bag starts at or before it, found
    # by scattering a 1 at each interior bag boundary and prefix-summing —
    # ~25x faster on TPU than searchsorted (which is a sequential binary-
    # search while-loop), and handles empty bags (duplicate boundaries
    # accumulate).
    marks = jnp.zeros((nnz,), jnp.int32).at[offs[1:-1]].add(1, mode="drop")
    bag = jnp.cumsum(marks)
    bag = jnp.clip(bag, 0, num_tables * batch_size - 1)
    rowidx = bag % batch_size
    tableidx = bag // batch_size
    return rowidx, tableidx
