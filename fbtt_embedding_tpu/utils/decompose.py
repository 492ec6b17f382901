"""TT-SVD: decompose a trained dense embedding table into TT cores.

The reference package can only *train from scratch* — it has no way to
import an existing uncompressed ``[E, D]`` embedding table (the common
migration asset: a production model's trained table). This utility
closes that gap: :func:`tt_decompose` computes a tensor-train
approximation of a dense matrix in the exact storage layout the module
uses (``[p_t, r_t * q_t * r_{t+1}]`` per core, the inverse of
``ops/contraction.py::tt_matrix_to_full``'s even/odd interleave), so

    cores = tt_decompose(weight, p, q, ranks)
    emb.import_full_weight(weight)        # module convenience wrapper

drops a pretrained table into a ``TTEmbeddingBag`` and fine-tunes from
there. Standard TT-SVD (Oseledets 2011): reshape to the interleaved
``[p0, q0, p1, q1, ...]`` tensor, then a sweep of truncated SVDs — the
rank-``r`` truncation at each unfolding is the best Frobenius
approximation available to a left-to-right sweep.

Host-side numpy (one-time migration cost, not a training-path op): the
first unfolding of an 11M x 64 table is ~[800, 880k] — a few seconds of
LAPACK. Approximation error falls with the configured ranks; when the
requested rank exceeds an unfolding's true rank the cores are zero-padded
to the requested shape and the decomposition is exact.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np


def tt_decompose(
    weight,
    tt_p_shapes: Sequence[int],
    tt_q_shapes: Sequence[int],
    tt_ranks: Sequence[int],
) -> List[np.ndarray]:
    """TT cores (storage layout, fp32) approximating ``weight [E, D]``.

    ``E <= prod(tt_p_shapes)`` (extra rows are zero), ``D ==
    prod(tt_q_shapes)``; ``tt_ranks`` may be the internal ranks
    (len = ndim-1) or the full ``[1, ..., 1]`` vector. Returns one
    ``[p_t, r_t * q_t * r_{t+1}]`` array per core — wrap with a leading
    ``num_tables`` axis (or use ``import_full_weight``) for the module.
    """
    p = [int(v) for v in tt_p_shapes]
    q = [int(v) for v in tt_q_shapes]
    r = [int(v) for v in tt_ranks]
    if len(r) == len(p) - 1:
        r = [1] + r + [1]
    assert len(r) == len(p) + 1 and r[0] == 1 and r[-1] == 1, (p, r)
    w = np.asarray(weight, dtype=np.float32)
    e_full, d = int(np.prod(p)), int(np.prod(q))
    assert w.ndim == 2 and w.shape[1] == d, (w.shape, d)
    assert w.shape[0] <= e_full, (w.shape, e_full)
    if w.shape[0] < e_full:
        w = np.concatenate(
            [w, np.zeros((e_full - w.shape[0], d), np.float32)], axis=0)

    ndim = len(p)
    # [prod(p), prod(q)] -> [p0..pn, q0..qn] -> interleaved [p0,q0,p1,q1,..]
    t = w.reshape(p + q)
    perm = []
    for i in range(ndim):
        perm += [i, ndim + i]
    t = np.transpose(t, perm)

    cores: List[np.ndarray] = []
    carry = t.reshape(1, -1)  # [r0, everything]
    for i in range(ndim - 1):
        m = carry.reshape(r[i] * p[i] * q[i], -1)
        u, s, vt = np.linalg.svd(m, full_matrices=False)
        k = min(r[i + 1], u.shape[1])
        u, s, vt = u[:, :k], s[:k], vt[:k]
        if k < r[i + 1]:  # requested rank exceeds the unfolding's rank:
            # zero-pad to the module's storage shape; product unchanged
            u = np.pad(u, ((0, 0), (0, r[i + 1] - k)))
            sv = np.pad(s[:, None] * vt, ((0, r[i + 1] - k), (0, 0)))
        else:
            sv = s[:, None] * vt
        # canonical [r, p, q, r'] -> storage [p, r*q*r']
        core = u.reshape(r[i], p[i], q[i], r[i + 1])
        cores.append(
            np.ascontiguousarray(core.transpose(1, 0, 2, 3))
            .reshape(p[i], r[i] * q[i] * r[i + 1]))
        carry = sv
    core = carry.reshape(r[ndim - 1], p[-1], q[-1], r[ndim])
    cores.append(
        np.ascontiguousarray(core.transpose(1, 0, 2, 3))
        .reshape(p[-1], r[ndim - 1] * q[-1] * r[ndim]))
    return cores
