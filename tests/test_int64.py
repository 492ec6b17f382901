"""int64 row-id support: tables with num_embeddings >= 2**31.

The reference casts indices to int64 (``tt_embeddings_ops.py:823``) and
keeps an int64 hash table. Here 64-bit mixed-radix decomposition happens
once on the host (``decompose_indices64``) and only int32 per-core
indices reach the device — no global jax x64 needed. Oracle: a
per-lookup numpy chain contraction (the full table cannot be
materialized at this scale).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fbtt_embedding_tpu import OptimType, TTEmbeddingBag
from fbtt_embedding_tpu.ops.indexing import (
    decompose_indices,
    decompose_indices64,
)

# prod(p) = 2048 * 2048 * 513 = 2,151,677,952 > 2**31
P = [2048, 2048, 513]
Q = [4, 4, 4]
RANKS = [8, 8]
E = int(np.prod(P))
D = int(np.prod(Q))


def _numpy_rows(emb, idx_parts):
    """Per-lookup chain contraction oracle from the module's cores."""
    g0 = np.asarray(emb.tt_cores[0])[0]  # [p0, q0*r1]
    g1 = np.asarray(emb.tt_cores[1])[0]  # [p1, r1*q1*r2]
    g2 = np.asarray(emb.tt_cores[2])[0]  # [p2, r2*q2]
    q0, q1, q2 = Q
    r1, r2 = RANKS
    rows = []
    for i0, i1, i2 in zip(*[np.asarray(p) for p in idx_parts]):
        a = g0[i0].reshape(q0, r1)
        b = g1[i1].reshape(r1, q1 * r2)
        c = g2[i2].reshape(r2, q2)
        z1 = a @ b  # [q0, q1*r2]
        pieces = [
            z1[:, k * r2:(k + 1) * r2] @ c for k in range(q1)
        ]  # each [q0, q2]
        rows.append(np.concatenate(pieces, axis=1).reshape(-1))
    return np.stack(rows)


def test_decompose_indices64_matches_radix():
    rng = np.random.default_rng(0)
    idx = rng.integers(0, E, size=64, dtype=np.int64)
    idx[0] = E - 1
    idx[1] = 2**31 + 12345  # above int32 range
    parts = decompose_indices64(idx, P)
    recon = (parts[0].astype(np.int64) * P[1] * P[2]
             + parts[1].astype(np.int64) * P[2]
             + parts[2].astype(np.int64))
    np.testing.assert_array_equal(recon, idx)


def test_decompose_indices_rejects_big_tables():
    with pytest.raises(ValueError, match="int32"):
        decompose_indices(jnp.zeros((4,), jnp.int32), P)


def test_big_e_forward_backward():
    emb = TTEmbeddingBag(
        num_embeddings=E, embedding_dim=D,
        tt_p_shapes=P, tt_q_shapes=Q, tt_ranks=RANKS,
        optimizer=OptimType.SGD, learning_rate=0.1, sparse=True,
        use_cache=False, weight_dist="uniform", seed=0,
    )
    assert emb._big_e
    rng = np.random.default_rng(1)
    b, L = 4, 3
    nnz = b * L
    indices = rng.integers(0, E, size=nnz, dtype=np.int64)
    indices[0] = E - 1
    indices[1] = 2**31 + 999  # exercises the >int32 range
    offsets = np.arange(0, nnz + 1, L, dtype=np.int64)

    out = emb(indices, offsets)
    parts = decompose_indices64(indices, P)
    rows = _numpy_rows(emb, parts)
    bag = np.repeat(np.arange(b), L)
    expect = np.zeros((b, D), np.float32)
    np.add.at(expect, bag, rows)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=2e-4, atol=2e-4)

    # fused SGD backward: core update == lr * numpy-chained grads; check
    # through a second forward on the same batch (w' rows differ by the
    # lr-scaled row gradient contraction, verified end-to-end instead of
    # per-core to keep the oracle simple)
    before = [np.asarray(c).copy() for c in emb.tt_cores]
    d_out = rng.standard_normal((b, D)).astype(np.float32) * 0.1
    ret = emb.backward(jnp.asarray(d_out))
    assert ret is None
    moved = any(
        not np.allclose(np.asarray(c), b0)
        for c, b0 in zip(emb.tt_cores, before)
    )
    assert moved
    for c in emb.tt_cores:
        assert np.isfinite(np.asarray(c)).all()

    # gradient correctness: compare against numpy autodiff-free oracle for
    # core 2 (smallest): dG2[i2] += sum_k z1_k^T @ d_row_k over lookups
    q0, q1, q2 = Q
    r1, r2 = RANKS
    g0 = before[0][0]
    g1 = before[1][0]
    dg2 = np.zeros((P[2], r2, q2), np.float32)
    for n, (i0, i1, i2) in enumerate(zip(*[np.asarray(p) for p in parts])):
        a = g0[i0].reshape(q0, r1)
        z1 = a @ g1[i1].reshape(r1, q1 * r2)  # [q0, q1*r2]
        drow = d_out[bag[n]].reshape(q0, q1, q2)
        for k in range(q1):
            dg2[i2] += z1[:, k * r2:(k + 1) * r2].T @ drow[:, k, :]
    expect_g2 = before[2][0] - 0.1 * dg2.reshape(P[2], r2 * q2)
    got_g2 = np.asarray(emb.tt_cores[2])[0]
    touched = np.unique(np.asarray(parts[2]))
    np.testing.assert_allclose(
        got_g2[touched], expect_g2[touched], rtol=2e-3, atol=2e-4)


def test_big_e_cache_requires_explicit_sizes():
    # big-E cache works (wide keys, tests/test_cache_int64.py) but the
    # dense 0.1E/E default sizing cannot apply — must be explicit
    with pytest.raises(AssertionError, match="2\\*\\*31"):
        TTEmbeddingBag(
            num_embeddings=E, embedding_dim=D,
            tt_p_shapes=P, tt_q_shapes=Q, tt_ranks=RANKS,
            use_cache=True, cache_size=8,  # hashtbl_size missing
        )


def test_big_e_fused_train_step_idx_parts():
    """make_fused_train_step accepts host-decomposed idx_parts (big-E
    production path) and matches the module path's update."""
    from fbtt_embedding_tpu import TTEmbeddingParams, make_fused_train_step

    emb = TTEmbeddingBag(
        num_embeddings=E, embedding_dim=D,
        tt_p_shapes=P, tt_q_shapes=Q, tt_ranks=RANKS,
        optimizer=OptimType.SGD, learning_rate=0.1, sparse=True,
        use_cache=False, weight_dist="uniform", seed=3,
    )
    rng = np.random.default_rng(4)
    b, L = 4, 3
    nnz = b * L
    indices = rng.integers(0, E, size=nnz, dtype=np.int64)
    indices[1] = 2**31 + 777
    offsets = np.arange(0, nnz + 1, L, dtype=np.int64)
    d_out = (rng.standard_normal((1, b, D)) * 0.1).astype(np.float32)

    parts = tuple(jnp.asarray(x) for x in decompose_indices64(indices, P))
    step = make_fused_train_step(P, Q, [1] + RANKS + [1], 1, b,
                                 OptimType.SGD)
    params = TTEmbeddingParams(
        tuple(jnp.copy(c) for c in emb.tt_cores),
        tuple(jnp.zeros((0,), jnp.float32) for _ in emb.tt_cores), None)
    out_s, new_params = step(
        params, parts, jnp.asarray(offsets.astype(np.int32)),
        jnp.asarray(d_out), (jnp.float32(0.1), jnp.float32(1e-10)))

    out_m = emb(indices, offsets)
    emb.backward(jnp.asarray(d_out[0]))
    np.testing.assert_allclose(np.asarray(out_s[0]), np.asarray(out_m),
                               rtol=1e-5, atol=1e-5)
    for a, b_ in zip(new_params.tt_cores, emb.tt_cores):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6)


def test_big_e_fused_step_rejects_parts_with_cache():
    from fbtt_embedding_tpu import make_fused_train_step

    step = make_fused_train_step(P, Q, [1] + RANKS + [1], 1, 4,
                                 OptimType.SGD, use_cache=True)
    with pytest.raises(ValueError, match="idx_parts"):
        step(None, (jnp.zeros((4,), jnp.int32),) * 3,
             jnp.zeros((5,), jnp.int32), jnp.zeros((1, 4, D)),
             (jnp.float32(0.1), jnp.float32(1e-10)))
