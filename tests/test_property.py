"""Property-based differential tests against a dense EmbeddingBag oracle.

Port of the reference's test strategy (``tt_embeddings_test.py:55-333``):
hypothesis-driven randomized configs, oracle = materialized full table +
plain gather/segment-sum, checking forward equality, dense gradients, and
the fused SGD/Adagrad updates. Parameter ranges mirror the reference
(scaled down for CPU CI speed; the reference runs 20 examples on GPU only —
this suite runs everywhere).
"""

import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

from fbtt_embedding_tpu import OptimType, TTEmbeddingBag, TableBatchedTTEmbeddingBag
from tests.utils import embedding_bag_oracle, generate_sparse_feature

# fixed prime-ish shapes, truncated per ndim (reference :65-70)
P_SHAPES = [7, 9, 11, 5]
Q_SHAPES = [3, 4, 5, 7]
RANKS = [8, 8, 8]

SETTINGS = dict(max_examples=5, deadline=None)


def make_module(tt_ndim, num_tables=1, **kw):
    p = P_SHAPES[:tt_ndim]
    q = Q_SHAPES[:tt_ndim]
    r = RANKS[: tt_ndim - 1]
    e = int(np.prod(p))
    d = int(np.prod(q))
    cls = TTEmbeddingBag if num_tables == 1 else TableBatchedTTEmbeddingBag
    args = (e, d, r) if num_tables == 1 else (num_tables, e, d, r)
    return cls(
        *args, tt_p_shapes=p, tt_q_shapes=q, weight_dist="uniform",
        use_cache=False, **kw,
    ), e, d


@settings(**SETTINGS)
@given(
    batch_size=st.integers(20, 50),
    pooling_factor=st.integers(1, 10),
    pooling_std=st.integers(0, 5),
    tt_ndim=st.integers(2, 4),
    seed=st.integers(0, 2**16),
)
def test_forward_property(batch_size, pooling_factor, pooling_std, tt_ndim,
                          seed):
    emb, e, d = make_module(tt_ndim, seed=seed % 97)
    rng = np.random.default_rng(seed)
    indices, offsets = generate_sparse_feature(
        rng, batch_size, e, pooling_factor, pooling_std)
    out = np.asarray(emb(indices, offsets))
    ref = np.asarray(embedding_bag_oracle(
        emb.full_weight(), indices, offsets, 1, batch_size))[0]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


@settings(**SETTINGS)
@given(
    batch_size=st.integers(20, 40),
    pooling_factor=st.integers(1, 6),
    tt_ndim=st.integers(2, 4),
    lr=st.floats(0.01, 0.3),
    seed=st.integers(0, 2**16),
)
def test_backward_sgd_property(batch_size, pooling_factor, tt_ndim, lr, seed):
    """Fused update equals w - lr*g with oracle grads pushed through
    tt_matrix_to_full (reference test_backward_sgd, :183-246)."""
    import jax

    from fbtt_embedding_tpu.ops.contraction import tt_matrix_to_full

    emb, e, d = make_module(
        tt_ndim, optimizer=OptimType.SGD, learning_rate=lr, sparse=True,
        seed=seed % 89)
    rng = np.random.default_rng(seed)
    indices, offsets = generate_sparse_feature(
        rng, batch_size, e, pooling_factor, 2)
    cores_before = [np.asarray(c).copy() for c in emb.tt_cores]
    shapes = (emb.tt_p_shapes, emb.tt_q_shapes, emb.tt_ranks)

    out = emb(indices, offsets)
    d_out = rng.normal(size=(batch_size, d)).astype(np.float32)
    emb.backward(jnp.asarray(d_out))

    # oracle core grads: d_full -> vjp through tt_matrix_to_full
    rowidx = np.repeat(
        np.arange(batch_size), np.diff(np.asarray(offsets)).astype(int))
    d_full = np.zeros((int(np.prod(shapes[0])), d), np.float32)
    np.add.at(d_full, np.asarray(indices), d_out[rowidx])

    def full_fn(cores):
        return tt_matrix_to_full(*shapes, cores)

    _, vjp = jax.vjp(full_fn, tuple(jnp.asarray(c) for c in cores_before))
    (gref,) = vjp(jnp.asarray(d_full))
    for c_new, c_old, g in zip(emb.tt_cores, cores_before, gref):
        np.testing.assert_allclose(
            np.asarray(c_new), c_old - lr * np.asarray(g),
            rtol=1e-4, atol=1e-5)


@settings(**SETTINGS)
@given(
    batch_size=st.integers(20, 40),
    pooling_factor=st.integers(1, 6),
    tt_ndim=st.integers(2, 3),
    num_tables=st.integers(2, 4),
    seed=st.integers(0, 2**16),
)
def test_table_batched_forward_property(batch_size, pooling_factor, tt_ndim,
                                        num_tables, seed):
    """Batched output[i] equals a per-table module's output
    (reference test_forward_table_batched, :343-425)."""
    emb, e, d = make_module(tt_ndim, num_tables=num_tables, seed=seed % 83)
    rng = np.random.default_rng(seed)
    parts = []
    offs_parts = [np.zeros(1, np.int64)]
    for t in range(num_tables):
        idx_t, offs_t = generate_sparse_feature(
            rng, batch_size, e, pooling_factor, 2)
        parts.append(np.asarray(idx_t))
        offs_parts.append(np.asarray(offs_t)[1:] + int(offs_parts[-1][-1]))
    indices = np.concatenate(parts)
    offsets = np.concatenate(offs_parts)
    out = np.asarray(emb(indices, offsets))
    assert out.shape == (num_tables, batch_size, d)
    from fbtt_embedding_tpu.ops.contraction import tt_matrix_to_full
    for t in range(num_tables):
        full = tt_matrix_to_full(
            emb.tt_p_shapes, emb.tt_q_shapes, emb.tt_ranks,
            [jnp.asarray(c) for c in emb.tt_cores], table=t)
        lo, hi = offsets[t * batch_size], offsets[(t + 1) * batch_size]
        offs_t = offsets[t * batch_size:(t + 1) * batch_size + 1] - lo
        ref = np.asarray(embedding_bag_oracle(
            full, indices[lo:hi], offs_t, 1, batch_size))[0]
        np.testing.assert_allclose(out[t], ref, rtol=1e-4, atol=1e-4)


@settings(max_examples=30, deadline=None)
@given(
    ndim=st.integers(2, 4),
    qs=st.lists(st.integers(1, 8), min_size=4, max_size=4),
    rs=st.lists(st.integers(1, 40), min_size=3, max_size=3),
    b=st.integers(1, 70),
)
def test_flat_pad_plan_satisfies_tiling_gates(ndim, qs, rs, b):
    """For any shape, the pad plan (when one exists) yields lane-aligned
    block widths at every pass — the property `pallas_sorted_available`
    relies on (span-cap / VMEM gates aside, which use small fixed p here).
    """
    from fbtt_embedding_tpu.ops.lookup import flat_pad_plan

    q = qs[:ndim]
    r = [1] + rs[: ndim - 1] + [1]
    p = [5] * ndim
    plan = flat_pad_plan(p, q, r, b)
    if plan is None:
        rp, qlp, bp = tuple(r), q[-1], b
    else:
        rp, qlp, bp = plan
    qq = list(q[:-1]) + [qlp]
    # replicate the kernel gates directly
    assert (qq[0] * rp[1]) % 8 == 0
    mm = 1
    for t in range(1, ndim):
        bw_in = mm * rp[t]
        mm *= qq[t]
        bw_out = mm * (rp[t + 1] if t < ndim - 1 else 1)
        assert bw_in % 8 == 0, (t, bw_in)
        assert bw_out % 8 == 0, (t, bw_out)
    assert bp % 8 == 0
    # padding never shrinks anything
    for a, b_ in zip(rp, r):
        assert a >= b_
    assert qlp >= q[-1] and bp >= b


def test_make_hybrid_mesh_single_process():
    from fbtt_embedding_tpu.parallel.multihost import make_hybrid_mesh

    mesh = make_hybrid_mesh(mp=2)
    assert mesh.shape["mp"] == 2 and mesh.shape["dp"] == 4
    mesh1 = make_hybrid_mesh(dp=8, mp=1)
    assert mesh1.shape["dp"] == 8
