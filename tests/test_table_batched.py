"""Table-batched parity: batched output/grads match per-table modules
(reference ``tt_embeddings_test.py:343-525``)."""

import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from fbtt_embedding_tpu import OptimType, TableBatchedTTEmbeddingBag
from fbtt_embedding_tpu.models.tt_embedding import TTEmbeddingBag
from tests.utils import (
    embedding_bag_oracle,
    generate_sparse_feature,
    oracle_core_grads,
    tt_test_shapes,
)


def _make_batched(num_tables, tt_ndims, sparse, optimizer=OptimType.SGD):
    p, q, r, num_embeddings, embedding_dim = tt_test_shapes(tt_ndims)
    emb = TableBatchedTTEmbeddingBag(
        num_tables=num_tables,
        num_embeddings=num_embeddings,
        embedding_dim=embedding_dim,
        tt_p_shapes=p,
        tt_q_shapes=q,
        tt_ranks=r,
        sparse=sparse,
        optimizer=optimizer,
        use_cache=False,
        weight_dist="uniform",
    )
    return emb, p, q, r, num_embeddings, embedding_dim


def _per_table_cores(batched, table):
    """Slice table t's cores into standalone [1, p, rqr] cores."""
    return [c[table : table + 1] for c in batched.tt_cores]


@given(
    batch_size=st.integers(min_value=16, max_value=64),
    pooling_factor=st.integers(min_value=1, max_value=8),
    tt_ndims=st.integers(min_value=2, max_value=4),
    num_tables=st.integers(min_value=1, max_value=4),
)
@settings(max_examples=8, deadline=None)
def test_forward_table_batched(batch_size, pooling_factor, tt_ndims, num_tables):
    emb, p, q, r, num_embeddings, embedding_dim = _make_batched(
        num_tables, tt_ndims, sparse=False
    )
    rng = np.random.default_rng(batch_size + 31 * num_tables)
    indices, offsets = generate_sparse_feature(
        rng, batch_size, num_embeddings, pooling_factor, 2.0,
        num_tables=num_tables,
    )
    output = emb(indices, offsets)
    assert output.shape == (num_tables, batch_size, embedding_dim)
    # Each table must match a dense oracle built from that table's cores.
    from fbtt_embedding_tpu.ops.contraction import tt_matrix_to_full

    for t in range(num_tables):
        full_t = tt_matrix_to_full(p, q, emb.tt_ranks, emb.tt_cores, table=t)
        lo, hi = offsets[t * batch_size], offsets[(t + 1) * batch_size]
        idx_t = indices[lo:hi]
        offs_t = offsets[t * batch_size : (t + 1) * batch_size + 1] - lo
        ref = embedding_bag_oracle(full_t, idx_t, offs_t, 1, batch_size)[0]
        np.testing.assert_allclose(
            np.asarray(output[t]), np.asarray(ref), rtol=1e-5, atol=1e-5
        )


@given(
    batch_size=st.integers(min_value=16, max_value=48),
    pooling_factor=st.integers(min_value=1, max_value=6),
    tt_ndims=st.integers(min_value=2, max_value=3),
    num_tables=st.integers(min_value=2, max_value=4),
)
@settings(max_examples=6, deadline=None)
def test_backward_table_batched(batch_size, pooling_factor, tt_ndims, num_tables):
    emb, p, q, r, num_embeddings, embedding_dim = _make_batched(
        num_tables, tt_ndims, sparse=False
    )
    rng = np.random.default_rng(batch_size + 77 * num_tables)
    indices, offsets = generate_sparse_feature(
        rng, batch_size, num_embeddings, pooling_factor, 2.0,
        num_tables=num_tables,
    )
    d_output = jnp.asarray(
        rng.normal(size=(num_tables, batch_size, embedding_dim)).astype(
            np.float32
        )
    )
    emb(indices, offsets)
    d_cores, _ = emb.backward(d_output)
    for t in range(num_tables):
        cores_t = _per_table_cores(emb, t)
        lo, hi = offsets[t * batch_size], offsets[(t + 1) * batch_size]
        idx_t = indices[lo:hi]
        offs_t = offsets[t * batch_size : (t + 1) * batch_size + 1] - lo
        ref_grads = oracle_core_grads(
            cores_t, p, q, emb.tt_ranks, idx_t, offs_t, batch_size,
            d_output[t],
        )
        for ours, ref in zip(d_cores, ref_grads):
            np.testing.assert_allclose(
                np.asarray(ours[t]), np.asarray(ref[0]),
                rtol=1e-4, atol=1e-4,
            )
