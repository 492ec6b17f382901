"""Forward parity vs dense EmbeddingBag oracle (reference test_forward,
``tt_embeddings_test.py:62-107``)."""

import jax.numpy as jnp
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from fbtt_embedding_tpu import TTEmbeddingBag
from tests.utils import (
    embedding_bag_oracle,
    generate_sparse_feature,
    tt_test_shapes,
)


@given(
    batch_size=st.integers(min_value=20, max_value=120),
    pooling_factor=st.integers(min_value=1, max_value=10),
    pooling_factor_std=st.integers(min_value=0, max_value=20),
    tt_ndims=st.integers(min_value=2, max_value=4),
)
@settings(max_examples=10, deadline=None)
def test_forward(batch_size, pooling_factor, pooling_factor_std, tt_ndims):
    p, q, r, num_embeddings, embedding_dim = tt_test_shapes(tt_ndims)
    rng = np.random.default_rng(batch_size * 1000 + tt_ndims)
    indices, offsets = generate_sparse_feature(
        rng, batch_size, num_embeddings, pooling_factor, pooling_factor_std
    )
    tt_emb = TTEmbeddingBag(
        num_embeddings=num_embeddings,
        embedding_dim=embedding_dim,
        tt_p_shapes=p,
        tt_q_shapes=q,
        tt_ranks=r,
        sparse=False,
        use_cache=False,
        weight_dist="uniform",
    )
    full = tt_emb.full_weight()
    output = tt_emb(indices, offsets)
    output_ref = embedding_bag_oracle(full, indices, offsets, 1, batch_size)[0]
    np.testing.assert_allclose(
        np.asarray(output), np.asarray(output_ref), rtol=1e-5, atol=1e-5
    )


def test_forward_empty_bags():
    """Bags of length zero must produce zero rows (offsets duplicated)."""
    p, q, r, num_embeddings, embedding_dim = tt_test_shapes(3)
    tt_emb = TTEmbeddingBag(
        num_embeddings=num_embeddings,
        embedding_dim=embedding_dim,
        tt_p_shapes=p,
        tt_q_shapes=q,
        tt_ranks=r,
        sparse=False,
        use_cache=False,
        weight_dist="uniform",
    )
    indices = np.array([1, 2, 3], dtype=np.int64)
    offsets = np.array([0, 2, 2, 3, 3], dtype=np.int64)  # bags 1 and 3 empty
    out = tt_emb(indices, offsets)
    full = tt_emb.full_weight()
    assert out.shape == (4, embedding_dim)
    np.testing.assert_allclose(
        np.asarray(out[1]), np.zeros(embedding_dim), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(out[3]), np.zeros(embedding_dim), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(out[0]),
        np.asarray(full[1] + full[2]),
        rtol=1e-5,
        atol=1e-5,
    )


def test_forward_per_sample_weights():
    """Weighted pooling (generalizes the reference, which is sum-only)."""
    p, q, r, num_embeddings, embedding_dim = tt_test_shapes(2)
    tt_emb = TTEmbeddingBag(
        num_embeddings=num_embeddings,
        embedding_dim=embedding_dim,
        tt_p_shapes=p,
        tt_q_shapes=q,
        tt_ranks=r,
        sparse=False,
        use_cache=False,
        weight_dist="uniform",
    )
    indices = np.array([0, 5, 5, 7], dtype=np.int64)
    offsets = np.array([0, 2, 4], dtype=np.int64)
    w = np.array([0.5, 2.0, 1.0, -1.0], dtype=np.float32)
    out = tt_emb(indices, offsets, weights=jnp.asarray(w))
    full = np.asarray(tt_emb.full_weight())
    expect0 = 0.5 * full[0] + 2.0 * full[5]
    expect1 = 1.0 * full[5] - 1.0 * full[7]
    np.testing.assert_allclose(np.asarray(out[0]), expect0, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[1]), expect1, rtol=1e-5, atol=1e-5)
