"""Coverage for the functional/public APIs not exercised elsewhere:
tt_embedding_forward, preprocess_indices, tt_forward/tt_embedding_bag_forward."""

import jax.numpy as jnp
import numpy as np

from fbtt_embedding_tpu import (
    TTEmbeddingBag,
    tt_dense_backward,
    tt_embedding_bag_forward,
    tt_forward,
)
from fbtt_embedding_tpu.models.tt_embedding import (
    TTEmbeddingParams,
    tt_embedding_forward,
)
from fbtt_embedding_tpu.ops import cache as cache_ops
from fbtt_embedding_tpu.ops.indexing import rowidx_from_offsets
from tests.utils import embedding_bag_oracle, generate_sparse_feature, tt_test_shapes


def test_tt_embedding_forward_with_cache_locations():
    p, q, r, e, d = tt_test_shapes(3)
    emb = TTEmbeddingBag(
        num_embeddings=e, embedding_dim=d, tt_p_shapes=p, tt_q_shapes=q,
        tt_ranks=r, use_cache=True, cache_size=8, weight_dist="uniform")
    emb.update_cache(jnp.asarray([3] * 9))
    emb.cache_populate()
    rng = np.random.default_rng(0)
    indices, offsets = generate_sparse_feature(rng, 16, e, 4, 1)
    nnz = len(indices)
    rowidx, tableidx = rowidx_from_offsets(
        jnp.asarray(offsets), nnz, 1, 16)
    _, _, _, locations = cache_ops.preprocess_indices(
        jnp.asarray(indices), jnp.asarray(offsets), 1, 16,
        warmup=False, cache_state=emb.cache)
    params = TTEmbeddingParams(
        tuple(emb.tt_cores), tuple(emb.optimizer_state), emb.cache)
    out = tt_embedding_forward(
        params, p, q, emb.tt_ranks, 16, jnp.asarray(indices), rowidx, None,
        cache_locations=locations)
    ref = embedding_bag_oracle(emb.full_weight(), indices, offsets, 1, 16)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_preprocess_indices_warmup_all_tt():
    p, q, r, e, d = tt_test_shapes(2)
    state = cache_ops.make_cache_state(64, 4, d)
    idx = jnp.asarray([1, 2, 3], jnp.int32)
    offs = jnp.asarray([0, 2, 3], jnp.int32)
    _, rowidx, tableidx, loc = cache_ops.preprocess_indices(
        idx, offs, 1, 2, warmup=True, cache_state=state)
    assert (np.asarray(loc) == -1).all()
    np.testing.assert_array_equal(np.asarray(rowidx), [0, 0, 1])


def test_tt_forward_and_dense_backward_functional():
    p, q, r, e, d = tt_test_shapes(3)
    emb = TTEmbeddingBag(
        num_embeddings=e, embedding_dim=d, tt_p_shapes=p, tt_q_shapes=q,
        tt_ranks=r, use_cache=False, weight_dist="uniform")
    rng = np.random.default_rng(1)
    indices, offsets = generate_sparse_feature(rng, 8, e, 3, 1)
    out = tt_embedding_bag_forward(
        tuple(emb.tt_cores), p, q, emb.tt_ranks,
        jnp.asarray(indices), jnp.asarray(offsets), 8)
    ref = embedding_bag_oracle(emb.full_weight(), indices, offsets, 1, 8)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
    nnz = len(indices)
    rowidx, _ = rowidx_from_offsets(jnp.asarray(offsets), nnz, 1, 8)
    d_out = jnp.ones((1, 8, d), jnp.float32)
    grads = tt_dense_backward(
        tuple(emb.tt_cores), p, q, emb.tt_ranks, 8,
        jnp.asarray(indices), rowidx, None, d_out)
    assert len(grads) == 3
    for g, c in zip(grads, emb.tt_cores):
        assert g.shape == c.shape
        assert np.isfinite(np.asarray(g)).all()
