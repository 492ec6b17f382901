"""Inference serving path: make_serving_fn parity with the module forward."""

import jax.numpy as jnp
import numpy as np

from fbtt_embedding_tpu import TTEmbeddingBag
from fbtt_embedding_tpu.models.tt_embedding import make_serving_fn
from tests.utils import generate_sparse_feature, tt_test_shapes


def test_serving_matches_module_forward_with_cache():
    p, q, r, num_embeddings, embedding_dim = tt_test_shapes(3)
    rfull = [1] + r + [1]
    emb = TTEmbeddingBag(
        num_embeddings=num_embeddings, embedding_dim=embedding_dim,
        tt_p_shapes=p, tt_q_shapes=q, tt_ranks=r,
        use_cache=True, cache_size=16, hashtbl_size=num_embeddings,
        weight_dist="uniform", seed=2,
    )
    rng = np.random.default_rng(3)
    b = 8
    indices, offsets = generate_sparse_feature(
        rng, b, num_embeddings, 4, 2)
    emb(indices, offsets)
    emb.cache_populate()
    expect = emb(indices, offsets)
    assert emb.cache_hit_rate() > 0

    serve = make_serving_fn(p, q, rfull, num_tables=1, batch_size=b,
                            probe_cache=True)
    got = serve(emb.params, jnp.asarray(indices, jnp.int32),
                jnp.asarray(offsets, jnp.int32))
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(expect), rtol=2e-4, atol=2e-4)


def test_serving_no_cache():
    p, q, r, num_embeddings, embedding_dim = tt_test_shapes(3)
    rfull = [1] + r + [1]
    emb = TTEmbeddingBag(
        num_embeddings=num_embeddings, embedding_dim=embedding_dim,
        tt_p_shapes=p, tt_q_shapes=q, tt_ranks=r, use_cache=False,
        weight_dist="uniform", seed=4,
    )
    rng = np.random.default_rng(5)
    b = 8
    indices, offsets = generate_sparse_feature(rng, b, num_embeddings, 4, 2)
    expect = emb(indices, offsets)
    serve = make_serving_fn(p, q, rfull, num_tables=1, batch_size=b,
                            probe_cache=False)
    got = serve(emb.params, jnp.asarray(indices, jnp.int32),
                jnp.asarray(offsets, jnp.int32))
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(expect), rtol=2e-4, atol=2e-4)
