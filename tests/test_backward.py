"""Backward parity: dense grads, fused SGD, fused Adagrad
(reference tests ``tt_embeddings_test.py:116-333``)."""

import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from fbtt_embedding_tpu import OptimType, TTEmbeddingBag
from tests.utils import (
    generate_sparse_feature,
    oracle_core_grads,
    tt_test_shapes,
)


def _make(tt_ndims, sparse, optimizer=OptimType.SGD, lr=0.1, eps=1e-10):
    p, q, r, num_embeddings, embedding_dim = tt_test_shapes(tt_ndims)
    emb = TTEmbeddingBag(
        num_embeddings=num_embeddings,
        embedding_dim=embedding_dim,
        tt_p_shapes=p,
        tt_q_shapes=q,
        tt_ranks=r,
        sparse=sparse,
        optimizer=optimizer,
        learning_rate=lr,
        eps=eps,
        use_cache=False,
        weight_dist="uniform",
    )
    return emb, p, q, num_embeddings, embedding_dim


@given(
    batch_size=st.integers(min_value=20, max_value=120),
    pooling_factor=st.integers(min_value=1, max_value=10),
    pooling_factor_std=st.integers(min_value=0, max_value=20),
    tt_ndims=st.integers(min_value=2, max_value=4),
)
@settings(max_examples=8, deadline=None)
def test_backward_dense(batch_size, pooling_factor, pooling_factor_std, tt_ndims):
    emb, p, q, num_embeddings, embedding_dim = _make(tt_ndims, sparse=False)
    rng = np.random.default_rng(batch_size * 7 + tt_ndims)
    indices, offsets = generate_sparse_feature(
        rng, batch_size, num_embeddings, pooling_factor, pooling_factor_std
    )
    d_output = jnp.asarray(
        rng.normal(size=(batch_size, embedding_dim)).astype(np.float32)
    )
    emb(indices, offsets)
    d_cores, d_cache = emb.backward(d_output)
    assert d_cache is None
    ref_grads = oracle_core_grads(
        emb.tt_cores, emb.tt_p_shapes, emb.tt_q_shapes, emb.tt_ranks,
        indices, offsets, batch_size, d_output,
    )
    for ours, ref in zip(d_cores, ref_grads):
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=1e-4
        )


@given(
    batch_size=st.integers(min_value=20, max_value=120),
    pooling_factor=st.integers(min_value=1, max_value=10),
    pooling_factor_std=st.integers(min_value=0, max_value=20),
    tt_ndims=st.integers(min_value=2, max_value=4),
    lr=st.sampled_from([0.01, 0.1, 1.0]),
)
@settings(max_examples=8, deadline=None)
def test_backward_sgd(batch_size, pooling_factor, pooling_factor_std, tt_ndims, lr):
    emb, p, q, num_embeddings, embedding_dim = _make(
        tt_ndims, sparse=True, optimizer=OptimType.SGD, lr=lr
    )
    rng = np.random.default_rng(batch_size * 13 + tt_ndims)
    indices, offsets = generate_sparse_feature(
        rng, batch_size, num_embeddings, pooling_factor, pooling_factor_std
    )
    d_output = jnp.asarray(
        rng.normal(size=(batch_size, embedding_dim)).astype(np.float32)
    )
    cores_before = [np.asarray(c) for c in emb.tt_cores]
    emb(indices, offsets)
    ref_grads = oracle_core_grads(
        emb.tt_cores, emb.tt_p_shapes, emb.tt_q_shapes, emb.tt_ranks,
        indices, offsets, batch_size, d_output,
    )
    ret = emb.backward(d_output)
    assert ret is None  # fused update, no grads returned
    for before, after, g in zip(cores_before, emb.tt_cores, ref_grads):
        expect = before - lr * np.asarray(g)
        np.testing.assert_allclose(
            np.asarray(after), expect, rtol=1e-4, atol=1e-4
        )


@given(
    batch_size=st.integers(min_value=20, max_value=120),
    pooling_factor=st.integers(min_value=1, max_value=10),
    pooling_factor_std=st.integers(min_value=0, max_value=20),
    tt_ndims=st.integers(min_value=2, max_value=4),
)
@settings(max_examples=8, deadline=None)
def test_backward_adagrad(batch_size, pooling_factor, pooling_factor_std, tt_ndims):
    lr, eps = 0.1, 1e-10
    emb, p, q, num_embeddings, embedding_dim = _make(
        tt_ndims, sparse=True, optimizer=OptimType.EXACT_ADAGRAD, lr=lr, eps=eps
    )
    rng = np.random.default_rng(batch_size * 17 + tt_ndims)
    indices, offsets = generate_sparse_feature(
        rng, batch_size, num_embeddings, pooling_factor, pooling_factor_std
    )
    d_output = jnp.asarray(
        rng.normal(size=(batch_size, embedding_dim)).astype(np.float32)
    )
    cores_before = [np.asarray(c) for c in emb.tt_cores]
    emb(indices, offsets)
    ref_grads = oracle_core_grads(
        emb.tt_cores, emb.tt_p_shapes, emb.tt_q_shapes, emb.tt_ranks,
        indices, offsets, batch_size, d_output,
    )
    emb.backward(d_output)
    for before, after, state, g in zip(
        cores_before, emb.tt_cores, emb.optimizer_state, ref_grads
    ):
        g = np.asarray(g)
        expect_state = g * g  # full-element Adagrad, zero-initialized state
        np.testing.assert_allclose(
            np.asarray(state), expect_state, rtol=1e-4, atol=1e-4
        )
        expect = before - lr * g / (np.sqrt(expect_state) + eps)
        np.testing.assert_allclose(
            np.asarray(after), expect, rtol=1e-4, atol=1e-4
        )


def test_sgd_two_steps_accumulate():
    """Fused updates compose across steps (state threading sanity)."""
    lr = 0.05
    emb, p, q, num_embeddings, embedding_dim = _make(
        3, sparse=True, optimizer=OptimType.SGD, lr=lr
    )
    rng = np.random.default_rng(0)
    indices, offsets = generate_sparse_feature(rng, 16, num_embeddings, 4, 2)
    d_output = jnp.asarray(
        rng.normal(size=(16, embedding_dim)).astype(np.float32)
    )
    c0 = [np.asarray(c) for c in emb.tt_cores]
    emb(indices, offsets)
    emb.backward(d_output)
    c1 = [np.asarray(c) for c in emb.tt_cores]
    emb(indices, offsets)
    emb.backward(d_output)
    c2 = [np.asarray(c) for c in emb.tt_cores]
    for a, b, c in zip(c0, c1, c2):
        assert not np.allclose(a, b)
        assert not np.allclose(b, c)
