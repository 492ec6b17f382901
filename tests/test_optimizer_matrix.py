"""Full (OptimType x cache x sparse) sweep through forward+backward.

Round-1 verdict found the EXACT_ADAGRAD + sparse + cache cell crashing
(``cache_backward_rowwise_adagrad_approx`` broadcasting row-wise updates
into full [C, D] state); this sweeps every cell so no optimizer/cache/mode
combination can silently regress again. Reference dispatch being matched:
``tt_embeddings_ops.py:221-331`` (SGD/EXACT_SGD -> SGD kernel, everything
else -> Adagrad kernel; dense mode returns grads).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fbtt_embedding_tpu import OptimType, TTEmbeddingBag
from fbtt_embedding_tpu.models.tt_embedding import (
    TTEmbeddingParams,
    make_fused_train_step,
)
from fbtt_embedding_tpu.ops import cache as cache_ops
from tests.utils import generate_sparse_feature, tt_test_shapes

ALL_OPTIMS = list(OptimType)


def _make(optimizer, use_cache, sparse):
    p, q, r, num_embeddings, embedding_dim = tt_test_shapes(3)
    return TTEmbeddingBag(
        num_embeddings=num_embeddings,
        embedding_dim=embedding_dim,
        tt_p_shapes=p,
        tt_q_shapes=q,
        tt_ranks=r,
        optimizer=optimizer,
        learning_rate=0.05,
        sparse=sparse,
        use_cache=use_cache,
        cache_size=16,
        hashtbl_size=num_embeddings,
        weight_dist="uniform",
        seed=3,
    )


@pytest.mark.parametrize("optimizer", ALL_OPTIMS, ids=str)
@pytest.mark.parametrize("use_cache", [False, True], ids=["nocache", "cache"])
@pytest.mark.parametrize("sparse", [True, False], ids=["sparse", "dense"])
def test_forward_backward_cell(optimizer, use_cache, sparse):
    rng = np.random.default_rng(11)
    emb = _make(optimizer, use_cache, sparse)
    b = 8
    indices, offsets = generate_sparse_feature(
        rng, b, emb.num_embeddings, 4, 2
    )
    if use_cache:
        # Count, populate, and run post-warmup so cache hits actually occur.
        emb(indices, offsets)
        emb.cache_populate()
    out = emb(indices, offsets)
    assert out.shape == (b, emb.embedding_dim)
    assert np.isfinite(np.asarray(out)).all()
    d_out = jnp.asarray(
        rng.standard_normal((b, emb.embedding_dim)).astype(np.float32)
    )
    before = [np.asarray(c).copy() for c in emb.tt_cores]
    ret = emb.backward(d_out)
    if sparse:
        assert ret is None
        # fused update must have moved the cores
        moved = any(
            not np.allclose(np.asarray(c), b0)
            for c, b0 in zip(emb.tt_cores, before)
        )
        assert moved
        for c in emb.tt_cores:
            assert np.isfinite(np.asarray(c)).all()
        if use_cache and emb.cache is not None:
            assert np.isfinite(np.asarray(emb.cache.weight)).all()
            assert np.isfinite(np.asarray(emb.cache.opt_state)).all()
    else:
        d_cores, d_cache_weight = ret
        assert len(d_cores) == emb.tt_ndim
        for g, c in zip(d_cores, emb.tt_cores):
            assert g.shape == c.shape
            assert np.isfinite(np.asarray(g)).all()
        if use_cache:
            assert d_cache_weight is not None
            assert d_cache_weight.shape == emb.cache.weight.shape


@pytest.mark.parametrize(
    "optimizer",
    [OptimType.SGD, OptimType.EXACT_ADAGRAD, OptimType.EXACT_ROWWISE_ADAGRAD],
    ids=str,
)
def test_fused_train_step_with_populated_cache(optimizer):
    """make_fused_train_step(probe_cache=True) across cache-optimizer kinds —
    the round-1 mine was EXACT_ADAGRAD here."""
    p, q, r, num_embeddings, embedding_dim = tt_test_shapes(3)
    rfull = [1] + r + [1]
    emb = _make(optimizer, True, True)
    rng = np.random.default_rng(5)
    b = 8
    indices, offsets = generate_sparse_feature(rng, b, num_embeddings, 4, 2)
    emb(indices, offsets)
    emb.cache_populate()
    params = emb.params
    step = make_fused_train_step(
        p, q, rfull, num_tables=1, batch_size=b, optimizer=optimizer,
        use_cache=True, probe_cache=True,
    )
    d_out = jnp.asarray(
        rng.standard_normal((1, b, embedding_dim)).astype(np.float32) * 0.1
    )
    lr_eps = (jnp.float32(0.05), jnp.float32(1e-10))
    out, params = step(
        params, jnp.asarray(indices, jnp.int32),
        jnp.asarray(offsets, jnp.int32), d_out, lr_eps,
    )
    assert np.isfinite(np.asarray(out)).all()
    for c in params.tt_cores:
        assert np.isfinite(np.asarray(c)).all()
    assert np.isfinite(np.asarray(params.cache.weight)).all()
    assert np.isfinite(np.asarray(params.cache.opt_state)).all()


def test_fused_step_sampled_counting():
    """count=False skips the LFU freq scatter; count=True with
    count_interval=k scales increments by k. Outputs and core updates are
    identical either way (counting is policy state, not lookup math)."""
    p, q, r, num_embeddings, embedding_dim = tt_test_shapes(3)
    rfull = [1] + r + [1]
    emb = _make(OptimType.SGD, True, True)
    rng = np.random.default_rng(9)
    b = 8
    indices, offsets = generate_sparse_feature(rng, b, num_embeddings, 4, 2)
    d_out = jnp.asarray(
        rng.standard_normal((1, b, embedding_dim)).astype(np.float32) * 0.1
    )
    lr_eps = (jnp.float32(0.05), jnp.float32(1e-10))
    idx32 = jnp.asarray(indices, jnp.int32)
    off32 = jnp.asarray(offsets, jnp.int32)

    step = make_fused_train_step(
        p, q, rfull, num_tables=1, batch_size=b, optimizer=OptimType.SGD,
        use_cache=True, count_interval=3,
    )
    params0 = emb.params
    freq0 = np.asarray(params0.cache.freq)

    def fresh():
        # the step donates its params buffers; each call gets a copy
        return jax.tree.map(jnp.copy, params0)

    out_skip, p_skip = step(fresh(), idx32, off32, d_out, lr_eps,
                            count=False)
    np.testing.assert_array_equal(np.asarray(p_skip.cache.freq), freq0)

    out_cnt, p_cnt = step(fresh(), idx32, off32, d_out, lr_eps,
                          count=True)
    ref = cache_ops.update_cache_state(fresh().cache, idx32, scale=3)
    np.testing.assert_array_equal(
        np.asarray(p_cnt.cache.freq), np.asarray(ref.freq))
    np.testing.assert_allclose(
        np.asarray(out_skip), np.asarray(out_cnt), rtol=0, atol=0)
    for a, c in zip(p_skip.tt_cores, p_cnt.tt_cores):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=0, atol=0)


def test_exact_adagrad_cache_backward_oracle():
    """cache_backward_adagrad == aggregate-then-full-element Adagrad."""
    rng = np.random.default_rng(7)
    c_size, d, b = 6, 5, 4
    weight = rng.standard_normal((c_size, d)).astype(np.float32)
    opt = np.abs(rng.standard_normal((c_size, d))).astype(np.float32)
    state = cache_ops.CacheState(
        keys=jnp.zeros((0,), jnp.int32),
        freq=jnp.zeros((10,), jnp.int32),
        slots=jnp.zeros((10,), jnp.int32),
        weight=jnp.asarray(weight),
        opt_state=jnp.asarray(opt),
    )
    # nnz=6 lookups: rows 0,1,1,2 cached at locations 2,0,0,5; two misses
    locations = jnp.asarray([2, 0, 0, 5, -1, -1], jnp.int32)
    rowidx = jnp.asarray([0, 1, 1, 2, 0, 3], jnp.int32)
    d_output = jnp.asarray(
        rng.standard_normal((1, b, d)).astype(np.float32)
    )
    lr, eps = 0.1, 1e-8
    new = cache_ops.cache_backward_adagrad(
        state, d_output, locations, rowidx, lr, eps
    )
    # numpy oracle: aggregate per cache row, then s += G^2, w -= lr*G/(sqrt+e)
    g = np.zeros((c_size, d), np.float32)
    do = np.asarray(d_output)[0]
    for loc, row in [(2, 0), (0, 1), (0, 1), (5, 2)]:
        g[loc] += do[row]
    s2 = opt + g * g
    w2 = weight - lr * g / (np.sqrt(s2) + eps)
    np.testing.assert_allclose(np.asarray(new.opt_state), s2, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(new.weight), w2, rtol=1e-6)


def test_rowwise_rejects_full_state():
    state = cache_ops.make_cache_state(32, 4, 3, "full", num_embeddings=32)
    with pytest.raises(ValueError, match="row-wise"):
        cache_ops.cache_backward_rowwise_adagrad_approx(
            state, jnp.zeros((1, 2, 3)), jnp.zeros((5,), jnp.int32),
            jnp.zeros((5,), jnp.int32), 0.1, 1e-8,
        )


def test_exact_adagrad_rejects_rowwise_state():
    state = cache_ops.make_cache_state(32, 4, 3, "rowwise", num_embeddings=32)
    with pytest.raises(ValueError, match="full"):
        cache_ops.cache_backward_adagrad(
            state, jnp.zeros((1, 2, 3)), jnp.zeros((5,), jnp.int32),
            jnp.zeros((5,), jnp.int32), 0.1, 1e-8,
        )
