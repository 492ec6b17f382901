"""LFU cache subsystem tests — coverage the reference never had
(SURVEY §4: no cache-path tests exist upstream)."""

import jax
import jax.numpy as jnp
import numpy as np

from fbtt_embedding_tpu import OptimType, TTEmbeddingBag
from fbtt_embedding_tpu.ops import cache as cache_ops
from tests.utils import (
    embedding_bag_oracle,
    generate_sparse_feature,
    tt_test_shapes,
)


def _counts(indices):
    vals, cnts = np.unique(np.asarray(indices), return_counts=True)
    return dict(zip(vals.tolist(), cnts.tolist()))


def test_update_cache_state_counts():
    """Frequency counting matches exact counts when the table is roomy."""
    state = cache_ops.make_cache_state(hashtbl_size=1024, cache_size=16,
                                       embedding_dim=8)
    rng = np.random.default_rng(0)
    indices = rng.integers(0, 50, size=300).astype(np.int32)
    state = cache_ops.update_cache_state(state, jnp.asarray(indices))
    # second batch accumulates
    indices2 = rng.integers(0, 50, size=200).astype(np.int32)
    state = cache_ops.update_cache_state(state, jnp.asarray(indices2))
    expect = _counts(np.concatenate([indices, indices2]))
    keys = np.asarray(state.keys)
    freq = np.asarray(state.freq)
    got = {int(k): int(f) for k, f in zip(keys, freq) if k != -1}
    assert got == expect


def test_update_cache_state_is_deterministic():
    state0 = cache_ops.make_cache_state(64, 8, 4)
    idx = jnp.asarray(np.random.default_rng(1).integers(0, 500, 256),
                      dtype=jnp.int32)
    s1 = cache_ops.update_cache_state(state0, idx)
    s2 = cache_ops.update_cache_state(state0, idx)
    np.testing.assert_array_equal(np.asarray(s1.keys), np.asarray(s2.keys))
    np.testing.assert_array_equal(np.asarray(s1.freq), np.asarray(s2.freq))


def test_cache_populate_and_lookup():
    p, q, r, num_embeddings, embedding_dim = tt_test_shapes(3)
    emb = TTEmbeddingBag(
        num_embeddings=num_embeddings, embedding_dim=embedding_dim,
        tt_p_shapes=p, tt_q_shapes=q, tt_ranks=r,
        use_cache=True, cache_size=8, hashtbl_size=256,
        weight_dist="uniform",
    )
    # Hot rows 3 and 7, cold rows random.
    hot = np.array([3] * 50 + [7] * 30, dtype=np.int64)
    cold = np.arange(20, 40, dtype=np.int64)
    emb.update_cache(jnp.asarray(np.concatenate([hot, cold])))
    emb.cache_populate()
    assert not emb.warmup
    loc = cache_ops.cache_lookup(emb.cache, jnp.asarray([3, 7, 100]))
    loc = np.asarray(loc)
    assert loc[0] == 0  # most frequent row gets cache slot 0
    assert loc[1] == 1
    assert loc[2] == -1
    # Cached weights equal the decompressed rows.
    full = np.asarray(emb.full_weight())
    w = np.asarray(emb.cache.weight)
    np.testing.assert_allclose(w[0], full[3], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(w[1], full[7], rtol=1e-5, atol=1e-6)


def test_cached_forward_matches_uncached():
    """Right after populate, the cached path must be numerically equal to
    the pure-TT path."""
    p, q, r, num_embeddings, embedding_dim = tt_test_shapes(3)
    rng = np.random.default_rng(3)
    indices, offsets = generate_sparse_feature(rng, 32, num_embeddings, 6, 3)

    kwargs = dict(
        num_embeddings=num_embeddings, embedding_dim=embedding_dim,
        tt_p_shapes=p, tt_q_shapes=q, tt_ranks=r,
        weight_dist="uniform", seed=7,
    )
    cached = TTEmbeddingBag(use_cache=True, cache_size=32,
                            hashtbl_size=1024, **kwargs)
    plain = TTEmbeddingBag(use_cache=False, **kwargs)
    # same init (same seed)
    for a, b in zip(cached.tt_cores, plain.tt_cores):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    out_warm = cached(indices, offsets)  # warmup: pure TT path
    out_plain = plain(indices, offsets)
    np.testing.assert_allclose(
        np.asarray(out_warm), np.asarray(out_plain), rtol=1e-6, atol=1e-6
    )
    cached.cache_populate()
    out_cached = cached(indices, offsets)  # now cache-served for hot rows
    assert (np.asarray(cache_ops.cache_lookup(
        cached.cache, jnp.asarray(indices))) >= 0).any()
    np.testing.assert_allclose(
        np.asarray(out_cached), np.asarray(out_plain), rtol=1e-5, atol=1e-5
    )


def test_cached_backward_sgd_routes_grads():
    """Cache-served lookups update cache_weight; TT cores receive no grad
    from them (the reference's partition semantics, done with masks)."""
    p, q, r, num_embeddings, embedding_dim = tt_test_shapes(2)
    emb = TTEmbeddingBag(
        num_embeddings=num_embeddings, embedding_dim=embedding_dim,
        tt_p_shapes=p, tt_q_shapes=q, tt_ranks=r,
        optimizer=OptimType.SGD, learning_rate=0.5, sparse=True,
        use_cache=True, cache_size=4, hashtbl_size=128,
        weight_dist="uniform",
    )
    # Make row 5 hot and cached.
    emb.update_cache(jnp.asarray([5] * 10))
    emb.cache_populate()
    w_before = np.asarray(emb.cache.weight).copy()
    cores_before = [np.asarray(c).copy() for c in emb.tt_cores]

    # A batch looking up ONLY the cached row.
    indices = np.array([5, 5], dtype=np.int64)
    offsets = np.array([0, 1, 2], dtype=np.int64)
    out = emb(indices, offsets)
    d_out = np.ones((2, embedding_dim), np.float32)
    emb.backward(jnp.asarray(d_out))
    # Cores untouched (all lookups cache-served).
    for b, a in zip(cores_before, emb.tt_cores):
        np.testing.assert_array_equal(b, np.asarray(a))
    # Cached row got w -= lr * sum(d_rows).
    w_after = np.asarray(emb.cache.weight)
    loc = int(np.asarray(cache_ops.cache_lookup(emb.cache, jnp.asarray([5])))[0])
    expect = w_before[loc] - 0.5 * (d_out[0] + d_out[1])
    np.testing.assert_allclose(w_after[loc], expect, rtol=1e-6, atol=1e-6)


def test_cached_backward_mixed_paths():
    """Mixed batch: TT rows' grads hit cores, cached rows' grads hit cache."""
    p, q, r, num_embeddings, embedding_dim = tt_test_shapes(2)
    emb = TTEmbeddingBag(
        num_embeddings=num_embeddings, embedding_dim=embedding_dim,
        tt_p_shapes=p, tt_q_shapes=q, tt_ranks=r,
        optimizer=OptimType.SGD, learning_rate=0.1, sparse=True,
        use_cache=True, cache_size=4, hashtbl_size=128,
        weight_dist="uniform",
    )
    emb.update_cache(jnp.asarray([9] * 20))
    emb.cache_populate()
    cores_before = [np.asarray(c).copy() for c in emb.tt_cores]

    indices = np.array([9, 11], dtype=np.int64)  # 9 cached, 11 not
    offsets = np.array([0, 2], dtype=np.int64)
    emb(indices, offsets)
    emb.backward(jnp.ones((1, embedding_dim), np.float32))
    changed = any(
        not np.array_equal(b, np.asarray(a))
        for b, a in zip(cores_before, emb.tt_cores)
    )
    assert changed  # row 11 went through the TT path

    # Core update must equal an uncached module seeing ONLY row 11.
    plain = TTEmbeddingBag(
        num_embeddings=num_embeddings, embedding_dim=embedding_dim,
        tt_p_shapes=p, tt_q_shapes=q, tt_ranks=r,
        optimizer=OptimType.SGD, learning_rate=0.1, sparse=True,
        use_cache=False, weight_dist="uniform",
    )
    plain.tt_cores = [jnp.asarray(c) for c in cores_before]
    plain(np.array([11], dtype=np.int64), np.array([0, 1], dtype=np.int64))
    plain.backward(jnp.ones((1, embedding_dim), np.float32))
    for a, b in zip(emb.tt_cores, plain.tt_cores):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6
        )


def test_cached_backward_rowwise_adagrad():
    p, q, r, num_embeddings, embedding_dim = tt_test_shapes(2)
    lr, eps = 0.2, 1e-10
    emb = TTEmbeddingBag(
        num_embeddings=num_embeddings, embedding_dim=embedding_dim,
        tt_p_shapes=p, tt_q_shapes=q, tt_ranks=r,
        optimizer=OptimType.EXACT_ROWWISE_ADAGRAD, learning_rate=lr,
        eps=eps, sparse=True, use_cache=True, cache_size=4,
        hashtbl_size=128, weight_dist="uniform",
    )
    emb.update_cache(jnp.asarray([2] * 5))
    emb.cache_populate()
    loc = int(np.asarray(cache_ops.cache_lookup(emb.cache, jnp.asarray([2])))[0])
    w_before = np.asarray(emb.cache.weight).copy()

    indices = np.array([2], dtype=np.int64)
    offsets = np.array([0, 1], dtype=np.int64)
    emb(indices, offsets)
    rng = np.random.default_rng(5)
    d_out = rng.normal(size=(1, embedding_dim)).astype(np.float32)
    emb.backward(jnp.asarray(d_out))
    g = d_out[0]
    state = float(np.mean(g * g))
    expect = w_before[loc] - lr * g / (np.sqrt(state) + eps)
    np.testing.assert_allclose(
        np.asarray(emb.cache.weight)[loc], expect, rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        float(np.asarray(emb.cache.opt_state)[loc]), state, rtol=1e-5
    )


def test_reset_cache():
    state = cache_ops.make_cache_state(32, 4, 4)
    state = cache_ops.update_cache_state(state, jnp.asarray([1, 2, 3]))
    assert (np.asarray(state.keys) != -1).any()
    state = cache_ops.reset_cache(state)
    assert (np.asarray(state.keys) == -1).all()
    assert (np.asarray(state.freq) == 0).all()


def test_populate_eviction():
    """Losers are evicted from the hash table (counting restarts)."""
    p, q, r, num_embeddings, embedding_dim = tt_test_shapes(2)
    emb = TTEmbeddingBag(
        num_embeddings=num_embeddings, embedding_dim=embedding_dim,
        tt_p_shapes=p, tt_q_shapes=q, tt_ranks=r,
        use_cache=True, cache_size=2, hashtbl_size=64,
        weight_dist="uniform",
    )
    emb.update_cache(jnp.asarray([1] * 5 + [2] * 4 + [3] * 3 + [4] * 2))
    emb.cache_populate()
    if emb.cache.direct:
        cached_rows = set(np.flatnonzero(np.asarray(emb.cache.slots) >= 0).tolist())
    else:
        cached_rows = set(np.asarray(emb.cache.keys).tolist()) - {-1}
    assert cached_rows == {1, 2}  # top-2 kept, rest evicted


# ---------------------------------------------------------------- direct mode


def test_direct_mode_exact_counts():
    """hashtbl_size >= E selects direct-indexed counting: exact, no hash."""
    state = cache_ops.make_cache_state(
        hashtbl_size=100, cache_size=8, embedding_dim=8, num_embeddings=50
    )
    assert state.direct
    rng = np.random.default_rng(0)
    idx1 = rng.integers(0, 50, size=300).astype(np.int32)
    idx2 = rng.integers(0, 50, size=200).astype(np.int32)
    state = cache_ops.update_cache_state(state, jnp.asarray(idx1))
    state = cache_ops.update_cache_state(state, jnp.asarray(idx2))
    expect = np.bincount(np.concatenate([idx1, idx2]), minlength=50)
    np.testing.assert_array_equal(np.asarray(state.freq), expect)


def test_direct_mode_end_to_end():
    """Default TTEmbeddingBag sizing (hashtbl=E) runs the direct path and the
    cached forward stays numerically equal to the pure-TT path."""
    p, q, r, num_embeddings, embedding_dim = tt_test_shapes(3)
    rng = np.random.default_rng(11)
    indices, offsets = generate_sparse_feature(rng, 24, num_embeddings, 5, 2)
    kwargs = dict(
        num_embeddings=num_embeddings, embedding_dim=embedding_dim,
        tt_p_shapes=p, tt_q_shapes=q, tt_ranks=r,
        weight_dist="uniform", seed=3,
    )
    cached = TTEmbeddingBag(use_cache=True, cache_size=16, **kwargs)
    assert cached.cache.direct  # default hashtbl_size = E
    plain = TTEmbeddingBag(use_cache=False, **kwargs)

    out_warm = cached(indices, offsets)
    cached.cache_populate()
    out_cached = cached(indices, offsets)
    out_plain = plain(indices, offsets)
    np.testing.assert_allclose(
        np.asarray(out_warm), np.asarray(out_plain), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out_cached), np.asarray(out_plain), rtol=1e-5, atol=1e-5
    )
    # hot rows really are cache-served
    locs = np.asarray(cache_ops.cache_lookup(cached.cache, jnp.asarray(indices)))
    assert (locs >= 0).any()


def test_direct_mode_populate_topk_and_eviction():
    state = cache_ops.make_cache_state(64, 2, 4, num_embeddings=64)
    idx = jnp.asarray(
        np.array([1] * 5 + [2] * 4 + [3] * 3 + [4] * 2, dtype=np.int32)
    )
    state = cache_ops.update_cache_state(state, idx)
    from fbtt_embedding_tpu.utils.init import init_tt_cores
    rng = np.random.default_rng(0)
    p, q, rk = [4, 4, 4], [2, 2, 1], [1, 3, 3, 1]
    cores = [jnp.asarray(c) for c in init_tt_cores(rng, "uniform", 1, 64, 4, p, q, rk)]
    state = cache_ops.cache_populate(state, cores, p, q, rk)
    slots = np.asarray(state.slots)
    assert slots[1] == 0 and slots[2] == 1  # top-2 by frequency
    assert (slots[3:] == -1).all()
    freq = np.asarray(state.freq)
    assert freq[1] == 5 and freq[2] == 4  # winners keep counts
    assert freq[3] == 0 and freq[4] == 0  # losers evicted


def test_direct_mode_determinism():
    state0 = cache_ops.make_cache_state(128, 8, 4, num_embeddings=128)
    idx = jnp.asarray(np.random.default_rng(1).integers(0, 128, 256),
                      dtype=jnp.int32)
    s1 = cache_ops.update_cache_state(state0, idx)
    s2 = cache_ops.update_cache_state(state0, idx)
    np.testing.assert_array_equal(np.asarray(s1.freq), np.asarray(s2.freq))


def test_count_scale_matches_repeated_counting():
    """scale=k gives exactly the counts of counting the batch k times —
    in direct, hashed, and wide-key modes (the sampled-counting hook)."""
    rng = np.random.default_rng(7)
    idx = jnp.asarray(rng.integers(0, 400, 256), dtype=jnp.int32)

    # direct
    s0 = cache_ops.make_cache_state(512, 8, 4, num_embeddings=512)
    scaled = cache_ops.update_cache_state(s0, idx, scale=3)
    triple = s0
    for _ in range(3):
        triple = cache_ops.update_cache_state(triple, idx)
    np.testing.assert_array_equal(
        np.asarray(scaled.freq), np.asarray(triple.freq))

    # hashed: one scaled call places exactly like one unscaled call (the
    # tournament ignores scale) and its counts are exactly 3x. (It is NOT
    # compared against three repeated calls: a repeat can place keys that
    # lost the first call's probe tournament — sampling trades exactly
    # that recovery away.)
    h0 = cache_ops.make_cache_state(2048, 8, 4)
    scaled_h = cache_ops.update_cache_state(h0, idx, scale=3)
    once_h = cache_ops.update_cache_state(h0, idx)
    np.testing.assert_array_equal(
        np.asarray(scaled_h.keys), np.asarray(once_h.keys))
    np.testing.assert_array_equal(
        np.asarray(scaled_h.freq), 3 * np.asarray(once_h.freq))

    # wide-key (big-E layout)
    keyrows = cache_ops.wide_cache_keys(
        rng.integers(0, 2**40, 64), [1 << 14, 1 << 14, 1 << 14])
    w0 = cache_ops.make_cache_state(1024, 8, 4, wide_keys=3)
    scaled_w = cache_ops.update_cache_state(w0, jnp.asarray(keyrows),
                                            scale=2)
    double_w = w0
    for _ in range(2):
        double_w = cache_ops.update_cache_state(double_w,
                                                jnp.asarray(keyrows))
    np.testing.assert_array_equal(
        np.asarray(scaled_w.freq), np.asarray(double_w.freq))


def test_module_cache_count_interval():
    """cache_count_interval=k counts every k-th forward with k-scaled
    increments; expected counts match exact counting on a repeated
    stream."""
    p, q, r, num_embeddings, embedding_dim = tt_test_shapes(3)
    emb = TTEmbeddingBag(
        num_embeddings=num_embeddings, embedding_dim=embedding_dim,
        tt_p_shapes=p, tt_q_shapes=q, tt_ranks=r,
        use_cache=True, cache_size=8, hashtbl_size=num_embeddings,
        weight_dist="uniform", cache_count_interval=4,
    )
    idx = jnp.asarray([3, 3, 7, 11], dtype=jnp.int64)
    offs = jnp.asarray([0, 2, 4], dtype=jnp.int64)
    for _ in range(8):  # 2 full intervals: counted on calls 0 and 4
        emb.forward(idx, offs)
    freq = np.asarray(emb.cache.freq)
    assert freq[3] == 16 and freq[7] == 8 and freq[11] == 8


def test_single_table_warmup_override():
    """The single-table wrapper forwards ``warmup`` (reference signature,
    ``tt_embeddings_ops.py:928-931``): warmup=True forces the pure-TT
    path even after populate; warmup=False enables probing during warmup.
    Both must be numerically consistent with the TT decompression."""
    p, q, r, num_embeddings, embedding_dim = tt_test_shapes(3)
    rng = np.random.default_rng(11)
    indices, offsets = generate_sparse_feature(rng, 16, num_embeddings, 5, 2)
    emb = TTEmbeddingBag(
        num_embeddings=num_embeddings, embedding_dim=embedding_dim,
        tt_p_shapes=p, tt_q_shapes=q, tt_ranks=r,
        use_cache=True, cache_size=16, hashtbl_size=512,
        weight_dist="uniform", seed=3)

    before = emb(indices, offsets)              # warmup: pure TT
    probed_early = emb(indices, offsets, warmup=False)  # probe empty cache
    np.testing.assert_allclose(
        np.asarray(before), np.asarray(probed_early), rtol=1e-6, atol=1e-6)

    emb.cache_populate()
    assert not emb.warmup
    served = emb(indices, offsets)              # cache-served hot rows
    forced_tt = emb(indices, offsets, warmup=True)  # override: pure TT
    np.testing.assert_allclose(
        np.asarray(served), np.asarray(forced_tt), rtol=1e-4, atol=1e-5)
