"""Windowed hot-row scatter (ops/hot_scatter.py): exactness vs the plain
XLA scatter across window/straggler regimes, and the cache backwards
that route through it."""

import jax.numpy as jnp
import numpy as np
import pytest

from fbtt_embedding_tpu.ops.hot_scatter import hot_scatter_add


def _ref(table, loc, upd):
    out = np.array(table, np.float32)
    for l, u in zip(np.asarray(loc), np.asarray(upd)):
        if 0 <= l < len(out):
            out[l] += u
    return out


@pytest.mark.parametrize(
    "c,n,case",
    [
        (200_000, 512, "window_only"),     # all rows < window
        (200_000, 512, "mixed"),           # window + few stragglers
        (200_000, 512, "overflow"),        # stragglers > chunk (multi-trip)
        (1_000, 300, "small_table"),       # direct-scatter path
    ],
)
def test_hot_scatter_matches_scatter(c, n, case):
    rng = np.random.default_rng(hash(case) % 2**31)
    window, cap = 4096, 64
    if case == "window_only":
        loc = rng.integers(0, window, n)
    elif case == "mixed":
        loc = np.where(rng.random(n) < 0.9,
                       rng.integers(0, window, n),
                       rng.integers(window, c, n))
        loc[:5] = [-1, -7, c, c + 3, window]  # invalid + boundary
    elif case == "overflow":
        loc = rng.integers(window, c, n)  # every row is a straggler
    else:
        loc = rng.integers(-5, c + 5, n)
    loc = loc.astype(np.int32)
    upd = rng.normal(size=(n, 8)).astype(np.float32)
    w0 = rng.normal(size=(c, 8)).astype(np.float32)
    out = hot_scatter_add(jnp.asarray(w0), jnp.asarray(loc),
                          jnp.asarray(upd), window=window,
                          chunk=cap)
    np.testing.assert_allclose(np.asarray(out), _ref(w0, loc, upd),
                               rtol=1e-5, atol=1e-5)


def test_hot_scatter_duplicates_deterministic():
    rng = np.random.default_rng(3)
    c, n = 100_000, 400
    loc = jnp.asarray(
        np.concatenate([np.zeros(200), rng.integers(0, c, 200)]
                       ).astype(np.int32))
    upd = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    w0 = jnp.zeros((c, 4), jnp.float32)
    a = hot_scatter_add(w0, loc, upd, window=1024, chunk=32)
    b = hot_scatter_add(w0, loc, upd, window=1024, chunk=32)
    assert (np.asarray(a) == np.asarray(b)).all()
    np.testing.assert_allclose(np.asarray(a), _ref(np.asarray(w0), loc, upd),
                               rtol=1e-5, atol=1e-5)


def test_cache_backward_sgd_hot_scatter_matches_plain(monkeypatch):
    """cache_backward_sgd with the hot scatter equals the plain-scatter
    path (FBTT_HOT_SCATTER=0)."""
    from fbtt_embedding_tpu.ops import cache as cache_ops

    rng = np.random.default_rng(1)
    c, d, b, L = 70_000, 64, 8, 4
    nnz = b * L
    state = cache_ops.make_cache_state(100_000, c, d, "none",
                                       num_embeddings=100_000)
    w0 = rng.normal(size=(c, d)).astype(np.float32)
    state = state.replace(weight=jnp.asarray(w0.copy()))
    locations = jnp.asarray(
        np.where(rng.random(nnz) < 0.7,
                 rng.integers(0, c, size=nnz), -1).astype(np.int32))
    rowidx = jnp.asarray(np.repeat(np.arange(b), L).astype(np.int32))
    d_out = jnp.asarray(rng.normal(size=(1, b, d)).astype(np.float32))

    monkeypatch.setenv("FBTT_HOT_SCATTER", "0")
    ref = cache_ops.cache_backward_sgd(state, d_out, locations, rowidx,
                                       0.1)
    monkeypatch.setenv("FBTT_HOT_SCATTER", "auto")
    out = cache_ops.cache_backward_sgd(
        state.replace(weight=jnp.asarray(w0.copy())), d_out, locations,
        rowidx, 0.1)
    np.testing.assert_allclose(np.asarray(out.weight),
                               np.asarray(ref.weight),
                               rtol=1e-5, atol=1e-5)


def test_hot_scatter_nnz_smaller_than_chunk():
    """Regression: n < chunk used to fail at trace time (dynamic_slice
    slice size > operand), and the clamped tail chunk double-applied."""
    table = jnp.zeros((200_000, 8), jnp.float32)
    loc = jnp.arange(100, dtype=jnp.int32) + 150_000  # all stragglers
    upd = jnp.ones((100, 8), jnp.float32)
    out = hot_scatter_add(table, loc, upd)
    expect = table.at[loc].add(upd)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect))


def test_hot_scatter_tail_chunk_not_double_applied():
    """Regression: ceil(n_strag/chunk)*chunk > n used to re-apply rows
    from the previous chunk via dynamic_slice start clamping."""
    rng = np.random.default_rng(3)
    c = 400_000
    n = 300
    table = jnp.zeros((c, 4), jnp.float32)
    loc = jnp.asarray(
        rng.integers(200_000, c, size=n).astype(np.int32))  # all stragglers
    upd = jnp.ones((n, 4), jnp.float32)
    out = hot_scatter_add(table, loc, upd, window=65536, chunk=128)
    expect = table.at[loc].add(upd)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect))
    assert float(jnp.sum(out)) == n * 4
