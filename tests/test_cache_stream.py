"""Streaming cache-update kernel (ops/pallas/cache_kernel.py):
interpret-mode exactness vs the XLA scatter path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fbtt_embedding_tpu.ops.pallas.cache_kernel import (
    aggregate_row_updates,
    streaming_row_update,
)


def test_aggregate_row_updates():
    c = 16
    loc = jnp.asarray(np.array([3, 7, 3, -1, 7, 3, 20], np.int32))
    d_rows = jnp.asarray(np.arange(7 * 4, dtype=np.float32).reshape(7, 4))
    # caller masks invalid lookups' updates to zero
    valid = ((loc >= 0) & (loc < c))[:, None]
    d_rows = jnp.where(valid, d_rows, 0.0)
    rows_u, upd_u = aggregate_row_updates(loc, d_rows, c)
    rows_u, upd_u = np.asarray(rows_u), np.asarray(upd_u)
    assert rows_u[0] == 3 and rows_u[1] == 7
    assert (rows_u[2:] == c).all()
    ref = np.zeros((c + 1, 4), np.float32)
    for l, u in zip(np.asarray(loc), np.asarray(d_rows)):
        if 0 <= l < c:
            ref[l] += u
    np.testing.assert_allclose(upd_u[0], ref[3], rtol=1e-6)
    np.testing.assert_allclose(upd_u[1], ref[7], rtol=1e-6)
    assert (upd_u[2:] == 0).all()


@pytest.mark.parametrize("n,c,d", [(64, 40, 64), (300, 1000, 128)])
def test_streaming_row_update_matches_scatter(n, c, d):
    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(c, d)).astype(np.float32)
    loc = rng.integers(0, c, size=n).astype(np.int32)
    upd = rng.normal(size=(n, d)).astype(np.float32)
    rows_u, upd_u = aggregate_row_updates(
        jnp.asarray(loc), jnp.asarray(upd), c)
    out = streaming_row_update(
        jnp.asarray(w0.copy()), rows_u, upd_u, interpret=True)
    ref = jnp.asarray(w0).at[jnp.asarray(loc)].add(jnp.asarray(upd))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_cache_backward_sgd_streaming_matches_scatter(monkeypatch):
    """cache_backward_sgd under FBTT_STREAM_CACHE=1 (interpret via CPU
    backend requires the kernel path to be forced) equals the scatter."""
    from fbtt_embedding_tpu.ops import cache as cache_ops

    rng = np.random.default_rng(1)
    c, d, b, L = 32, 64, 8, 4
    nnz = b * L
    state = cache_ops.make_cache_state(100, c, d, "none",
                                       num_embeddings=100)
    w0 = rng.normal(size=(c, d)).astype(np.float32)
    state = state.replace(weight=jnp.asarray(w0.copy()))
    locations = jnp.asarray(
        np.where(rng.random(nnz) < 0.7,
                 rng.integers(0, c, size=nnz), -1).astype(np.int32))
    rowidx = jnp.asarray(np.repeat(np.arange(b), L).astype(np.int32))
    d_out = jnp.asarray(rng.normal(size=(1, b, d)).astype(np.float32))

    monkeypatch.setenv("FBTT_STREAM_CACHE", "0")
    ref = cache_ops.cache_backward_sgd(state, d_out, locations, rowidx,
                                       0.1)
    # interpret-mode streaming: call the pieces directly (the env gate
    # selects the compiled kernel, which needs a TPU)
    from fbtt_embedding_tpu.ops.pallas.cache_kernel import (
        aggregate_row_updates,
        streaming_row_update,
    )

    d_rows, cached = cache_ops.cache_row_grads(d_out, locations, rowidx)
    loc = jnp.where(cached, locations, c)
    rows_u, upd_u = aggregate_row_updates(loc, d_rows, c)
    w_stream = streaming_row_update(
        jnp.asarray(w0.copy()), rows_u, -jnp.float32(0.1) * upd_u,
        interpret=True)
    np.testing.assert_allclose(np.asarray(w_stream),
                               np.asarray(ref.weight),
                               rtol=1e-5, atol=1e-5)
