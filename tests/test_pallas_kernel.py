"""Fused Pallas kernel tests (interpreter mode — CPU-exact).

Validates the Pallas TT forward/backward against the XLA path on small
configs that satisfy the kernel's tiling gates. On TPU the same kernels run
compiled (see ``scripts/test_pallas_kernels.py`` for on-device validation).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fbtt_embedding_tpu.ops.contraction import tt_rows
from fbtt_embedding_tpu.ops.indexing import decompose_indices
from fbtt_embedding_tpu.ops.lookup import (
    pool_rows,
    pooled_tt_lookup,
    tt_grads_from_row_cotangents,
)
from fbtt_embedding_tpu.ops.pallas.tt_kernel import (
    tt_backward_pallas,
    tt_forward_pallas,
)
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
    dict(p=[20, 22, 25], q=[4, 4, 4], ranks=[8, 8], b=16, L=2, weights=True),
    dict(p=[16, 16, 16], q=[4, 4, 4], ranks=[8, 8], b=8, L=2, T=2),
    dict(p=[30, 40], q=[8, 8], ranks=[8], b=16, L=2),
    dict(p=[8, 9, 10, 11], q=[2, 2, 2, 2], ranks=[8, 8, 8], b=16, L=2),
]

BLOCK_N = 16  # small blocks keep the interpreted (unrolled) graph tractable


@pytest.mark.parametrize("case", CASES)
def test_pallas_forward_matches_xla(case):
    case = dict(case)
    weights = case.pop("weights", False)
    T = case.pop("T", 1)
    p, q, ranks, b, L = case["p"], case["q"], case["ranks"], case["b"], case["L"]
    rfull, E, D, cores, indices, rowidx, tableidx, w, d_out = make_case(
        p, q, ranks, b, L, T, weights)
    idx_parts = decompose_indices(indices, p)
    out_p = tt_forward_pallas(
        cores, p, q, rfull, b, idx_parts, rowidx, tableidx, w,
        block_n=BLOCK_N, interpret=True)
    rows = tt_rows(cores, tuple(p), tuple(q), tuple(rfull), indices, tableidx)
    if w is not None:
        rows = rows * w[:, None]
    out_x = pool_rows(rows, rowidx, tableidx, T, b)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_x), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("case", CASES)
def test_pallas_backward_matches_xla(case):
    case = dict(case)
    weights = case.pop("weights", False)
    T = case.pop("T", 1)
    p, q, ranks, b, L = case["p"], case["q"], case["ranks"], case["b"], case["L"]
    rfull, E, D, cores, indices, rowidx, tableidx, w, d_out = make_case(
        p, q, ranks, b, L, T, weights)
    idx_parts = decompose_indices(indices, p)
    dg_p = tt_backward_pallas(
        cores, p, q, rfull, b, idx_parts, rowidx, d_out, tableidx, w,
        block_n=BLOCK_N, interpret=True)
    if tableidx is None:
        d_rows = d_out[0][rowidx]
    else:
        d_rows = d_out.reshape(T * b, D)[tableidx * b + rowidx]
    if w is not None:
        d_rows = d_rows * w[:, None]
    dg_x = tt_grads_from_row_cotangents(
        cores, tuple(p), tuple(q), tuple(rfull), indices, tableidx, d_rows)
    for a, b_ in zip(dg_p, dg_x):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5)


def test_pooled_lookup_vjp_pallas_interpret():
    """End-to-end custom_vjp through pooled_tt_lookup in pallas mode."""
    p, q, ranks = [20, 22, 25], [4, 4, 4], [8, 8]
    rfull, E, D, cores, indices, rowidx, _, _, d_out = make_case(
        p, q, ranks, 16, 2)

    def f_pallas(cs):
        return pooled_tt_lookup(
            cs, p, q, rfull, 16, indices, rowidx, impl="pallas",
            interpret=True)

    def f_xla(cs):
        return pooled_tt_lookup(
            cs, p, q, rfull, 16, indices, rowidx, impl="xla")

    out_p, vjp_p = jax.vjp(f_pallas, cores)
    out_x, vjp_x = jax.vjp(f_xla, cores)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_x), rtol=1e-5, atol=1e-5)
    (gp,) = vjp_p(d_out)
    (gx,) = vjp_x(d_out)
    for a, b_ in zip(gp, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5)
