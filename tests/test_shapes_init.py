"""Tests for suggested_tt_shapes and the 5 weight-init schemes —
coverage the reference lacks (SURVEY §4 gaps)."""

import numpy as np
import pytest

from fbtt_embedding_tpu.utils.init import WEIGHT_DISTS, init_tt_cores
from fbtt_embedding_tpu.utils.shapes import (
    factorizations,
    prime_factorize,
    suggested_tt_shapes,
)


def test_prime_factorize():
    assert prime_factorize(1) == []
    assert prime_factorize(12) == [2, 2, 3]
    assert prime_factorize(97) == [97]
    assert prime_factorize(11_000_000) == [2] * 6 + [5] * 6 + [11]


def test_factorizations_exact():
    got = set(factorizations(12, 2))
    assert got == {(1, 12), (2, 6), (3, 4)}
    got3 = set(factorizations(8, 3))
    assert got3 == {(1, 1, 8), (1, 2, 4), (2, 2, 2)}


@pytest.mark.parametrize("n,d", [(11_000_000, 3), (1_000_000, 3),
                                 (985, 2), (64, 3), (7, 4), (1017, 3)])
def test_suggested_tt_shapes_properties(n, d):
    shape = suggested_tt_shapes(n, d)
    assert len(shape) == d
    assert int(np.prod(shape)) >= n
    exact = suggested_tt_shapes(n, d, allow_round_up=False)
    assert int(np.prod(exact)) == n


def test_suggested_shapes_balanced():
    # Max-entropy picks the balanced factorization.
    assert sorted(suggested_tt_shapes(64, 3, allow_round_up=False)) == [4, 4, 4]
    assert sorted(suggested_tt_shapes(1_000_000, 3)) == [100, 100, 100]


@pytest.mark.parametrize("dist", WEIGHT_DISTS)
def test_init_shapes_and_dtype(dist):
    p, q, r = [7, 9, 11], [3, 4, 5], [1, 13, 12, 1]
    nt = 1 if dist == "approx-uniform" else 2
    rng = np.random.default_rng(0)
    cores = init_tt_cores(rng, dist, nt, 693, 60, p, q, r)
    assert len(cores) == 3
    for t, c in enumerate(cores):
        assert c.dtype == np.float32
        assert c.shape == (nt, p[t], r[t] * q[t] * r[t + 1])
        assert np.isfinite(c).all()


def test_approx_normal_distribution():
    """The construction contract (tt_embeddings_ops.py:642-659): core
    elements are N(0,1) conditioned on |w| >= 2, scaled by
    (1/sqrt(3E))^(1/3) — so every element satisfies |w| >= 2 * scale."""
    p, q, r = [8, 8, 8], [4, 4, 4], [1, 16, 16, 1]
    E = 512
    scale = (1.0 / np.sqrt(3 * E)) ** (1.0 / 3.0)
    rng = np.random.default_rng(1)
    cores = init_tt_cores(rng, "approx-normal", 1, E, 64, p, q, r)
    for c in cores:
        assert (np.abs(c) >= 2.0 * scale * 0.999).all()
        # symmetric around zero
        assert abs(np.mean(np.sign(c))) < 0.1


def test_approx_uniform_requires_3d():
    rng = np.random.default_rng(0)
    with pytest.raises(AssertionError):
        init_tt_cores(rng, "approx-uniform", 1, 49, 12, [7, 7], [3, 4],
                      [1, 8, 1])


def test_approx_uniform_distribution():
    """The flat-saw-tooth construction should reconstruct rows that are
    roughly uniform: bounded, roughly symmetric, high entropy."""
    import jax.numpy as jnp

    from fbtt_embedding_tpu.ops.contraction import tt_matrix_to_full

    p, q, r = [10, 10, 10], [4, 4, 4], [1, 16, 16, 1]
    E = 1000
    rng = np.random.default_rng(2)
    cores = [jnp.asarray(c) for c in init_tt_cores(
        rng, "approx-uniform", 1, E, 64, p, q, r)]
    full = np.asarray(tt_matrix_to_full(p, q, r, cores))
    # Values concentrated in a bounded band (uniform-ish), not heavy-tailed.
    assert np.isfinite(full).all()
    assert abs(np.mean(full)) < 0.05
