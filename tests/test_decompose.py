"""TT-SVD import path: decompose a dense table into module-layout cores.

Round-trip oracle: ``tt_matrix_to_full`` is the exact inverse layout, so
a matrix that IS a TT of the configured ranks must reconstruct exactly,
and approximation error must be monotone in rank. The reference has no
import path at all (migration gap this closes)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fbtt_embedding_tpu import TTEmbeddingBag, tt_matrix_to_full
from fbtt_embedding_tpu.utils.decompose import tt_decompose
from fbtt_embedding_tpu.utils.init import init_tt_cores


def _full(cores_np, p, q, r):
    cores = [jnp.asarray(c)[None] for c in cores_np]
    return np.asarray(tt_matrix_to_full(p, q, r, cores))


@pytest.mark.parametrize("p,q,ranks", [
    ([6, 6, 6], [4, 2, 2], [8, 8]),
    ([8, 9], [4, 4], [12]),
    ([4, 4, 4, 4], [2, 2, 2, 2], [4, 4, 4]),
])
def test_exact_roundtrip_when_matrix_is_tt(p, q, ranks):
    rfull = [1] + ranks + [1]
    e, d = int(np.prod(p)), int(np.prod(q))
    rng = np.random.default_rng(0)
    src = init_tt_cores(rng, "uniform", 1, e, d, p, q, rfull)
    w = _full([c[0] for c in src], p, q, rfull)
    cores = tt_decompose(w, p, q, ranks)
    for c, (pt, width) in zip(
            cores, [(pp, rfull[i] * q[i] * rfull[i + 1])
                    for i, pp in enumerate(p)]):
        assert c.shape == (pt, width)
    back = _full(cores, p, q, rfull)
    np.testing.assert_allclose(back, w, rtol=1e-4, atol=1e-5)


def test_error_monotone_in_rank_and_exact_at_full_rank():
    p, q = [6, 6, 6], [4, 2, 2]
    e, d = 216, 16
    rng = np.random.default_rng(1)
    w = rng.normal(size=(e, d)).astype(np.float32)

    def err(ranks):
        rfull = [1] + ranks + [1]
        back = _full(tt_decompose(w, p, q, ranks), p, q, rfull)
        return float(np.linalg.norm(back - w) / np.linalg.norm(w))

    e2, e8, e24 = err([2, 2]), err([8, 8]), err([24, 12])
    assert e2 > e8 > e24
    # ranks >= every unfolding rank: TT-SVD is exact (cores zero-padded
    # to the requested storage shape when an unfolding is rank-deficient)
    assert err([64, 16]) < 1e-5


def test_short_table_zero_pads_rows():
    # full-rank config (first unfolding p0*q0 = 24, second <= 12): the
    # random table must reconstruct exactly, padded rows exactly zero
    p, q, ranks = [6, 6, 6], [4, 2, 2], [24, 12]
    rng = np.random.default_rng(2)
    w = rng.normal(size=(200, 16)).astype(np.float32)  # E < prod(p)=216
    rfull = [1] + ranks + [1]
    back = _full(tt_decompose(w, p, q, ranks), p, q, rfull)
    np.testing.assert_allclose(back[:200], w, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(back[200:], 0.0, atol=1e-5)


def test_module_import_full_weight_serves_the_table():
    p, q, ranks = [6, 6, 6], [4, 2, 2], [24, 12]
    e, d = 216, 16
    rng = np.random.default_rng(3)
    w = rng.normal(size=(e, d)).astype(np.float32)
    emb = TTEmbeddingBag(
        num_embeddings=e, embedding_dim=d, tt_p_shapes=p, tt_q_shapes=q,
        tt_ranks=ranks, use_cache=True, cache_size=16, hashtbl_size=256,
        weight_dist="uniform")
    # engage the cache BEFORE import: populated rows must be refreshed
    emb.update_cache(jnp.asarray(np.arange(32, dtype=np.int32)))
    emb.cache_populate()
    assert not emb.warmup

    emb.import_full_weight(w)
    got = np.asarray(emb.full_weight())
    np.testing.assert_allclose(got, w, rtol=2e-3, atol=2e-3)
    # forward (cache-probing) serves the imported weights too
    idx = np.arange(8, dtype=np.int32)
    offs = np.arange(9, dtype=np.int32)
    out = np.asarray(emb(idx, offs))
    np.testing.assert_allclose(out, w[:8], rtol=2e-3, atol=2e-3)
    # optimizer state slice was reset
    for s in emb.optimizer_state:
        if s.size:
            assert float(jnp.abs(s).max()) == 0.0


def test_import_full_weight_native_adam_state():
    # ADVICE r4: native ADAM/LAMB state ends with a 0-d step counter the
    # per-table reset used to index (IndexError). The counter must pass
    # through untouched while per-core moment buffers reset.
    p, q, ranks = [6, 6, 6], [4, 2, 2], [24, 12]
    e, d = 216, 16
    rng = np.random.default_rng(4)
    w = rng.normal(size=(e, d)).astype(np.float32)
    from fbtt_embedding_tpu import OptimType

    emb = TTEmbeddingBag(
        num_embeddings=e, embedding_dim=d, tt_p_shapes=p, tt_q_shapes=q,
        tt_ranks=ranks, use_cache=False, weight_dist="uniform",
        optimizer=OptimType.ADAM, optim_semantics="native")
    # take one training step so moments and the step counter are nonzero
    idx = np.arange(8, dtype=np.int32)
    offs = np.arange(9, dtype=np.int32)
    out = emb(idx, offs)
    emb.backward(np.ones_like(np.asarray(out)))
    step_before = int(emb.optimizer_state[-1])
    assert step_before == 1

    emb.import_full_weight(w)
    assert int(emb.optimizer_state[-1]) == step_before  # counter kept
    for s in emb.optimizer_state[:-1]:
        assert float(jnp.abs(s).max()) == 0.0  # moments reset
    got = np.asarray(emb.full_weight())
    np.testing.assert_allclose(got, w, rtol=2e-3, atol=2e-3)
