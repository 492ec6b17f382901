"""Inference serving path: make_serving_fn parity with the module forward,
and the weight-folded serving path (make_folded_serving_fn) against both."""

import jax.numpy as jnp
import numpy as np
import pytest

from fbtt_embedding_tpu import TTEmbeddingBag, TTEmbeddingParams
from fbtt_embedding_tpu.models.tt_embedding import (
    FoldedServingParams,
    make_bucketed_serving_fn,
    make_folded_serving_fn,
    make_serving_fn,
    refold_cache,
)
from fbtt_embedding_tpu.utils.init import init_tt_cores
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


FOLD_CASES = [
    # clean ndim-3 (pair table engages), weighted variant, multi-table,
    # odd-rank padded config (the reference's own shapes), and ndim 2/4
    dict(p=[20, 22, 25], q=[4, 4, 4], ranks=[8, 8], b=16, L=3),
    dict(p=[20, 22, 25], q=[4, 4, 4], ranks=[8, 8], b=16, L=3,
         weights=True),
    dict(p=[16, 16, 16], q=[4, 4, 4], ranks=[8, 8], b=8, L=2, T=2),
    dict(p=[7, 9, 11], q=[3, 4, 5], ranks=[13, 12], b=8, L=4),
    dict(p=[30, 40], q=[8, 8], ranks=[8], b=16, L=2),
    dict(p=[8, 9, 10, 11], q=[2, 2, 2, 2], ranks=[8, 8, 8], b=16, L=2),
]


@pytest.mark.parametrize("case", FOLD_CASES)
def test_folded_serving_matches_plain(case):
    p, q, ranks = case["p"], case["q"], case["ranks"]
    b, L, T = case["b"], case["L"], case.get("T", 1)
    rfull = [1] + list(ranks) + [1]
    E, D = int(np.prod(p)), int(np.prod(q))
    nnz = T * b * L
    rng = np.random.default_rng(7)
    cores = tuple(
        jnp.asarray(c)
        for c in init_tt_cores(rng, "uniform", T, E, D, p, q, rfull)
    )
    params = TTEmbeddingParams(
        cores, tuple(jnp.zeros((0,), jnp.float32) for _ in cores), None)
    indices = jnp.asarray(rng.integers(0, E, size=nnz).astype(np.int32))
    offsets = jnp.asarray(np.arange(0, nnz + 1, L, dtype=np.int32))
    w = (jnp.asarray(rng.random(nnz).astype(np.float32))
         if case.get("weights") else None)

    plain = make_serving_fn(p, q, rfull, num_tables=T, batch_size=b,
                            probe_cache=False)
    expect = plain(params, indices, offsets, w)

    fold, serve = make_folded_serving_fn(
        p, q, rfull, num_tables=T, batch_size=b, probe_cache=False,
        interpret=True)
    fp = fold(params)
    assert fp.setup is not None  # flat fold engaged (not the fallback)
    if len(p) >= 3:
        assert fp.setup[1] is not None  # pair table built at ANY batch
    got = serve(fp, indices, offsets, w)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expect), rtol=2e-4, atol=2e-4)


def test_folded_serving_with_cache():
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
    indices, offsets = generate_sparse_feature(rng, b, num_embeddings, 4, 2)
    emb(indices, offsets)
    emb.cache_populate()
    expect = emb(indices, offsets)
    assert emb.cache_hit_rate() > 0

    fold, serve = make_folded_serving_fn(
        p, q, rfull, num_tables=1, batch_size=b, probe_cache=True,
        interpret=True)
    fp = fold(emb.params)
    assert fp.setup is not None and fp.cache is not None
    got = serve(fp, jnp.asarray(indices, jnp.int32),
                jnp.asarray(offsets, jnp.int32))
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(expect), rtol=2e-4, atol=2e-4)


def test_folded_serving_fallback_without_flat():
    # On CPU without interpret=True the flat pipeline is unavailable:
    # fold must carry the params through and serve must delegate.
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
    fold, serve = make_folded_serving_fn(
        p, q, rfull, num_tables=1, batch_size=b, probe_cache=False)
    fp = fold(emb.params)
    assert fp.setup is None and fp.params is not None
    got = serve(fp, jnp.asarray(indices, jnp.int32),
                jnp.asarray(offsets, jnp.int32))
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(expect), rtol=2e-4, atol=2e-4)


def test_module_freeze_for_serving():
    p, q, r, num_embeddings, embedding_dim = tt_test_shapes(3)
    emb = TTEmbeddingBag(
        num_embeddings=num_embeddings, embedding_dim=embedding_dim,
        tt_p_shapes=p, tt_q_shapes=q, tt_ranks=r, use_cache=False,
        weight_dist="uniform", seed=9,
    )
    rng = np.random.default_rng(11)
    b = 8
    indices, offsets = generate_sparse_feature(rng, b, num_embeddings, 4, 2)
    expect = emb(indices, offsets)
    folded, serve = emb.freeze_for_serving(batch_size=b)
    got = serve(folded, jnp.asarray(indices, jnp.int32),
                jnp.asarray(offsets, jnp.int32))
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(expect), rtol=2e-4, atol=2e-4)


def test_folded_serve_rejects_fallback_params():
    # A fallback-mode fold (setup=None) passed to a flat-mode serve must
    # raise a descriptive error, not an opaque trace failure.
    p, q, r, num_embeddings, embedding_dim = tt_test_shapes(3)
    rfull = [1] + r + [1]
    rng = np.random.default_rng(1)
    cores = tuple(
        jnp.asarray(c)
        for c in init_tt_cores(
            rng, "uniform", 1, num_embeddings, embedding_dim, p, q, rfull)
    )
    params = TTEmbeddingParams(
        cores, tuple(jnp.zeros((0,), jnp.float32) for _ in cores), None)
    b = 8
    _, serve = make_folded_serving_fn(
        p, q, rfull, num_tables=1, batch_size=b, probe_cache=False,
        interpret=True)
    bad = FoldedServingParams(params=params)  # fallback-shaped state
    indices = jnp.zeros((b,), jnp.int32)
    offsets = jnp.arange(b + 1, dtype=jnp.int32)
    with pytest.raises(ValueError, match="fallback-mode fold"):
        serve(bad, indices, offsets)


def test_folded_serving_bs_override():
    # Per-call static batch override, including a non-multiple-of-8 batch
    # (padded internally, sliced on the way out).
    p, q, ranks = [20, 22, 25], [4, 4, 4], [8, 8]
    rfull = [1] + ranks + [1]
    E, D = int(np.prod(p)), int(np.prod(q))
    rng = np.random.default_rng(13)
    cores = tuple(
        jnp.asarray(c)
        for c in init_tt_cores(rng, "uniform", 1, E, D, p, q, rfull)
    )
    params = TTEmbeddingParams(
        cores, tuple(jnp.zeros((0,), jnp.float32) for _ in cores), None)
    fold, serve = make_folded_serving_fn(
        p, q, rfull, num_tables=1, batch_size=16, probe_cache=False,
        interpret=True)
    fp = fold(params)
    for b2 in (8, 6):  # 6: needs internal padding to 8
        L = 3
        nnz = b2 * L
        indices = jnp.asarray(rng.integers(0, E, size=nnz).astype(np.int32))
        offsets = jnp.asarray(np.arange(0, nnz + 1, L, dtype=np.int32))
        plain = make_serving_fn(p, q, rfull, num_tables=1, batch_size=b2,
                                probe_cache=False)
        expect = plain(params, indices, offsets)
        got = serve(fp, indices, offsets, bs=b2)
        assert got.shape == (1, b2, D)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(expect), rtol=2e-4, atol=2e-4)


def test_refold_cache_refreshes_populated_cache():
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
    indices, offsets = generate_sparse_feature(rng, b, num_embeddings, 4, 2)
    fold, serve = make_folded_serving_fn(
        p, q, rfull, num_tables=1, batch_size=b, probe_cache=True,
        interpret=True)
    fp_stale = fold(emb.params)  # frozen BEFORE counting/populate

    emb(indices, offsets)
    emb.cache_populate()
    expect = emb(indices, offsets)
    assert emb.cache_hit_rate() > 0

    fp_fresh = refold_cache(fp_stale, emb.params)
    assert fp_fresh.setup is fp_stale.setup  # pass/pair tables reused
    got = serve(fp_fresh, jnp.asarray(indices, jnp.int32),
                jnp.asarray(offsets, jnp.int32))
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(expect), rtol=2e-4, atol=2e-4)


def test_refold_cache_fallback_mode():
    # Fallback-mode folds carry the whole pytree: refresh == params swap.
    p, q, r, num_embeddings, embedding_dim = tt_test_shapes(3)
    emb = TTEmbeddingBag(
        num_embeddings=num_embeddings, embedding_dim=embedding_dim,
        tt_p_shapes=p, tt_q_shapes=q, tt_ranks=r, use_cache=False,
        weight_dist="uniform", seed=4,
    )
    fp = FoldedServingParams(params=None)
    fresh = refold_cache(fp, emb.params)
    assert fresh.setup is None and fresh.params is not None


def test_quantized_folded_serving_close_to_exact():
    # int8 per-row quantization of the pair table: output within ~1% of
    # the unquantized fold (row error <= absmax/254; pooling averages it).
    p, q, ranks = [20, 22, 25], [4, 4, 4], [8, 8]
    rfull = [1] + ranks + [1]
    E, D = int(np.prod(p)), int(np.prod(q))
    rng = np.random.default_rng(17)
    cores = tuple(
        jnp.asarray(c)
        for c in init_tt_cores(rng, "uniform", 1, E, D, p, q, rfull)
    )
    params = TTEmbeddingParams(
        cores, tuple(jnp.zeros((0,), jnp.float32) for _ in cores), None)
    b, L = 16, 3
    nnz = b * L
    indices = jnp.asarray(rng.integers(0, E, size=nnz).astype(np.int32))
    offsets = jnp.asarray(np.arange(0, nnz + 1, L, dtype=np.int32))

    fold, serve = make_folded_serving_fn(
        p, q, rfull, num_tables=1, batch_size=b, probe_cache=False,
        interpret=True)
    expect = serve(fold(params), indices, offsets)

    foldq, serveq = make_folded_serving_fn(
        p, q, rfull, num_tables=1, batch_size=b, probe_cache=False,
        interpret=True, quantize="int8")
    fpq = foldq(params)
    assert isinstance(fpq.setup[1], tuple)  # (int8 table, scale) pair
    assert fpq.setup[1][0].dtype == jnp.int8
    got = serveq(fpq, indices, offsets)
    scale = float(np.abs(np.asarray(expect)).max())
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expect), atol=0.01 * scale + 1e-6)


def test_quantized_folded_serving_with_cache_and_refold():
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
    indices, offsets = generate_sparse_feature(rng, b, num_embeddings, 4, 2)
    fold, serve = make_folded_serving_fn(
        p, q, rfull, num_tables=1, batch_size=b, probe_cache=True,
        interpret=True, quantize="int8")
    fp_stale = fold(emb.params)  # frozen BEFORE counting/populate

    emb(indices, offsets)
    emb.cache_populate()
    expect = emb(indices, offsets)
    assert emb.cache_hit_rate() > 0

    fp = refold_cache(fp_stale, emb.params)
    assert fp.setup is fp_stale.setup           # pass/pair tables reused
    assert fp.cache.weight.dtype == jnp.int8    # re-quantized cache rows
    assert fp.cache_scale is not None
    got = serve(fp, jnp.asarray(indices, jnp.int32),
                jnp.asarray(offsets, jnp.int32))
    scale = float(np.abs(np.asarray(expect)).max())
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(expect), atol=0.015 * scale + 1e-6)


def test_quantized_fold_rejects_unknown_mode():
    p, q, r, _, _ = tt_test_shapes(3)
    rfull = [1] + r + [1]
    with pytest.raises(ValueError, match="int8"):
        make_folded_serving_fn(p, q, rfull, num_tables=1, batch_size=8,
                               interpret=True, quantize="fp4")


@pytest.mark.parametrize("T,interp", [(1, True), (2, True), (1, False)])
def test_bucketed_serving_matches_exact_shapes(T, interp):
    # Arbitrary (batch, nnz) requests round up to buckets; pad bags and
    # weight-0 pad lookups must contribute nothing. interp=False covers
    # the fallback (non-flat) dispatch path.
    p, q, ranks = [20, 22, 25], [4, 4, 4], [8, 8]
    rfull = [1] + ranks + [1]
    E, D = int(np.prod(p)), int(np.prod(q))
    rng = np.random.default_rng(23)
    cores = tuple(
        jnp.asarray(c)
        for c in init_tt_cores(rng, "uniform", T, E, D, p, q, rfull)
    )
    params = TTEmbeddingParams(
        cores, tuple(jnp.zeros((0,), jnp.float32) for _ in cores), None)
    fold, serve = make_bucketed_serving_fn(
        p, q, rfull, num_tables=T, batch_buckets=[8, 16],
        nnz_buckets=[32, 96], probe_cache=False, interpret=interp)
    fp = fold(params)
    for b, L in [(5, 3), (8, 4), (11, 2)]:
        nnz = T * b * L
        indices = jnp.asarray(rng.integers(0, E, size=nnz).astype(np.int32))
        offsets = jnp.asarray(np.arange(0, nnz + 1, L, dtype=np.int32))
        plain = make_serving_fn(p, q, rfull, num_tables=T, batch_size=b,
                                probe_cache=False)
        expect = plain(params, indices, offsets)
        got = serve(fp, indices, offsets)
        assert got.shape == (T, b, D)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(expect), rtol=2e-4, atol=2e-4)


def test_bucketed_serving_weighted_and_overflow():
    p, q, ranks = [20, 22, 25], [4, 4, 4], [8, 8]
    rfull = [1] + ranks + [1]
    E = int(np.prod(p))
    rng = np.random.default_rng(29)
    cores = tuple(
        jnp.asarray(c)
        for c in init_tt_cores(rng, "uniform", 1, E, 64, p, q, rfull)
    )
    params = TTEmbeddingParams(
        cores, tuple(jnp.zeros((0,), jnp.float32) for _ in cores), None)
    fold, serve = make_bucketed_serving_fn(
        p, q, rfull, num_tables=1, batch_buckets=[8],
        nnz_buckets=[32], probe_cache=False, interpret=True)
    fp = fold(params)
    b, L = 6, 4
    nnz = b * L
    indices = jnp.asarray(rng.integers(0, E, size=nnz).astype(np.int32))
    offsets = jnp.asarray(np.arange(0, nnz + 1, L, dtype=np.int32))
    w = jnp.asarray(rng.random(nnz).astype(np.float32))
    plain = make_serving_fn(p, q, rfull, num_tables=1, batch_size=b,
                            probe_cache=False)
    expect = plain(params, indices, offsets, w)
    got = serve(fp, indices, offsets, w)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expect), rtol=2e-4, atol=2e-4)
    with pytest.raises(ValueError, match="exceeds the largest"):
        serve(fp, jnp.zeros((40,), jnp.int32),
              jnp.asarray(np.arange(0, 41, 5, dtype=np.int32)))


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


def test_folded_params_checkpoint_roundtrip(tmp_path):
    # Production story: fold once on the trainer, save, ship the folded
    # pytree to serving replicas — FoldedServingParams round-trips
    # through the standard checkpoint path (quantized fold included).
    from fbtt_embedding_tpu.utils import checkpoint as ckpt

    p, q, ranks = [20, 22, 25], [4, 4, 4], [8, 8]
    rfull = [1] + ranks + [1]
    E, D = int(np.prod(p)), int(np.prod(q))
    rng = np.random.default_rng(31)
    cores = tuple(
        jnp.asarray(c)
        for c in init_tt_cores(rng, "uniform", 1, E, D, p, q, rfull)
    )
    params = TTEmbeddingParams(
        cores, tuple(jnp.zeros((0,), jnp.float32) for _ in cores), None)
    fold, serve = make_folded_serving_fn(
        p, q, rfull, num_tables=1, batch_size=8, probe_cache=False,
        interpret=True, quantize="int8")
    fp = fold(params)

    path = str(tmp_path / "folded")
    ckpt.save(path, fp)
    fp2 = ckpt.restore(path, like=fp)
    assert fp2.setup[1][0].dtype == jnp.int8

    nnz = 8 * 3
    indices = jnp.asarray(rng.integers(0, E, size=nnz).astype(np.int32))
    offsets = jnp.asarray(np.arange(0, nnz + 1, 3, dtype=np.int32))
    np.testing.assert_array_equal(
        np.asarray(serve(fp, indices, offsets)),
        np.asarray(serve(fp2, indices, offsets)))


def test_refold_quantizes_cache_populated_after_freeze():
    # A quantized fold frozen BEFORE the cache first existed must still
    # quantize the cache on refold (the pair-table (int8, scale) pair is
    # the quantization marker when cache_scale is None).
    p, q, r, num_embeddings, embedding_dim = tt_test_shapes(3)
    rfull = [1] + r + [1]
    rng = np.random.default_rng(37)
    cores = tuple(
        jnp.asarray(c)
        for c in init_tt_cores(
            rng, "uniform", 1, num_embeddings, embedding_dim, p, q, rfull)
    )
    params_nocache = TTEmbeddingParams(
        cores, tuple(jnp.zeros((0,), jnp.float32) for _ in cores), None)
    fold, serve = make_folded_serving_fn(
        p, q, rfull, num_tables=1, batch_size=8, probe_cache=True,
        interpret=True, quantize="int8")
    fp0 = fold(params_nocache)
    assert fp0.cache is None and fp0.cache_scale is None

    emb = TTEmbeddingBag(
        num_embeddings=num_embeddings, embedding_dim=embedding_dim,
        tt_p_shapes=p, tt_q_shapes=q, tt_ranks=r,
        use_cache=True, cache_size=16, hashtbl_size=num_embeddings,
        weight_dist="uniform", seed=2,
    )
    indices, offsets = generate_sparse_feature(rng, 8, num_embeddings, 4, 2)
    emb(indices, offsets)
    emb.cache_populate()
    fp = refold_cache(fp0, emb.params)
    assert fp.cache.weight.dtype == jnp.int8
    assert fp.cache_scale is not None
