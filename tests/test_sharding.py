"""Multi-device sharding tests on an 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from fbtt_embedding_tpu.parallel.mesh import make_mesh
from fbtt_embedding_tpu.parallel.sharded import (
    _fixed_pool_lookup,
    make_dp_lookup,
    make_table_sharded_lookup,
    shard_params_for_table_parallel,
)
from fbtt_embedding_tpu.utils.init import init_tt_cores

P_SHAPES = [8, 8, 8]
Q_SHAPES = [4, 4, 4]
RANKS = [1, 8, 8, 1]
E = 512
D = 64


def _setup(num_tables, seed=0):
    rng = np.random.default_rng(seed)
    cores = tuple(
        jnp.asarray(c)
        for c in init_tt_cores(
            rng, "uniform", num_tables, E, D, P_SHAPES, Q_SHAPES, RANKS
        )
    )
    return cores, rng


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("dp", "mp")
    mesh1 = make_mesh(shape=(8,), axis_names=("mp",))
    assert mesh1.axis_names == ("mp",)


def test_dp_lookup_matches_local():
    mesh = make_mesh(shape=(8,), axis_names=("dp",))
    cores, rng = _setup(num_tables=2)
    t, b, l = 2, 32, 5
    indices = jnp.asarray(rng.integers(0, E, size=(t, b, l)).astype(np.int32))
    lookup = make_dp_lookup(mesh, P_SHAPES, Q_SHAPES, RANKS)
    out = lookup(cores, indices)
    ref = _fixed_pool_lookup(cores, indices, P_SHAPES, Q_SHAPES, RANKS)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mesh_shape,axes", [
    ((2, 4), ("dp", "mp")),
    ((1, 8), ("dp", "mp")),
])
def test_table_sharded_lookup_matches_local(mesh_shape, axes):
    mesh = make_mesh(shape=mesh_shape, axis_names=axes)
    t, b, l = 8, 16, 4
    cores, rng = _setup(num_tables=t)
    indices = jnp.asarray(rng.integers(0, E, size=(t, b, l)).astype(np.int32))
    lookup = make_table_sharded_lookup(mesh, P_SHAPES, Q_SHAPES, RANKS)
    cores_sharded = shard_params_for_table_parallel(mesh, cores)
    idx_sharded = jax.device_put(
        indices, NamedSharding(mesh, P("mp", "dp", None))
    )
    out = jax.jit(lookup)(cores_sharded, idx_sharded)
    ref = _fixed_pool_lookup(cores, indices, P_SHAPES, Q_SHAPES, RANKS)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_table_sharded_gradients_match_local():
    """Core grads through the all_to_all exchange equal single-device."""
    mesh = make_mesh(shape=(2, 4), axis_names=("dp", "mp"))
    t, b, l = 8, 16, 4
    cores, rng = _setup(num_tables=t)
    indices = jnp.asarray(rng.integers(0, E, size=(t, b, l)).astype(np.int32))
    target = jnp.asarray(rng.normal(size=(t, b, D)).astype(np.float32))
    lookup = make_table_sharded_lookup(mesh, P_SHAPES, Q_SHAPES, RANKS)

    def loss_sharded(cores):
        return jnp.mean((lookup(cores, indices) - target) ** 2)

    def loss_local(cores):
        out = _fixed_pool_lookup(cores, indices, P_SHAPES, Q_SHAPES, RANKS)
        return jnp.mean((out - target) ** 2)

    cores_sharded = shard_params_for_table_parallel(mesh, cores)
    g_sharded = jax.jit(jax.grad(loss_sharded))(cores_sharded)
    g_local = jax.grad(loss_local)(cores)
    for gs, gl in zip(g_sharded, g_local):
        np.testing.assert_allclose(np.asarray(gs), np.asarray(gl),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("optim_name,use_cache", [
    ("sgd", False),
    ("sgd", True),
    ("exact_adagrad", True),
    ("rowwise", True),
])
def test_sharded_fused_train_step_matches_single_device(optim_name,
                                                        use_cache):
    """The batch-sharded fused train step (psum'd core grads, psum'd LFU
    deltas, aggregated cache updates) equals the single-device fused step
    on the concatenated batch — the reference's training semantics, on a
    mesh (round-2 verdict item #2)."""
    from fbtt_embedding_tpu.models.tt_embedding import (
        OptimType,
        TTEmbeddingParams,
        make_fused_train_step,
    )
    from fbtt_embedding_tpu.ops import cache as cache_ops
    from fbtt_embedding_tpu.parallel.sharded import (
        make_sharded_fused_train_step,
    )

    optim = {
        "sgd": OptimType.SGD,
        "exact_adagrad": OptimType.EXACT_ADAGRAD,
        "rowwise": OptimType.EXACT_ROWWISE_ADAGRAD,
    }[optim_name]
    is_sgd = optim == OptimType.SGD
    mesh = make_mesh(shape=(8,), axis_names=("dp",))
    t, B, L = 1, 32, 4
    nnz = t * B * L
    cores, rng = _setup(num_tables=t, seed=11)
    opt_state = (
        tuple(jnp.zeros((0,), jnp.float32) for _ in cores) if is_sgd
        else tuple(jnp.zeros_like(c) for c in cores)
    )
    cache = None
    if use_cache:
        kind = {"sgd": "none", "exact_adagrad": "full",
                "rowwise": "rowwise"}[optim_name]
        cache = cache_ops.make_cache_state(E, 32, D, kind,
                                           num_embeddings=E)
        hot = jnp.asarray(np.tile(np.arange(32), 8).astype(np.int32))
        cache = cache_ops.update_cache_state(cache, hot)
        cache = cache_ops.cache_populate(cache, cores, P_SHAPES, Q_SHAPES,
                                         RANKS)
    # mix of hot (cached) and cold rows so both paths carry gradient
    idx_np = np.where(
        rng.random(nnz) < 0.5,
        rng.integers(0, 32, size=nnz),
        rng.integers(0, E, size=nnz),
    ).astype(np.int32)
    indices_tbl = jnp.asarray(idx_np.reshape(t, B, L))
    d_out = jnp.asarray(rng.normal(size=(t, B, D)).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.random(nnz).astype(np.float32).reshape(t, B, L))
    lr_eps = (jnp.float32(0.05), jnp.float32(1e-10))

    def params():
        # fresh buffers each call — both steps donate their params
        return jax.tree.map(
            jnp.copy, TTEmbeddingParams(tuple(cores), opt_state, cache))

    sh_step = make_sharded_fused_train_step(
        mesh, P_SHAPES, Q_SHAPES, RANKS, t, B, L, optimizer=optim,
        use_cache=use_cache, probe_cache=use_cache,
    )
    out_s, prm_s = sh_step(params(), indices_tbl, d_out, lr_eps, weights=w)

    ref_step = make_fused_train_step(
        P_SHAPES, Q_SHAPES, RANKS, t, B, optimizer=optim,
        use_cache=use_cache, probe_cache=use_cache,
    )
    offsets = jnp.asarray(np.arange(0, nnz + 1, L, dtype=np.int32))
    out_r, prm_r = ref_step(
        params(), jnp.asarray(idx_np), offsets, d_out, lr_eps,
        weights=w.reshape(nnz))

    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_r),
                               rtol=1e-5, atol=1e-5)
    for a, b_ in zip(prm_s.tt_cores, prm_r.tt_cores):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6)
    for a, b_ in zip(prm_s.optimizer_state, prm_r.optimizer_state):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6)
    if use_cache:
        np.testing.assert_allclose(
            np.asarray(prm_s.cache.freq), np.asarray(prm_r.cache.freq))
        np.testing.assert_allclose(
            np.asarray(prm_s.cache.weight), np.asarray(prm_r.cache.weight),
            rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(prm_s.cache.opt_state),
            np.asarray(prm_r.cache.opt_state), rtol=1e-5, atol=1e-6)


def test_sharded_fused_train_step_table_batched():
    """num_tables > 1 (no cache): sharded step == single-device step."""
    from fbtt_embedding_tpu.models.tt_embedding import (
        OptimType,
        TTEmbeddingParams,
        make_fused_train_step,
    )
    from fbtt_embedding_tpu.parallel.sharded import (
        make_sharded_fused_train_step,
    )

    mesh = make_mesh(shape=(8,), axis_names=("dp",))
    t, B, L = 3, 16, 2
    nnz = t * B * L
    cores, rng = _setup(num_tables=t, seed=5)
    opt_state = tuple(jnp.zeros_like(c) for c in cores)
    idx_np = rng.integers(0, E, size=nnz).astype(np.int32)
    indices_tbl = jnp.asarray(idx_np.reshape(t, B, L))
    d_out = jnp.asarray(rng.normal(size=(t, B, D)).astype(np.float32) * 0.1)
    lr_eps = (jnp.float32(0.05), jnp.float32(1e-10))

    def params():
        return jax.tree.map(
            jnp.copy, TTEmbeddingParams(tuple(cores), opt_state, None))

    sh_step = make_sharded_fused_train_step(
        mesh, P_SHAPES, Q_SHAPES, RANKS, t, B, L,
        optimizer=OptimType.EXACT_ADAGRAD)
    out_s, prm_s = sh_step(params(), indices_tbl, d_out, lr_eps)
    ref_step = make_fused_train_step(
        P_SHAPES, Q_SHAPES, RANKS, t, B,
        optimizer=OptimType.EXACT_ADAGRAD)
    offsets = jnp.asarray(np.arange(0, nnz + 1, L, dtype=np.int32))
    out_r, prm_r = ref_step(params(), jnp.asarray(idx_np), offsets, d_out,
                            lr_eps)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_r),
                               rtol=1e-5, atol=1e-5)
    for a, b_ in zip(prm_s.tt_cores, prm_r.tt_cores):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6)
    for a, b_ in zip(prm_s.optimizer_state, prm_r.optimizer_state):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6)


def test_row_owned_cached_lookup_matches_uncached():
    """Row-OWNED sharded cache (slot % dp interleave + two-hop all_to_all
    value exchange) serves the same pooled output as the plain TT lookup
    right after populate (round-2 verdict item #5)."""
    from fbtt_embedding_tpu.ops import cache as cache_ops
    from fbtt_embedding_tpu.parallel.sharded import (
        make_dp_lookup,
        make_row_owned_cached_lookup,
        shard_cache_weight_by_owner,
    )
    from fbtt_embedding_tpu.utils.init import init_tt_cores

    p, q, r = [8, 8, 8], [4, 2, 2], [1, 8, 8, 1]
    e, d, c = 512, 16, 64
    b, l = 16, 4
    mesh = make_mesh(shape=(8,), axis_names=("dp",))
    rng = np.random.default_rng(7)
    cores = tuple(
        jnp.asarray(cc)
        for cc in init_tt_cores(rng, "uniform", 1, e, d, p, q, r))
    cache = cache_ops.make_cache_state(e, c, d, num_embeddings=e)
    hot = jnp.asarray(np.tile(np.arange(c), 5).astype(np.int32))
    cache = cache_ops.update_cache_state(cache, hot)
    cache = cache_ops.cache_populate(cache, cores, p, q, r)

    # mixed hits and misses
    indices = jnp.asarray(np.where(
        rng.random((1, b, l)) < 0.6,
        rng.integers(0, c, size=(1, b, l)),
        rng.integers(0, e, size=(1, b, l)),
    ).astype(np.int32))

    owned = make_row_owned_cached_lookup(mesh, p, q, r, cache_size=c)
    w_owned = shard_cache_weight_by_owner(mesh, cache.weight)
    out_o = np.asarray(owned(cores, cache.slots, w_owned, indices))
    plain = make_dp_lookup(mesh, p, q, r)
    out_p = np.asarray(plain(cores, indices))
    np.testing.assert_allclose(out_o, out_p, rtol=1e-5, atol=1e-5)


def test_dp_cached_lookup_matches_uncached():
    """Replicated-cache data-parallel lookup: cache-served rows equal the
    TT-computed rows right after populate, across an 8-device mesh."""
    import jax
    import jax.numpy as jnp
    from fbtt_embedding_tpu.ops import cache as cache_ops
    from fbtt_embedding_tpu.parallel.mesh import make_mesh
    from fbtt_embedding_tpu.parallel.sharded import (
        make_dp_cached_lookup,
        make_dp_lookup,
    )
    from fbtt_embedding_tpu.utils.init import init_tt_cores

    p, q, r = [8, 8, 8], [4, 2, 2], [1, 8, 8, 1]
    e, d = 512, 16
    t, b, l = 2, 16, 4
    mesh = make_mesh(shape=(8,), axis_names=("dp",))
    rng = np.random.default_rng(0)
    cores = tuple(
        jnp.asarray(c) for c in init_tt_cores(rng, "uniform", t, e, d, p, q, r)
    )
    cache = cache_ops.make_cache_state(e, 32, d, num_embeddings=e)
    hot = jnp.asarray(np.tile(np.arange(32), 10).astype(np.int32))
    cache = cache_ops.update_cache_state(cache, hot)
    cache = cache_ops.cache_populate(cache, tuple(c[0:1] for c in cores),
                                     p, q, r)
    # cache only valid for table 0's cores in this toy; use t=1 lookup
    cores1 = tuple(c[0:1] for c in cores)
    indices = jnp.asarray(
        rng.integers(0, 64, size=(1, b, l)).astype(np.int32))
    cached_fn = make_dp_cached_lookup(mesh, p, q, r)
    plain_fn = make_dp_lookup(mesh, p, q, r)
    out_c = np.asarray(cached_fn(cores1, cache, indices))
    out_p = np.asarray(plain_fn(cores1, indices))
    np.testing.assert_allclose(out_c, out_p, rtol=1e-5, atol=1e-5)


def test_sharded_fused_step_sampled_counting_and_cache_guard():
    """count=False skips the psum'd LFU deltas; count=True scales by
    count_interval; cache with num_tables != 1 is rejected (same
    constraint as the single-device module)."""
    from fbtt_embedding_tpu.models.tt_embedding import (
        OptimType,
        TTEmbeddingParams,
    )
    from fbtt_embedding_tpu.ops import cache as cache_ops
    from fbtt_embedding_tpu.parallel.sharded import (
        make_sharded_fused_train_step,
    )

    rng = np.random.default_rng(2)
    cores = tuple(
        jnp.asarray(c)
        for c in init_tt_cores(
            rng, "uniform", 1, E, 16, P_SHAPES, [4, 2, 2], [1, 8, 8, 1])
    )
    cache = cache_ops.make_cache_state(E, 32, 16, "none", num_embeddings=E)
    prm = TTEmbeddingParams(
        cores, tuple(jnp.zeros((0,), jnp.float32) for _ in cores), cache)
    mesh = make_mesh(shape=(4,), axis_names=("dp",),
                     devices=jax.devices()[:4])
    b, L = 8, 4
    step = make_sharded_fused_train_step(
        mesh, P_SHAPES, [4, 2, 2], [1, 8, 8, 1], 1, b, L, OptimType.SGD,
        use_cache=True, count_interval=2)
    idx = jnp.asarray(rng.integers(0, E, size=(1, b, L)).astype(np.int32))
    dout = jnp.asarray(rng.normal(size=(1, b, 16)).astype(np.float32) * 0.01)
    lr = (jnp.float32(0.01), jnp.float32(1e-10))

    def fresh():
        return jax.tree.map(jnp.copy, prm)

    _, p_skip = step(fresh(), idx, dout, lr, count=False)
    np.testing.assert_array_equal(
        np.asarray(p_skip.cache.freq), np.asarray(prm.cache.freq))
    _, p_cnt = step(fresh(), idx, dout, lr, count=True)
    ref = cache_ops.update_cache_state(prm.cache, idx.reshape(-1), scale=2)
    np.testing.assert_array_equal(
        np.asarray(p_cnt.cache.freq), np.asarray(ref.freq))

    with pytest.raises(AssertionError):
        make_sharded_fused_train_step(
            mesh, P_SHAPES, [4, 2, 2], [1, 8, 8, 1], 2, b, L,
            OptimType.SGD, use_cache=True)


@pytest.mark.parametrize("folded", [True, False])
def test_dp_serving_matches_local(folded):
    """Batch-sharded serving (folded + fallback) equals the single-device
    folded serve on the concatenated batch, cache hits included."""
    from fbtt_embedding_tpu.models.tt_embedding import (
        TTEmbeddingParams,
        make_serving_fn,
    )
    from fbtt_embedding_tpu.ops import cache as cache_ops
    from fbtt_embedding_tpu.parallel.sharded import make_dp_serving_fn

    mesh = make_mesh(shape=(8,), axis_names=("dp",))
    cores, rng = _setup(num_tables=1, seed=11)
    cache = cache_ops.make_cache_state(E, 32, D, num_embeddings=E)
    hot = jnp.asarray(np.tile(np.arange(32), 8).astype(np.int32))
    cache = cache_ops.update_cache_state(cache, hot)
    cache = cache_ops.cache_populate(cache, cores, P_SHAPES, Q_SHAPES,
                                     RANKS)
    params = TTEmbeddingParams(
        cores, tuple(jnp.zeros((0,), jnp.float32) for _ in cores), cache)

    B, L = 64, 4
    nnz = B * L
    idx_np = np.where(
        rng.random(nnz) < 0.5,
        rng.integers(0, 32, size=nnz),
        rng.integers(0, E, size=nnz),
    ).astype(np.int32)
    w_np = rng.random(nnz).astype(np.float32)

    fold, serve = make_dp_serving_fn(
        mesh, P_SHAPES, Q_SHAPES, RANKS, 1, B, L,
        probe_cache=True, folded=folded, interpret=folded)
    fp = fold(params)
    if folded:
        assert fp.setup is not None and fp.cache is not None
    got = serve(fp, jnp.asarray(idx_np.reshape(1, B, L)),
                jnp.asarray(w_np.reshape(1, B, L)))
    got_unw = serve(fp, jnp.asarray(idx_np.reshape(1, B, L)))

    ref_fn = make_serving_fn(P_SHAPES, Q_SHAPES, RANKS, 1, B,
                             probe_cache=True)
    offsets = jnp.asarray(np.arange(0, nnz + 1, L, dtype=np.int32))
    ref = ref_fn(params, jnp.asarray(idx_np), offsets, jnp.asarray(w_np))
    ref_unw = ref_fn(params, jnp.asarray(idx_np), offsets)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_unw), np.asarray(ref_unw),
                               rtol=2e-4, atol=2e-4)


def test_dp_serving_quantized_close_to_exact():
    """int8-quantized batch-sharded serving: replicated quantized
    pair/cache tables, outputs within the int8 rounding envelope of the
    unquantized dp serve."""
    from fbtt_embedding_tpu.models.tt_embedding import TTEmbeddingParams
    from fbtt_embedding_tpu.ops import cache as cache_ops
    from fbtt_embedding_tpu.parallel.sharded import make_dp_serving_fn

    mesh = make_mesh(shape=(8,), axis_names=("dp",))
    cores, rng = _setup(num_tables=1, seed=13)
    cache = cache_ops.make_cache_state(E, 32, D, num_embeddings=E)
    hot = jnp.asarray(np.tile(np.arange(32), 8).astype(np.int32))
    cache = cache_ops.update_cache_state(cache, hot)
    cache = cache_ops.cache_populate(cache, cores, P_SHAPES, Q_SHAPES,
                                     RANKS)
    params = TTEmbeddingParams(
        cores, tuple(jnp.zeros((0,), jnp.float32) for _ in cores), cache)

    B, L = 64, 4
    nnz = B * L
    idx_np = np.where(
        rng.random(nnz) < 0.5,
        rng.integers(0, 32, size=nnz),
        rng.integers(0, E, size=nnz),
    ).astype(np.int32)

    fold, serve = make_dp_serving_fn(
        mesh, P_SHAPES, Q_SHAPES, RANKS, 1, B, L,
        probe_cache=True, folded=True, interpret=True)
    expect = serve(fold(params), jnp.asarray(idx_np.reshape(1, B, L)))

    foldq, serveq = make_dp_serving_fn(
        mesh, P_SHAPES, Q_SHAPES, RANKS, 1, B, L,
        probe_cache=True, folded=True, interpret=True, quantize="int8")
    fpq = foldq(params)
    assert fpq.cache.weight.dtype == jnp.int8
    assert fpq.cache_scale is not None
    got = serveq(fpq, jnp.asarray(idx_np.reshape(1, B, L)))
    scale = float(np.abs(np.asarray(expect)).max())
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expect), atol=0.015 * scale + 1e-6)


@pytest.mark.parametrize("optim_name,semantics", [
    ("sgd", "reference"),
    ("exact_adagrad", "reference"),
    ("adam", "native"),
    ("rowwise", "native"),
])
def test_table_sharded_fused_train_step_matches_single_device(
        optim_name, semantics):
    """mp-axis core OWNERSHIP (round-4 verdict item #2): each chip owns
    T/mp tables' cores + optimizer state, pooled embeddings exchange via
    all_to_all, and the fused update runs on owned cores with no mp-axis
    grad traffic. Output, cores, and optimizer state must equal the
    single-device fused step on the full batch."""
    from fbtt_embedding_tpu.models.tt_embedding import (
        OptimType,
        TTEmbeddingParams,
        make_fused_train_step,
    )
    from fbtt_embedding_tpu.ops.fused_optim import native_optim_init
    from fbtt_embedding_tpu.parallel.sharded import (
        make_table_sharded_fused_train_step,
        shard_table_sharded_params,
    )

    optim = {
        "sgd": OptimType.SGD,
        "exact_adagrad": OptimType.EXACT_ADAGRAD,
        "adam": OptimType.ADAM,
        "rowwise": OptimType.EXACT_ROWWISE_ADAGRAD,
    }[optim_name]
    mesh = make_mesh(shape=(2, 4), axis_names=("dp", "mp"))
    t, B, L = 4, 16, 3
    nnz = t * B * L
    cores, rng = _setup(num_tables=t, seed=21)
    if semantics == "native":
        opt_state = native_optim_init(optim, cores)
    elif optim in (OptimType.SGD, OptimType.EXACT_SGD):
        opt_state = tuple(jnp.zeros((0,), jnp.float32) for _ in cores)
    else:
        opt_state = tuple(jnp.zeros_like(c) for c in cores)

    idx_np = rng.integers(0, E, size=nnz).astype(np.int32)
    indices_tbl = jnp.asarray(idx_np.reshape(t, B, L))
    # d_output lives in the exchanged layout [T, B, D] (batch sharded
    # (dp, mp)); globally it is the same array either way
    d_out = jnp.asarray(rng.normal(size=(t, B, D)).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.random(nnz).astype(np.float32).reshape(t, B, L))
    lr_eps = (jnp.float32(0.05), jnp.float32(1e-10))

    def params():
        return jax.tree.map(
            jnp.copy,
            TTEmbeddingParams(tuple(cores), tuple(opt_state), None))

    sh_step = make_table_sharded_fused_train_step(
        mesh, P_SHAPES, Q_SHAPES, RANKS, t, B, L, optimizer=optim,
        optim_semantics=semantics,
    )
    prm_in = shard_table_sharded_params(mesh, params())
    out_s, prm_s = sh_step(prm_in, indices_tbl, d_out, lr_eps, weights=w)

    ref_step = make_fused_train_step(
        P_SHAPES, Q_SHAPES, RANKS, t, B, optimizer=optim,
        optim_semantics=semantics,
    )
    offsets = jnp.asarray(np.arange(0, nnz + 1, L, dtype=np.int32))
    out_r, prm_r = ref_step(
        params(), jnp.asarray(idx_np), offsets, d_out, lr_eps,
        weights=w.reshape(nnz))

    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_r),
                               rtol=1e-5, atol=1e-5)
    for a, b_ in zip(prm_s.tt_cores, prm_r.tt_cores):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6)
    for a, b_ in zip(prm_s.optimizer_state, prm_r.optimizer_state):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6)


def test_table_sharded_fused_step_rejects_cache():
    from fbtt_embedding_tpu.models.tt_embedding import TTEmbeddingParams
    from fbtt_embedding_tpu.ops import cache as cache_ops
    from fbtt_embedding_tpu.parallel.sharded import (
        make_table_sharded_fused_train_step,
    )

    mesh = make_mesh(shape=(2, 4), axis_names=("dp", "mp"))
    cores, rng = _setup(num_tables=4, seed=3)
    step = make_table_sharded_fused_train_step(
        mesh, P_SHAPES, Q_SHAPES, RANKS, 4, 16, 3)
    cache = cache_ops.make_cache_state(E, 8, D, "none", num_embeddings=E)
    prm = TTEmbeddingParams(
        cores, tuple(jnp.zeros((0,), jnp.float32) for _ in cores), cache)
    idx = jnp.zeros((4, 16, 3), jnp.int32)
    d = jnp.zeros((4, 16, D), jnp.float32)
    with pytest.raises(AssertionError, match="cache"):
        step(prm, idx, d, (jnp.float32(0.1), jnp.float32(1e-10)))


def test_sharded_fused_step_hashed_cache_matches_single_device():
    """Hashed-tournament LFU counting on the mesh (round-4 verdict item
    #6): shard keys all_gather and the deterministic insert replays on
    the replicated table — bitwise-equal to the single-device step with
    hashtbl_size < E."""
    from fbtt_embedding_tpu.models.tt_embedding import (
        OptimType,
        TTEmbeddingParams,
        make_fused_train_step,
    )
    from fbtt_embedding_tpu.ops import cache as cache_ops
    from fbtt_embedding_tpu.parallel.sharded import (
        make_sharded_fused_train_step,
    )

    mesh = make_mesh(shape=(8,), axis_names=("dp",))
    t, B, L = 1, 32, 4
    nnz = B * L
    cores, rng = _setup(num_tables=t, seed=31)
    # hashed mode: hashtbl_size (128) < E (512)
    cache = cache_ops.make_cache_state(128, 16, D, "none")
    assert not cache.direct and not cache.wide
    hot = jnp.asarray(np.tile(np.arange(16), 8).astype(np.int32))
    cache = cache_ops.update_cache_state(cache, hot)
    cache = cache_ops.cache_populate(cache, cores, P_SHAPES, Q_SHAPES,
                                     RANKS)
    idx_np = np.where(rng.random(nnz) < 0.5,
                      rng.integers(0, 16, size=nnz),
                      rng.integers(0, E, size=nnz)).astype(np.int32)
    d_out = jnp.asarray(rng.normal(size=(t, B, D)).astype(np.float32) * 0.1)
    lr_eps = (jnp.float32(0.05), jnp.float32(1e-10))

    def params():
        return jax.tree.map(
            jnp.copy,
            TTEmbeddingParams(
                tuple(cores),
                tuple(jnp.zeros((0,), jnp.float32) for _ in cores), cache))

    sh_step = make_sharded_fused_train_step(
        mesh, P_SHAPES, Q_SHAPES, RANKS, t, B, L, optimizer=OptimType.SGD,
        use_cache=True, probe_cache=True)
    out_s, prm_s = sh_step(params(), jnp.asarray(idx_np.reshape(t, B, L)),
                           d_out, lr_eps)

    ref_step = make_fused_train_step(
        P_SHAPES, Q_SHAPES, RANKS, t, B, optimizer=OptimType.SGD,
        use_cache=True, probe_cache=True)
    offsets = jnp.asarray(np.arange(0, nnz + 1, L, dtype=np.int32))
    out_r, prm_r = ref_step(params(), jnp.asarray(idx_np), offsets, d_out,
                            lr_eps)

    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(prm_s.cache.keys),
                                  np.asarray(prm_r.cache.keys))
    np.testing.assert_array_equal(np.asarray(prm_s.cache.freq),
                                  np.asarray(prm_r.cache.freq))
    np.testing.assert_allclose(np.asarray(prm_s.cache.weight),
                               np.asarray(prm_r.cache.weight),
                               rtol=1e-5, atol=1e-6)
    for a, b_ in zip(prm_s.tt_cores, prm_r.tt_cores):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6)


def test_sharded_fused_step_wide_keys_matches_single_device():
    """Big-E wide-key cache on the mesh (round-4 verdict items #3/#6):
    [T, B, L, 2+ndim] key rows drive counting/probe/backward, parity vs
    the single-device fused step fed the same key rows."""
    from fbtt_embedding_tpu.models.tt_embedding import (
        OptimType,
        TTEmbeddingParams,
        make_fused_train_step,
    )
    from fbtt_embedding_tpu.ops import cache as cache_ops
    from fbtt_embedding_tpu.parallel.sharded import (
        make_sharded_fused_train_step,
    )

    p_big = [1300, 1300, 1300]          # prod > 2**31
    e_big = int(np.prod(p_big))
    mesh = make_mesh(shape=(8,), axis_names=("dp",))
    t, B, L = 1, 16, 4
    nnz = B * L
    rng = np.random.default_rng(33)
    cores = tuple(
        jnp.asarray(c) for c in init_tt_cores(
            rng, "uniform", 1, e_big, D, p_big, Q_SHAPES, RANKS))
    cache = cache_ops.make_cache_state(256, 8, D, "none", wide_keys=3)
    hot = rng.integers(2**31, e_big, size=4, dtype=np.int64)
    warm = cache_ops.wide_cache_keys(
        np.tile(hot, 8), p_big)
    cache = cache_ops.update_cache_state(cache, warm)
    cache = cache_ops.cache_populate(cache, cores, p_big, Q_SHAPES, RANKS)

    ids = np.where(rng.random(nnz) < 0.5,
                   hot[rng.integers(0, 4, size=nnz)],
                   rng.integers(0, e_big, size=nnz, dtype=np.int64))
    keyrows = np.asarray(cache_ops.wide_cache_keys(ids, p_big))
    d_out = jnp.asarray(rng.normal(size=(t, B, D)).astype(np.float32) * 0.1)
    lr_eps = (jnp.float32(0.05), jnp.float32(1e-10))

    def params():
        return jax.tree.map(
            jnp.copy,
            TTEmbeddingParams(
                tuple(cores),
                tuple(jnp.zeros((0,), jnp.float32) for _ in cores), cache))

    sh_step = make_sharded_fused_train_step(
        mesh, p_big, Q_SHAPES, RANKS, t, B, L, optimizer=OptimType.SGD,
        use_cache=True, probe_cache=True)
    idx4 = jnp.asarray(keyrows.reshape(t, B, L, keyrows.shape[1]))
    out_s, prm_s = sh_step(params(), idx4, d_out, lr_eps)

    ref_step = make_fused_train_step(
        p_big, Q_SHAPES, RANKS, t, B, optimizer=OptimType.SGD,
        use_cache=True, probe_cache=True)
    offsets = jnp.asarray(np.arange(0, nnz + 1, L, dtype=np.int32))
    out_r, prm_r = ref_step(params(), jnp.asarray(keyrows), offsets, d_out,
                            lr_eps)

    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(prm_s.cache.keys),
                                  np.asarray(prm_r.cache.keys))
    np.testing.assert_array_equal(np.asarray(prm_s.cache.freq),
                                  np.asarray(prm_r.cache.freq))
    np.testing.assert_allclose(np.asarray(prm_s.cache.weight),
                               np.asarray(prm_r.cache.weight),
                               rtol=1e-5, atol=1e-6)
    for a, b_ in zip(prm_s.tt_cores, prm_r.tt_cores):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6)


def test_csr_padding_feeds_sharded_step():
    """CSR on the mesh (round-4 verdict item #5): reference-layout CSR
    bags -> pad_csr_to_fixed -> sharded fused step equals the
    single-device fused step fed the CSR directly. Pads (-1/weight-0)
    must not perturb counting, cache probes, or gradients."""
    from fbtt_embedding_tpu.models.tt_embedding import (
        OptimType,
        TTEmbeddingParams,
        make_fused_train_step,
    )
    from fbtt_embedding_tpu.ops import cache as cache_ops
    from fbtt_embedding_tpu.ops.indexing import pad_csr_to_fixed
    from fbtt_embedding_tpu.parallel.sharded import (
        make_sharded_fused_train_step,
    )

    mesh = make_mesh(shape=(8,), axis_names=("dp",))
    t, B, Lmax = 1, 32, 5
    rng = np.random.default_rng(41)
    cores, _ = _setup(num_tables=t, seed=41)
    cache = cache_ops.make_cache_state(E, 16, D, "none", num_embeddings=E)
    hot = jnp.asarray(np.tile(np.arange(16), 8).astype(np.int32))
    cache = cache_ops.update_cache_state(cache, hot)
    cache = cache_ops.cache_populate(cache, cores, P_SHAPES, Q_SHAPES,
                                     RANKS)

    # variable-length bags (some empty), mixed hot/cold
    lens = rng.integers(0, Lmax + 1, size=t * B)
    nnz = int(lens.sum())
    offsets = np.zeros(t * B + 1, np.int32)
    offsets[1:] = np.cumsum(lens)
    idx_np = np.where(rng.random(nnz) < 0.5,
                      rng.integers(0, 16, size=nnz),
                      rng.integers(0, E, size=nnz)).astype(np.int32)
    w_np = rng.random(nnz).astype(np.float32)
    d_out = jnp.asarray(rng.normal(size=(t, B, D)).astype(np.float32) * 0.1)
    lr_eps = (jnp.float32(0.05), jnp.float32(1e-10))

    def params():
        return jax.tree.map(
            jnp.copy,
            TTEmbeddingParams(
                tuple(cores),
                tuple(jnp.zeros((0,), jnp.float32) for _ in cores), cache))

    idx_pad, w_pad = pad_csr_to_fixed(idx_np, offsets, t, B, Lmax,
                                      weights=w_np)
    assert idx_pad.shape == (t, B, Lmax)
    # (native or numpy re-layout — parity either way)
    sh_step = make_sharded_fused_train_step(
        mesh, P_SHAPES, Q_SHAPES, RANKS, t, B, Lmax,
        optimizer=OptimType.SGD, use_cache=True, probe_cache=True)
    out_s, prm_s = sh_step(params(), jnp.asarray(idx_pad), d_out, lr_eps,
                           weights=jnp.asarray(w_pad))

    ref_step = make_fused_train_step(
        P_SHAPES, Q_SHAPES, RANKS, t, B, optimizer=OptimType.SGD,
        use_cache=True, probe_cache=True)
    out_r, prm_r = ref_step(
        params(), jnp.asarray(idx_np), jnp.asarray(offsets), d_out,
        lr_eps, weights=jnp.asarray(w_np))

    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(prm_s.cache.freq),
                                  np.asarray(prm_r.cache.freq))
    np.testing.assert_allclose(np.asarray(prm_s.cache.weight),
                               np.asarray(prm_r.cache.weight),
                               rtol=1e-5, atol=1e-6)
    for a, b_ in zip(prm_s.tt_cores, prm_r.tt_cores):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6)


def test_csr_to_padded_native_matches_numpy():
    from fbtt_embedding_tpu import native
    from fbtt_embedding_tpu.ops.indexing import pad_csr_to_fixed

    rng = np.random.default_rng(7)
    t, B, Lmax = 3, 17, 6
    lens = rng.integers(0, Lmax + 1, size=t * B)
    nnz = int(lens.sum())
    offsets = np.zeros(t * B + 1, np.int32)
    offsets[1:] = np.cumsum(lens)
    idx = rng.integers(0, 1000, size=nnz).astype(np.int32)
    w = rng.random(nnz).astype(np.float32)

    # numpy fallback reference (force by bypassing the lib)
    bag_of = np.repeat(np.arange(t * B), lens)
    j = np.arange(nnz) - np.repeat(offsets[:-1], lens)
    idx_ref = np.full((t * B, Lmax), -1, np.int32)
    w_ref = np.zeros((t * B, Lmax), np.float32)
    idx_ref[bag_of, j] = idx
    w_ref[bag_of, j] = w

    idx_out, w_out = pad_csr_to_fixed(idx, offsets, t, B, Lmax, weights=w)
    np.testing.assert_array_equal(idx_out.reshape(t * B, Lmax), idx_ref)
    np.testing.assert_array_equal(w_out.reshape(t * B, Lmax), w_ref)
    # no-weights variant: ones at real slots
    idx_out2, w_out2 = pad_csr_to_fixed(idx, offsets, t, B, Lmax)
    np.testing.assert_array_equal(idx_out2, idx_out)
    np.testing.assert_array_equal(
        w_out2.reshape(t * B, Lmax), (idx_ref >= 0).astype(np.float32))
    # overflow raises
    import pytest as _pytest
    with _pytest.raises(ValueError, match="exceeds pooling_factor"):
        pad_csr_to_fixed(idx, offsets, t, B, int(lens.max()) - 1
                         if lens.max() > 0 else 0)


@pytest.mark.parametrize("mode", ["direct", "hashed"])
def test_row_owned_populate_matches_replicated(mode):
    """Owned populate (round-4 verdict item #4): winner selection
    replays replicated, each owner decompresses its slot % dp share —
    the owner-major weight must equal shard_cache_weight_by_owner of the
    replicated cache_populate result, counting fields bitwise-equal."""
    from fbtt_embedding_tpu.ops import cache as cache_ops
    from fbtt_embedding_tpu.parallel.sharded import (
        make_row_owned_populate,
        shard_cache_weight_by_owner,
    )

    mesh = make_mesh(shape=(8,), axis_names=("dp",))
    cores, rng = _setup(num_tables=1, seed=51)
    C = 16
    if mode == "direct":
        cache = cache_ops.make_cache_state(E, C, D, "none",
                                           num_embeddings=E)
    else:
        cache = cache_ops.make_cache_state(128, C, D, "none")
    traffic = jnp.asarray(
        np.concatenate([np.tile(np.arange(24), 6),
                        rng.integers(0, E, 64)]).astype(np.int32))
    cache = cache_ops.update_cache_state(cache, traffic)

    populate = make_row_owned_populate(
        mesh, P_SHAPES, Q_SHAPES, RANKS, C, opt_state_kind="rowwise")
    new_cache, w_owned, opt_owned = populate(cache, cores)

    ref = cache_ops.cache_populate(cache, cores, P_SHAPES, Q_SHAPES,
                                   RANKS)
    np.testing.assert_array_equal(np.asarray(new_cache.slots),
                                  np.asarray(ref.slots))
    np.testing.assert_array_equal(np.asarray(new_cache.freq),
                                  np.asarray(ref.freq))
    np.testing.assert_array_equal(np.asarray(new_cache.keys),
                                  np.asarray(ref.keys))
    assert new_cache.weight.shape[0] == 0  # rows live owner-side
    expect = shard_cache_weight_by_owner(mesh, ref.weight)
    np.testing.assert_allclose(np.asarray(w_owned), np.asarray(expect),
                               rtol=1e-6, atol=1e-7)
    assert opt_owned.shape == (C,)


@pytest.mark.parametrize("optim_name", ["sgd", "rowwise", "exact_adagrad"])
def test_row_owned_fused_train_step_matches_replicated(optim_name):
    """Owned-cache TRAINING (round-4 verdict item #4): hits served and
    updated through the two-hop exchange; must equal the replicated-cache
    batch-sharded fused step (which itself equals single-device)."""
    from fbtt_embedding_tpu.models.tt_embedding import (
        OptimType,
        TTEmbeddingParams,
    )
    from fbtt_embedding_tpu.ops import cache as cache_ops
    from fbtt_embedding_tpu.parallel.sharded import (
        make_row_owned_fused_train_step,
        make_row_owned_populate,
        make_sharded_fused_train_step,
        shard_cache_weight_by_owner,
    )

    optim = {
        "sgd": OptimType.SGD,
        "rowwise": OptimType.EXACT_ROWWISE_ADAGRAD,
        "exact_adagrad": OptimType.EXACT_ADAGRAD,
    }[optim_name]
    is_sgd = optim == OptimType.SGD
    kind = {"sgd": "none", "rowwise": "rowwise",
            "exact_adagrad": "full"}[optim_name]
    mesh = make_mesh(shape=(8,), axis_names=("dp",))
    t, B, L, C = 1, 32, 4, 16
    nnz = B * L
    cores, rng = _setup(num_tables=t, seed=61)
    opt_state = (
        tuple(jnp.zeros((0,), jnp.float32) for _ in cores) if is_sgd
        else tuple(jnp.zeros_like(c) for c in cores))
    cache = cache_ops.make_cache_state(E, C, D, kind, num_embeddings=E)
    hot = jnp.asarray(np.tile(np.arange(24), 8).astype(np.int32))
    cache = cache_ops.update_cache_state(cache, hot)

    # owned lifecycle: populate on owners
    populate = make_row_owned_populate(
        mesh, P_SHAPES, Q_SHAPES, RANKS, C, opt_state_kind=kind)
    cache_cnt, w_owned, opt_owned = populate(cache, cores)

    # replicated twin
    cache_rep = cache_ops.cache_populate(cache, cores, P_SHAPES, Q_SHAPES,
                                         RANKS)

    idx_np = np.where(rng.random(nnz) < 0.5,
                      rng.integers(0, 24, size=nnz),
                      rng.integers(0, E, size=nnz)).astype(np.int32)
    indices = jnp.asarray(idx_np.reshape(t, B, L))
    d_out = jnp.asarray(rng.normal(size=(t, B, D)).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.random(nnz).astype(np.float32).reshape(t, B, L))
    lr_eps = (jnp.float32(0.05), jnp.float32(1e-10))

    own_step = make_row_owned_fused_train_step(
        mesh, P_SHAPES, Q_SHAPES, RANKS, C, B, L, optimizer=optim)
    prm_o = TTEmbeddingParams(
        tuple(jnp.copy(c) for c in cores),
        tuple(jnp.copy(s) for s in opt_state), cache_cnt)
    out_o, prm_o, w_owned2, opt_owned2 = own_step(
        prm_o, w_owned, opt_owned, indices, d_out, lr_eps, weights=w)

    rep_step = make_sharded_fused_train_step(
        mesh, P_SHAPES, Q_SHAPES, RANKS, t, B, L, optimizer=optim,
        use_cache=True, probe_cache=True)
    prm_r = TTEmbeddingParams(
        tuple(jnp.copy(c) for c in cores),
        tuple(jnp.copy(s) for s in opt_state), cache_rep)
    out_r, prm_r = rep_step(prm_r, indices, d_out, lr_eps, weights=w)

    np.testing.assert_allclose(np.asarray(out_o), np.asarray(out_r),
                               rtol=1e-5, atol=1e-5)
    for a, b_ in zip(prm_o.tt_cores, prm_r.tt_cores):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(prm_o.cache.freq),
                                  np.asarray(prm_r.cache.freq))
    # owned weight (owner-major) == replicated weight re-laid out
    expect_w = shard_cache_weight_by_owner(mesh, prm_r.cache.weight)
    np.testing.assert_allclose(np.asarray(w_owned2), np.asarray(expect_w),
                               rtol=1e-5, atol=1e-6)
    if kind == "rowwise":
        order = (np.arange(C).reshape(C // 8, 8).T.reshape(C))
        np.testing.assert_allclose(
            np.asarray(opt_owned2),
            np.asarray(prm_r.cache.opt_state)[order],
            rtol=1e-5, atol=1e-7)
    elif kind == "full":
        expect_o = shard_cache_weight_by_owner(mesh,
                                               prm_r.cache.opt_state)
        np.testing.assert_allclose(np.asarray(opt_owned2),
                                   np.asarray(expect_o),
                                   rtol=1e-5, atol=1e-7)


def test_dp_serving_wide_keys_big_e():
    """Batch-sharded serving takes [T, B, L, 2+ndim] wide key rows at
    prod(p) > 2^31 — parity vs the single-device wide-key serve."""
    from fbtt_embedding_tpu.models.tt_embedding import (
        TTEmbeddingParams,
        make_serving_fn,
    )
    from fbtt_embedding_tpu.ops import cache as cache_ops
    from fbtt_embedding_tpu.parallel.sharded import make_dp_serving_fn

    p_big = [1300, 1300, 1300]
    e_big = int(np.prod(p_big))
    mesh = make_mesh(shape=(8,), axis_names=("dp",))
    t, B, L = 1, 16, 4
    nnz = B * L
    rng = np.random.default_rng(71)
    cores = tuple(
        jnp.asarray(c) for c in init_tt_cores(
            rng, "uniform", 1, e_big, D, p_big, Q_SHAPES, RANKS))
    cache = cache_ops.make_cache_state(256, 8, D, "none", wide_keys=3)
    hot = rng.integers(2**31, e_big, size=4, dtype=np.int64)
    cache = cache_ops.update_cache_state(
        cache, cache_ops.wide_cache_keys(np.tile(hot, 8), p_big))
    cache = cache_ops.cache_populate(cache, cores, p_big, Q_SHAPES, RANKS)
    prm = TTEmbeddingParams(
        cores, tuple(jnp.zeros((0,), jnp.float32) for _ in cores), cache)

    ids = np.where(rng.random(nnz) < 0.5,
                   hot[rng.integers(0, 4, size=nnz)],
                   rng.integers(0, e_big, size=nnz, dtype=np.int64))
    keyrows = np.asarray(cache_ops.wide_cache_keys(ids, p_big))
    k = keyrows.shape[1]

    fold, dserve = make_dp_serving_fn(
        mesh, p_big, Q_SHAPES, RANKS, t, B, L, probe_cache=True,
        folded=False)
    fp = fold(prm)
    got = np.asarray(dserve(fp, jnp.asarray(
        keyrows.reshape(t, B, L, k))))

    serve1 = make_serving_fn(p_big, Q_SHAPES, RANKS, t, B)
    offs = jnp.asarray(np.arange(0, nnz + 1, L, dtype=np.int32))
    expect = np.asarray(serve1(prm, jnp.asarray(keyrows), offs))
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-5)


def test_csr_pads_safe_without_weights_and_with_cached_last_row():
    """Review regressions (round 5): (a) pads must stay weight-0 even
    when the caller omits weights (the step substitutes ones); (b) a
    pad's -1 must MISS the direct-mode cache even when row E-1 is cached
    (negative gather indices wrap before mode='fill' handles them)."""
    from fbtt_embedding_tpu.models.tt_embedding import (
        OptimType,
        TTEmbeddingParams,
        make_fused_train_step,
    )
    from fbtt_embedding_tpu.ops import cache as cache_ops
    from fbtt_embedding_tpu.ops.indexing import pad_csr_to_fixed
    from fbtt_embedding_tpu.parallel.sharded import (
        make_sharded_fused_train_step,
    )

    # (b) unit: -1 misses even when the LAST row is cached
    cache = cache_ops.make_cache_state(E, 4, D, "none", num_embeddings=E)
    cores, rng = _setup(num_tables=1, seed=81)
    hot = jnp.asarray(np.tile(np.array([E - 1, 0, 1, 2]), 8)
                      .astype(np.int32))
    cache = cache_ops.update_cache_state(cache, hot)
    cache = cache_ops.cache_populate(cache, cores, P_SHAPES, Q_SHAPES,
                                     RANKS)
    assert int(cache.slots[E - 1]) >= 0  # E-1 really cached
    locs = cache_ops.cache_lookup(
        cache, jnp.asarray(np.array([-1, E - 1], np.int32)))
    assert int(locs[0]) == -1 and int(locs[1]) >= 0

    # (a+b) end-to-end: ragged CSR -> padded, step WITHOUT weights must
    # equal the single-device CSR step (pads contribute nothing)
    mesh = make_mesh(shape=(8,), axis_names=("dp",))
    t, B, Lmax = 1, 32, 4
    lens = rng.integers(0, Lmax + 1, size=t * B)
    lens[0] = Lmax  # ensure at least one full and one ragged bag
    lens[1] = 1
    nnz = int(lens.sum())
    offsets = np.zeros(t * B + 1, np.int32)
    offsets[1:] = np.cumsum(lens)
    idx_np = np.where(rng.random(nnz) < 0.5,
                      np.full(nnz, E - 1),
                      rng.integers(0, E, size=nnz)).astype(np.int32)
    d_out = jnp.asarray(rng.normal(size=(t, B, D)).astype(np.float32) * 0.1)
    lr_eps = (jnp.float32(0.05), jnp.float32(1e-10))

    def params():
        return jax.tree.map(
            jnp.copy,
            TTEmbeddingParams(
                tuple(cores),
                tuple(jnp.zeros((0,), jnp.float32) for _ in cores), cache))

    idx_pad, _w_unused = pad_csr_to_fixed(idx_np, offsets, t, B, Lmax)
    sh_step = make_sharded_fused_train_step(
        mesh, P_SHAPES, Q_SHAPES, RANKS, t, B, Lmax,
        optimizer=OptimType.SGD, use_cache=True, probe_cache=True)
    # NO weights passed — the ones substitution must not weight pads
    out_s, prm_s = sh_step(params(), jnp.asarray(idx_pad), d_out, lr_eps)

    ref_step = make_fused_train_step(
        P_SHAPES, Q_SHAPES, RANKS, t, B, optimizer=OptimType.SGD,
        use_cache=True, probe_cache=True)
    out_r, prm_r = ref_step(
        params(), jnp.asarray(idx_np), jnp.asarray(offsets), d_out,
        lr_eps)

    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_r),
                               rtol=1e-5, atol=1e-5)
    for a, b_ in zip(prm_s.tt_cores, prm_r.tt_cores):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(prm_s.cache.weight),
                               np.asarray(prm_r.cache.weight),
                               rtol=1e-5, atol=1e-6)


def test_csr_step_adapter_direct_csr_api():
    """csr_step_adapter: the sharded step behind the reference's raw
    (indices, offsets) API — equal to the single-device CSR step."""
    from fbtt_embedding_tpu.models.tt_embedding import (
        OptimType,
        TTEmbeddingParams,
        make_fused_train_step,
    )
    from fbtt_embedding_tpu.parallel.sharded import (
        csr_step_adapter,
        make_sharded_fused_train_step,
    )

    mesh = make_mesh(shape=(8,), axis_names=("dp",))
    t, B, Lmax = 1, 32, 4
    cores, rng = _setup(num_tables=t, seed=91)
    lens = rng.integers(0, Lmax + 1, size=t * B)
    nnz = int(lens.sum())
    offsets = np.zeros(t * B + 1, np.int32)
    offsets[1:] = np.cumsum(lens)
    idx_np = rng.integers(0, E, size=nnz).astype(np.int32)
    d_out = jnp.asarray(rng.normal(size=(t, B, D)).astype(np.float32) * 0.1)
    lr_eps = (jnp.float32(0.05), jnp.float32(1e-10))

    def params():
        return jax.tree.map(
            jnp.copy,
            TTEmbeddingParams(
                tuple(cores),
                tuple(jnp.zeros((0,), jnp.float32) for _ in cores), None))

    step = csr_step_adapter(
        make_sharded_fused_train_step(
            mesh, P_SHAPES, Q_SHAPES, RANKS, t, B, Lmax,
            optimizer=OptimType.SGD),
        t, B, Lmax)
    out_s, prm_s = step(params(), idx_np, offsets, d_out, lr_eps)

    ref_step = make_fused_train_step(
        P_SHAPES, Q_SHAPES, RANKS, t, B, optimizer=OptimType.SGD)
    out_r, prm_r = ref_step(params(), jnp.asarray(idx_np),
                            jnp.asarray(offsets), d_out, lr_eps)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_r),
                               rtol=1e-5, atol=1e-5)
    for a, b_ in zip(prm_s.tt_cores, prm_r.tt_cores):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6)
