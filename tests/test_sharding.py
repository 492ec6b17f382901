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
