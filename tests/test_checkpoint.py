"""Checkpoint / resume round-trips (coverage the reference never had —
its persistence is implicit via torch state_dict, SURVEY §5)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fbtt_embedding_tpu import OptimType, TTEmbeddingBag
from fbtt_embedding_tpu.utils import checkpoint as ckpt


def _trained_module(tmp_seed=0):
    emb = TTEmbeddingBag(
        num_embeddings=1000, embedding_dim=16, tt_ranks=[4, 4],
        optimizer=OptimType.EXACT_ADAGRAD, learning_rate=0.1,
        use_cache=True, cache_size=8, hashtbl_size=64,
        weight_dist="uniform", seed=tmp_seed,
    )
    rng = np.random.default_rng(tmp_seed)
    for _ in range(3):
        idx = rng.integers(0, 1000, 40).astype(np.int64)
        offs = np.arange(0, 41, 4, dtype=np.int64)
        emb(idx, offs)
        emb.backward(rng.normal(size=(10, 16)).astype(np.float32))
    emb.cache_populate()
    return emb


@pytest.mark.parametrize("fmt", ["orbax", "npz"])
def test_params_roundtrip(tmp_path, fmt):
    emb = _trained_module()
    params = emb.params
    path = str(tmp_path / ("ck" if fmt == "orbax" else "ck.npz"))
    if fmt == "orbax":
        ckpt.save(path, params)
        restored = ckpt.restore(path, like=params)
    else:
        ckpt.save_npz(path, params)
        restored = ckpt.restore_npz(path, like=params)

    fresh = TTEmbeddingBag(
        num_embeddings=1000, embedding_dim=16, tt_ranks=[4, 4],
        optimizer=OptimType.EXACT_ADAGRAD, learning_rate=0.1,
        use_cache=True, cache_size=8, hashtbl_size=64,
        weight_dist="uniform", seed=99,
    )
    fresh.load_params(restored)
    fresh.warmup = emb.warmup
    for a, b in zip(emb.tt_cores, fresh.tt_cores):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(emb.optimizer_state, fresh.optimizer_state):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(emb.cache.weight), np.asarray(fresh.cache.weight))

    # resumed module produces identical output
    rng = np.random.default_rng(7)
    idx = rng.integers(0, 1000, 20).astype(np.int64)
    offs = np.arange(0, 21, 2, dtype=np.int64)
    np.testing.assert_array_equal(
        np.asarray(emb(idx, offs)), np.asarray(fresh(idx, offs)))


def test_state_dict_roundtrip():
    emb = _trained_module()
    state = {k: np.asarray(v) for k, v in emb.state_dict().items()}
    fresh = TTEmbeddingBag(
        num_embeddings=1000, embedding_dim=16, tt_ranks=[4, 4],
        optimizer=OptimType.EXACT_ADAGRAD, learning_rate=0.1,
        use_cache=True, cache_size=8, hashtbl_size=64,
        weight_dist="uniform", seed=123,
    )
    fresh.load_state_dict(state)
    fresh.warmup = emb.warmup
    rng = np.random.default_rng(7)
    idx = rng.integers(0, 1000, 20).astype(np.int64)
    offs = np.arange(0, 21, 2, dtype=np.int64)
    np.testing.assert_array_equal(
        np.asarray(emb(idx, offs)), np.asarray(fresh(idx, offs)))


def test_sharded_pytree_roundtrip(tmp_path):
    """Orbax save/restore of mesh-sharded arrays: restoring with a
    sharded ``like`` must reproduce both values AND shardings (the
    multi-chip resume path; single-host here, the Orbax API is the
    multi-host one)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from fbtt_embedding_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(shape=(8,), axis_names=("dp",))
    rng = np.random.default_rng(3)
    host = {
        "cores": jnp.asarray(rng.normal(size=(8, 16, 32)).astype(np.float32)),
        "freq": jnp.asarray(rng.integers(0, 9, size=(64,)).astype(np.int32)),
    }
    sh = {
        "cores": NamedSharding(mesh, P("dp")),
        "freq": NamedSharding(mesh, P()),
    }
    sharded = {k: jax.device_put(v, sh[k]) for k, v in host.items()}
    path = str(tmp_path / "sharded_ckpt")
    ckpt.save(path, sharded)

    like = {k: jax.device_put(jnp.zeros_like(v), sh[k])
            for k, v in host.items()}
    got = ckpt.restore(path, like=like)
    for k in host:
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(host[k]))
        assert got[k].sharding == sh[k], (k, got[k].sharding)


def test_load_state_dict_rejects_truncated_optimizer_state():
    emb = _trained_module()
    state = {k: np.asarray(v) for k, v in emb.state_dict().items()}
    for k in [k for k in state if k.startswith("optimizer_state.")]:
        del state[k]
    fresh = TTEmbeddingBag(
        num_embeddings=1000, embedding_dim=16, tt_ranks=[4, 4],
        optimizer=OptimType.EXACT_ADAGRAD, learning_rate=0.1,
        use_cache=True, cache_size=8, hashtbl_size=64,
        weight_dist="uniform", seed=123,
    )
    with pytest.raises(KeyError, match="optimizer_state"):
        fresh.load_state_dict(state)
