"""Failure-detection tests (utils/guard.py): finite flags, the sampled
step guard, and cross-replica drift detection on the 8-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fbtt_embedding_tpu.utils.guard import (
    NonFiniteError,
    ReplicaDivergenceError,
    assert_finite,
    assert_replicas_agree,
    finite_flag,
    guard_step,
)


def test_finite_flag_clean_and_dirty():
    tree = {"a": jnp.ones((3, 4)), "b": [jnp.zeros(2), jnp.arange(5)]}
    assert bool(finite_flag(tree))
    tree["b"][0] = jnp.array([0.0, jnp.nan])
    assert not bool(finite_flag(tree))
    # integer leaves (LFU counts, index tables) are ignored
    assert bool(finite_flag({"counts": jnp.full((4,), 2**31 - 1)}))
    # works under jit
    assert not bool(jax.jit(finite_flag)({"x": jnp.array([jnp.inf])}))


def test_assert_finite_names_the_leaf():
    tree = {"cores": [jnp.ones(3), jnp.array([1.0, jnp.inf])]}
    with pytest.raises(NonFiniteError) as e:
        assert_finite(tree)
    msg = str(e.value)
    assert "cores" in msg and "1" in msg and "Inf" in msg


def test_guard_step_samples_and_raises():
    calls = {"n": 0}

    def step(params, x):
        calls["n"] += 1
        new = jax.tree.map(lambda p: p / x, params)
        return x, new

    g = guard_step(step, every=2)
    params = {"w": jnp.ones(4)}
    # first call: not checked (every=2) even though x=0 poisons params
    _, params = g(params, jnp.float32(0.0))
    assert calls["n"] == 1
    # second call trips the sampled check and names the leaf
    with pytest.raises(NonFiniteError, match="w"):
        g(params, jnp.float32(1.0))


def test_guard_step_clean_passthrough():
    def step(params, x):
        return x, jax.tree.map(lambda p: p + x, params)

    g = guard_step(step, every=1)
    params = {"w": jnp.zeros(3)}
    for i in range(3):
        out, params = g(params, jnp.float32(i))
    np.testing.assert_allclose(np.asarray(params["w"]), 3.0)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_replica_agreement():
    from fbtt_embedding_tpu.parallel.mesh import make_mesh

    mesh = make_mesh((2, 4), ("dp", "mp"))
    v = jnp.ones((4,), jnp.float32)
    assert_replicas_agree(mesh, "dp", v)  # replicated: no raise
    assert_replicas_agree(mesh, "mp", jnp.float32(3.0))

    # a genuinely divergent "replicated" value, constructed per-replica
    # inside shard_map (device_put of differing shards would be
    # re-replicated by the checker's in_spec)
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def per_replica(_):
        return jax.lax.axis_index("dp").astype(jnp.float32)

    v_div = shard_map(
        per_replica, mesh=mesh, in_specs=(P(),), out_specs=P(),
        check_vma=False,
    )(jnp.float32(0))
    with pytest.raises(ReplicaDivergenceError):
        assert_replicas_agree(mesh, "dp", v_div, what="step_count")


# ------------------------------------------------- Mosaic runtime probe

def test_mosaic_probe_false_on_cpu():
    """The probe compiles a real Pallas kernel; on the CPU backend Mosaic
    lowering is unavailable, so it must report False (not raise)."""
    from fbtt_embedding_tpu.ops import lookup

    lookup._mosaic_probe.cache_clear()
    try:
        assert lookup._mosaic_probe() is False
    finally:
        lookup._mosaic_probe.cache_clear()


def test_gates_degrade_when_probe_fails(monkeypatch):
    """A backend that claims "tpu" but whose Mosaic rejects the kernels
    must fall back to the XLA path via the gates, not crash at dispatch."""
    from fbtt_embedding_tpu.ops import lookup

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(lookup, "_mosaic_probe", lambda: False)
    # headline-like config that passes every static gate
    assert not lookup.pallas_sorted_available(
        (200, 220, 250), (4, 4, 4), (1, 32, 32, 1), 1, 512)
    assert not lookup.pallas_forward_available(
        (200, 220, 250), (4, 4, 4), (1, 32, 32, 1), 1, 512)
    assert not lookup.pallas_backward_available(
        (200, 220, 250), (4, 4, 4), (1, 32, 32, 1), 1, 512)
