"""DLRM end-to-end: single-device training and sharded-parity tests."""

import jax
import jax.numpy as jnp
import numpy as np

from fbtt_embedding_tpu.models.dlrm import (
    DLRMConfig,
    dlrm_forward,
    init_dlrm_params,
    make_dlrm_train_step,
    shard_dlrm_params,
)
from fbtt_embedding_tpu.parallel.mesh import make_mesh

CFG = DLRMConfig(
    num_tables=8,
    num_embeddings=512,
    embedding_dim=16,
    tt_p_shapes=[8, 8, 8],
    tt_q_shapes=[4, 2, 2],
    tt_ranks=[8, 8],
    dense_dim=13,
    bottom_mlp_dims=[32, 16],
    top_mlp_dims=[32, 1],
    pooling_factor=4,
)


def _batch(rng, b):
    dense = rng.normal(size=(b, CFG.dense_dim)).astype(np.float32)
    indices = rng.integers(
        0, CFG.num_embeddings, size=(CFG.num_tables, b, CFG.pooling_factor)
    ).astype(np.int32)
    labels = rng.integers(0, 2, size=(b,)).astype(np.float32)
    return jnp.asarray(dense), jnp.asarray(indices), jnp.asarray(labels)


def test_dlrm_forward_shape():
    params = init_dlrm_params(CFG, seed=0, weight_dist="normal")
    rng = np.random.default_rng(0)
    dense, indices, labels = _batch(rng, 32)
    logits = dlrm_forward(params, CFG, dense, indices)
    assert logits.shape == (32,)
    assert np.isfinite(np.asarray(logits)).all()


def test_dlrm_training_decreases_loss():
    params = init_dlrm_params(CFG, seed=0, weight_dist="normal")
    step = make_dlrm_train_step(CFG, mesh=None, learning_rate=0.05)
    rng = np.random.default_rng(1)
    dense, indices, labels = _batch(rng, 64)
    losses = []
    for _ in range(20):
        loss, params = step(params, dense, indices, labels)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_dlrm_sharded_matches_single_device():
    """Hybrid-parallel (table-sharded + dp) step == single-device step."""
    mesh = make_mesh(shape=(2, 4), axis_names=("dp", "mp"))
    rng = np.random.default_rng(2)
    b = 32
    dense, indices, labels = _batch(rng, b)

    params_single = init_dlrm_params(CFG, seed=3, weight_dist="normal")
    step_single = make_dlrm_train_step(CFG, mesh=None, learning_rate=0.05)

    params_sharded = shard_dlrm_params(
        init_dlrm_params(CFG, seed=3, weight_dist="normal"), CFG, mesh
    )
    step_sharded = make_dlrm_train_step(CFG, mesh=mesh, learning_rate=0.05)

    for i in range(3):
        loss_s, params_single = step_single(
            params_single, dense, indices, labels
        )
        loss_m, params_sharded = step_sharded(
            params_sharded, dense, indices, labels
        )
        np.testing.assert_allclose(
            float(loss_s), float(loss_m), rtol=1e-5,
            err_msg=f"step {i} loss mismatch",
        )
    for cs, cm in zip(params_single.tt_cores, params_sharded.tt_cores):
        np.testing.assert_allclose(
            np.asarray(cs), np.asarray(cm), rtol=1e-4, atol=1e-5
        )
