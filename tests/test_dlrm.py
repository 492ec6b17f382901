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


def test_dlrm_tt_auc_matches_uncompressed():
    """Quality parity: on synthetic interaction-driven CTR data (labels
    from products of per-table hidden row effects — the signal shape
    DLRM's pairwise-dot architecture represents), the TT-compressed
    DLRM must reach the same held-out AUC as an uncompressed-table
    DLRM with identical MLPs — the TT-Rec paper's core claim, which
    the reference never tests.

    Settings note: a linear-in-row-effects label is NOT representable
    through DLRM's interaction layer (both models sit at AUC 0.5), and
    the reference's approx-normal init stalls at this toy scale
    (measured 0.49-0.52 vs 0.65 for uniform/normal at lr 0.1-1.0) —
    uniform init and an interaction-driven label make both models
    learn.
    """
    from fbtt_embedding_tpu.models.dlrm import (
        _interact,
        _mlp_apply,
        bce_loss,
    )

    cfg = DLRMConfig(
        num_tables=4, num_embeddings=128, embedding_dim=16,
        tt_p_shapes=[4, 6, 6], tt_q_shapes=[4, 2, 2], tt_ranks=[8, 8],
        dense_dim=13, bottom_mlp_dims=[32, 16], top_mlp_dims=[32, 1],
        pooling_factor=2,
    )
    rng = np.random.default_rng(42)
    E, D, T, L, B = (cfg.num_embeddings, cfg.embedding_dim,
                     cfg.num_tables, cfg.pooling_factor, 512)
    row_effect = rng.normal(size=(T, E)).astype(np.float32)
    w_dense = rng.normal(size=(cfg.dense_dim,)).astype(np.float32) * 0.3

    def synth(n, seed):
        r = np.random.default_rng(seed)
        dense = r.normal(size=(n, cfg.dense_dim)).astype(np.float32)
        idx = r.integers(0, E, size=(T, n, L)).astype(np.int32)
        z = np.stack([row_effect[t][idx[t]].sum(-1) for t in range(T)])
        score = dense @ w_dense + z[0] * z[1] + z[2] * z[3]
        pr = 1.0 / (1.0 + np.exp(-score / np.std(score) * 3.0))
        labels = (r.random(n) < pr).astype(np.float32)
        return jnp.asarray(dense), jnp.asarray(idx), jnp.asarray(labels)

    def auc(scores, labels):
        order = np.argsort(scores)
        ranks = np.empty_like(order, dtype=np.float64)
        ranks[order] = np.arange(1, len(scores) + 1)
        pos = labels > 0.5
        n_pos, n_neg = pos.sum(), (~pos).sum()
        return (ranks[pos].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)

    d_te, i_te, y_te = synth(2048, 999)

    # --- TT DLRM
    params = init_dlrm_params(cfg, seed=7, weight_dist="uniform")
    step = make_dlrm_train_step(cfg, mesh=None, learning_rate=0.1)
    for s in range(800):
        dense, idx, y = synth(B, s)
        _, params = step(params, dense, idx, y)
    logits_tt = dlrm_forward(params, cfg, d_te, i_te)
    auc_tt = auc(np.asarray(logits_tt), np.asarray(y_te))

    # --- uncompressed DLRM: dense [T, E, D] tables, same MLP stack
    r2 = np.random.default_rng(7)
    p2 = init_dlrm_params(cfg, seed=7, weight_dist="uniform")
    tables = jnp.asarray(
        r2.normal(size=(T, E, D)).astype(np.float32) / np.sqrt(D))
    up = {"tables": tables, "bottom": p2.bottom_mlp, "top": p2.top_mlp}

    def u_forward(up_, dense, idx):
        emb = up_["tables"][jnp.arange(T)[:, None, None], idx].sum(axis=2)
        bottom_out = _mlp_apply(up_["bottom"], dense)
        z = _interact(bottom_out, emb)
        return _mlp_apply(up_["top"], z)[:, 0]

    @jax.jit
    def u_step(up_, dense, idx, y):
        def lf(q):
            return bce_loss(u_forward(q, dense, idx), y)
        loss, g = jax.value_and_grad(lf)(up_)
        return loss, jax.tree.map(lambda a, b: a - 0.1 * b, up_, g)

    for s in range(800):
        dense, idx, y = synth(B, s)
        _, up = u_step(up, dense, idx, y)
    auc_u = auc(np.asarray(u_forward(up, d_te, i_te)), np.asarray(y_te))

    assert auc_tt > 0.6, (auc_tt, auc_u)
    assert auc_tt >= auc_u - 0.05, (auc_tt, auc_u)
