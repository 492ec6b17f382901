"""End-task correctness: DLRM learns a synthetic CTR task (AUC check).

BASELINE.md correctness row asks for end-task parity; this trains the
flagship model on a separable synthetic click task where the label depends
on which embedding rows appear, and asserts the model reaches high AUC —
the TT-compressed tables must carry real signal through the fused
lookup/backward path for this to pass.
"""

import numpy as np
import jax.numpy as jnp

from fbtt_embedding_tpu.models.dlrm import (
    DLRMConfig,
    dlrm_forward,
    init_dlrm_params,
    make_dlrm_train_step,
)


def auc(labels: np.ndarray, scores: np.ndarray) -> float:
    order = np.argsort(scores)
    ranks = np.empty_like(order, dtype=np.float64)
    ranks[order] = np.arange(1, len(scores) + 1)
    pos = labels > 0.5
    n_pos, n_neg = pos.sum(), (~pos).sum()
    return (ranks[pos].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)


def make_batch(rng, cfg, b, hot_rows):
    """Label = 1 iff the SAME 'hot' row appears in both tables' bags —
    the signal rides the t0·t1 interaction dot directly (DLRM's top MLP
    sees pairwise dots, not raw embeddings)."""
    dense = rng.normal(size=(b, cfg.dense_dim)).astype(np.float32)
    indices = rng.integers(
        0, cfg.num_embeddings,
        size=(cfg.num_tables, b, cfg.pooling_factor)).astype(np.int32)
    labels = rng.integers(0, 2, size=b).astype(np.float32)
    # scrub hot rows everywhere, then inject into positives
    for t in range(cfg.num_tables):
        for i in range(b):
            bag = indices[t, i]
            while np.isin(bag, hot_rows).any():
                bag[np.isin(bag, hot_rows)] = rng.integers(
                    0, cfg.num_embeddings, int(np.isin(bag, hot_rows).sum()))
            indices[t, i] = bag
    for i in range(b):
        if labels[i] > 0.5:
            h = hot_rows[rng.integers(0, len(hot_rows))]
            indices[0, i, 0] = h
            indices[1, i, 0] = h
    return (jnp.asarray(dense), jnp.asarray(indices), jnp.asarray(labels))


def test_dlrm_learns_synthetic_ctr():
    cfg = DLRMConfig(
        num_tables=2,
        num_embeddings=216,
        embedding_dim=16,
        tt_p_shapes=[6, 6, 6],
        tt_q_shapes=[4, 2, 2],
        tt_ranks=[8, 8],
        dense_dim=4,
        bottom_mlp_dims=[16, 16],
        top_mlp_dims=[32, 1],
        pooling_factor=2,
    )
    rng = np.random.default_rng(0)
    hot_rows = rng.choice(216, size=4, replace=False).astype(np.int32)
    params = init_dlrm_params(cfg, seed=1)
    step = make_dlrm_train_step(cfg, mesh=None, learning_rate=0.05)

    for it in range(300):
        batch = make_batch(rng, cfg, 128, hot_rows)
        loss, params = step(params, *batch)
    assert np.isfinite(float(loss))

    # held-out evaluation
    dense, indices, labels = make_batch(rng, cfg, 512, hot_rows)
    scores = np.asarray(dlrm_forward(params, cfg, dense, indices))
    a = auc(np.asarray(labels), scores)
    assert a > 0.9, f"AUC {a:.3f} — model failed to learn the synthetic task"
