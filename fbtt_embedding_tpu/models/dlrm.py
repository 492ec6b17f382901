"""DLRM-style recommendation model over TT-compressed embedding tables.

The reference ships no model zoo — its README positions TTEmbeddingBag as a
drop-in for DLRM-style recommenders (TT-Rec paper, ``README.md:5``). This
module provides that flagship end-to-end model, TPU-native: a data-parallel
dense tower (bottom MLP → feature interaction → top MLP) fed by
table-sharded TT embeddings exchanged with all_to_all
(:mod:`fbtt_embedding_tpu.parallel.sharded`).

All state lives in one pytree (:class:`DLRMParams`); the train step is a
single jitted program with donated buffers.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fbtt_embedding_tpu.parallel.sharded import (
    _fixed_pool_lookup,
    make_table_sharded_lookup,
)
from fbtt_embedding_tpu.utils.init import init_tt_cores


@struct.dataclass
class MLPParams:
    weights: Tuple[jnp.ndarray, ...]
    biases: Tuple[jnp.ndarray, ...]


@struct.dataclass
class DLRMParams:
    tt_cores: Tuple[jnp.ndarray, ...]
    bottom_mlp: MLPParams
    top_mlp: MLPParams


class DLRMConfig:
    """Static model configuration."""

    def __init__(
        self,
        num_tables: int = 8,
        num_embeddings: int = 1_000_000,
        embedding_dim: int = 64,
        tt_p_shapes: Sequence[int] = (100, 100, 100),
        tt_q_shapes: Sequence[int] = (4, 4, 4),
        tt_ranks: Sequence[int] = (32, 32),
        dense_dim: int = 13,
        bottom_mlp_dims: Sequence[int] = (512, 256, 64),
        top_mlp_dims: Sequence[int] = (512, 256, 1),
        pooling_factor: int = 10,
    ):
        assert int(np.prod(tt_q_shapes)) == embedding_dim
        assert bottom_mlp_dims[-1] == embedding_dim, (
            "bottom MLP must project dense features to embedding_dim"
        )
        self.num_tables = num_tables
        self.num_embeddings = num_embeddings
        self.embedding_dim = embedding_dim
        self.tt_p_shapes = list(tt_p_shapes)
        self.tt_q_shapes = list(tt_q_shapes)
        self.tt_ranks = (
            [1] + list(tt_ranks) + [1]
            if len(tt_ranks) == len(tt_p_shapes) - 1 else list(tt_ranks)
        )
        self.dense_dim = dense_dim
        self.bottom_mlp_dims = list(bottom_mlp_dims)
        self.top_mlp_dims = list(top_mlp_dims)
        self.pooling_factor = pooling_factor

    @property
    def interaction_dim(self) -> int:
        # pairwise dots among (num_tables + 1) vectors + the bottom output
        f = self.num_tables + 1
        return f * (f - 1) // 2 + self.embedding_dim


def _init_mlp(rng: np.random.Generator, dims: Sequence[int]) -> MLPParams:
    ws, bs = [], []
    for fan_in, fan_out in zip(dims[:-1], dims[1:]):
        bound = np.sqrt(6.0 / (fan_in + fan_out))
        ws.append(jnp.asarray(
            rng.uniform(-bound, bound, size=(fan_in, fan_out))
            .astype(np.float32)
        ))
        bs.append(jnp.zeros((fan_out,), jnp.float32))
    return MLPParams(tuple(ws), tuple(bs))


def init_dlrm_params(
    cfg: DLRMConfig, seed: int = 0, weight_dist: str = "approx-normal"
) -> DLRMParams:
    """approx-normal default: plain "normal" init's core magnitudes scale
    as 1/sqrt(E) per core, so reconstructed rows are ~E^{-3/2} — gradients
    through the multiplicative TT chain vanish at large E. approx-normal
    (the reference default) keeps per-core magnitudes bounded away from
    zero by construction."""
    rng = np.random.default_rng(seed)
    cores = tuple(
        jnp.asarray(c)
        for c in init_tt_cores(
            rng, weight_dist, cfg.num_tables, cfg.num_embeddings,
            cfg.embedding_dim, cfg.tt_p_shapes, cfg.tt_q_shapes, cfg.tt_ranks,
        )
    )
    bottom = _init_mlp(rng, [cfg.dense_dim] + cfg.bottom_mlp_dims)
    top = _init_mlp(rng, [cfg.interaction_dim] + cfg.top_mlp_dims)
    return DLRMParams(cores, bottom, top)


def _mlp_apply(mlp: MLPParams, x: jnp.ndarray,
               final_activation: bool = False) -> jnp.ndarray:
    n = len(mlp.weights)
    for i, (w, b) in enumerate(zip(mlp.weights, mlp.biases)):
        x = x @ w + b
        if i < n - 1 or final_activation:
            x = jax.nn.relu(x)
    return x


def _interact(bottom_out: jnp.ndarray, emb: jnp.ndarray) -> jnp.ndarray:
    """Dot-product feature interaction (DLRM style).

    bottom_out: [B, D]; emb: [T, B, D]. Returns [B, T*(T+1)/2 + D]:
    upper-triangle pairwise dots among the T+1 feature vectors, concat
    with the dense projection.
    """
    feats = jnp.concatenate([bottom_out[None], emb], axis=0)  # [F, B, D]
    f = feats.shape[0]
    gram = jnp.einsum("fbd,gbd->bfg", feats, feats)  # [B, F, F]
    iu, ju = np.triu_indices(f, k=1)
    pairs = gram[:, iu, ju]
    return jnp.concatenate([bottom_out, pairs], axis=-1)


def dlrm_forward(
    params: DLRMParams,
    cfg: DLRMConfig,
    dense: jnp.ndarray,        # [B, dense_dim]
    indices: jnp.ndarray,      # [T, B, L] int32
    lookup_fn=None,
) -> jnp.ndarray:
    """Logits [B]. ``lookup_fn`` overrides the embedding lookup (e.g. the
    table-sharded all_to_all version); defaults to the local lookup."""
    if lookup_fn is None:
        emb = _fixed_pool_lookup(
            params.tt_cores, indices,
            cfg.tt_p_shapes, cfg.tt_q_shapes, cfg.tt_ranks,
        )
    else:
        emb = lookup_fn(params.tt_cores, indices)
    bottom_out = _mlp_apply(params.bottom_mlp, dense)
    z = _interact(bottom_out, emb)
    return _mlp_apply(params.top_mlp, z)[:, 0]


def bce_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * labels
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def make_dlrm_train_step(
    cfg: DLRMConfig,
    mesh: Optional[Mesh] = None,
    learning_rate: float = 0.01,
    table_axis: str = "mp",
    batch_axis: str = "dp",
):
    """One-dispatch jitted SGD train step.

    With a mesh: TT cores table-sharded over ``table_axis``, batch (dense
    features, indices, labels) sharded over the remaining axes, all_to_all
    embedding exchange inside, dense tower data-parallel; XLA inserts the
    gradient psums. Without a mesh: single-device.
    """
    lookup_fn = None
    if mesh is not None:
        lookup_fn = make_table_sharded_lookup(
            mesh, cfg.tt_p_shapes, cfg.tt_q_shapes, cfg.tt_ranks,
            table_axis=table_axis,
            batch_axis=batch_axis if batch_axis in mesh.axis_names else None,
        )

    def loss_fn(params, dense, indices, labels):
        logits = dlrm_forward(params, cfg, dense, indices, lookup_fn)
        return bce_loss(logits, labels)

    def step(params: DLRMParams, dense, indices, labels):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, dense, indices, labels
        )
        lr = jnp.float32(learning_rate)
        new_params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        return loss, new_params

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))

    batch_all = (
        (batch_axis, table_axis) if batch_axis in mesh.axis_names
        else (table_axis,)
    )
    core_sh = NamedSharding(mesh, P(table_axis, None, None))
    repl = NamedSharding(mesh, P())
    params_sh = DLRMParams(
        tt_cores=tuple(core_sh for _ in range(len(cfg.tt_p_shapes))),
        bottom_mlp=MLPParams(
            tuple(repl for _ in cfg.bottom_mlp_dims),
            tuple(repl for _ in cfg.bottom_mlp_dims),
        ),
        top_mlp=MLPParams(
            tuple(repl for _ in cfg.top_mlp_dims),
            tuple(repl for _ in cfg.top_mlp_dims),
        ),
    )
    in_shardings = (
        params_sh,
        NamedSharding(mesh, P(batch_all, None)),       # dense [B, dd]
        NamedSharding(mesh, P(table_axis, batch_axis if batch_axis in mesh.axis_names else None, None)),  # indices
        NamedSharding(mesh, P(batch_all)),             # labels [B]
    )
    out_shardings = (NamedSharding(mesh, P()), params_sh)
    return jax.jit(
        step,
        in_shardings=in_shardings,
        out_shardings=out_shardings,
        donate_argnums=(0,),
    )


def shard_dlrm_params(params: DLRMParams, cfg: DLRMConfig, mesh: Mesh,
                      table_axis: str = "mp") -> DLRMParams:
    core_sh = NamedSharding(mesh, P(table_axis, None, None))
    repl = NamedSharding(mesh, P())
    return DLRMParams(
        tt_cores=tuple(jax.device_put(c, core_sh) for c in params.tt_cores),
        bottom_mlp=jax.tree.map(
            lambda x: jax.device_put(x, repl), params.bottom_mlp
        ),
        top_mlp=jax.tree.map(
            lambda x: jax.device_put(x, repl), params.top_mlp
        ),
    )
