"""Sharded TT-embedding lookups: data-parallel and table-sharded all-to-all.

Net-new vs the single-GPU reference (SURVEY §2.6). Two production layouts:

  * **Data parallel** (:func:`make_dp_lookup`): bags sharded over the mesh,
    TT cores replicated (they're tiny — that's the whole point of TT
    compression). Backward's core grads are psum'd by XLA automatically.
  * **Table-sharded hybrid** (:func:`make_table_sharded_lookup`): the DLRM
    pattern. Each chip owns ``T / mp`` tables' cores and computes pooled
    embeddings for its tables over its dp-shard of the batch, then an
    ``all_to_all`` over the mp axis redistributes so every chip ends up
    with ALL tables for a ``1/(dp*mp)`` slice of the batch — ready to feed
    the data-parallel dense tower. Collectives ride ICI; gradients reverse
    the exchange automatically (all_to_all is its own transpose).

Fixed-pooling layout: indices are ``[T, B, L]`` (every bag has exactly L
lookups). Variable-length bags can be padded to L with an out-of-band
sentinel weight of 0 — static shapes are what XLA wants.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from fbtt_embedding_tpu.ops.contraction import tt_rows
from fbtt_embedding_tpu.ops.lookup import pool_rows


def _fixed_pool_lookup(
    cores: Tuple[jnp.ndarray, ...],
    indices: jnp.ndarray,  # [T, B, L] int32
    tt_p_shapes: Sequence[int],
    tt_q_shapes: Sequence[int],
    tt_ranks: Sequence[int],
    weights: Optional[jnp.ndarray] = None,  # [T, B, L]
    precision=None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Local pooled lookup for [T, B, L]-layout indices -> [T, B, D].

    Routes through :func:`~fbtt_embedding_tpu.ops.lookup.pooled_tt_lookup`,
    so each device's local lookup inside ``shard_map`` runs the fused
    Pallas kernels on TPU when supported.
    """
    from fbtt_embedding_tpu.ops.lookup import pooled_tt_lookup

    t, b, l = indices.shape
    nnz = t * b * l
    flat = indices.reshape(nnz)
    lookup_pos = jnp.arange(nnz, dtype=jnp.int32)
    rowidx = (lookup_pos // l) % b
    tableidx = lookup_pos // (b * l)
    return pooled_tt_lookup(
        cores, tt_p_shapes, tt_q_shapes, tt_ranks, b, flat, rowidx,
        tableidx if t > 1 else None,
        weights=(None if weights is None
                 else weights.reshape(nnz).astype(jnp.float32)),
        precision=precision, impl=impl,
    )


def make_dp_lookup(
    mesh: Mesh,
    tt_p_shapes: Sequence[int],
    tt_q_shapes: Sequence[int],
    tt_ranks: Sequence[int],
    batch_axes: Tuple[str, ...] = ("dp",),
    precision=None,
):
    """Data-parallel lookup: batch sharded, cores replicated.

    Returns a jitted ``fn(cores, indices[T,B,L]) -> [T,B,D]`` with the batch
    dimension sharded over ``batch_axes``.
    """
    shapes = (tuple(tt_p_shapes), tuple(tt_q_shapes), tuple(tt_ranks))

    @functools.partial(
        jax.jit,
        in_shardings=(
            NamedSharding(mesh, P()),  # replicated cores
            NamedSharding(mesh, P(None, batch_axes, None)),
        ),
        out_shardings=NamedSharding(mesh, P(None, batch_axes, None)),
    )
    def lookup(cores, indices):
        return _fixed_pool_lookup(cores, indices, *shapes,
                                  precision=precision)

    return lookup


def make_table_sharded_lookup(
    mesh: Mesh,
    tt_p_shapes: Sequence[int],
    tt_q_shapes: Sequence[int],
    tt_ranks: Sequence[int],
    table_axis: str = "mp",
    batch_axis: Optional[str] = "dp",
    precision=None,
):
    """Table-sharded lookup with all_to_all embedding exchange.

    Returns a function ``fn(cores, indices) -> embeddings`` where

      * ``cores[t]``: ``[T, p_t, r*q*r']`` sharded ``P(table_axis)`` on the
        table dim (each chip holds ``T / mp`` tables),
      * ``indices``: ``[T, B, L]`` sharded ``P(table_axis, batch_axis)``,
      * output: ``[T, B, D]`` with batch sharded over
        ``(batch_axis, table_axis)`` — all tables present on every chip for
        its batch slice, the layout the data-parallel dense tower consumes.

    The mp-axis all_to_all is the pooled-embedding exchange of a
    DLRM-style hybrid-parallel deployment (BASELINE.json north star).
    """
    shapes = (tuple(tt_p_shapes), tuple(tt_q_shapes), tuple(tt_ranks))
    mp = mesh.shape[table_axis]
    batch_out = (
        (batch_axis, table_axis) if batch_axis is not None else (table_axis,)
    )
    core_spec = P(table_axis, None, None)
    idx_spec = P(table_axis, batch_axis, None)
    out_spec = P(None, batch_out, None)

    def local_fn(cores, indices):
        pooled = _fixed_pool_lookup(cores, indices, *shapes,
                                    precision=precision)
        if mp == 1:
            return pooled
        # [T_loc, B_loc, D] -> exchange: every chip receives every table's
        # rows for 1/mp of its local batch -> [T_loc*mp, B_loc/mp, D].
        return jax.lax.all_to_all(
            pooled, table_axis, split_axis=1, concat_axis=0, tiled=True
        )

    sharded = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(tuple(core_spec for _ in tt_p_shapes), idx_spec),
        out_specs=out_spec,
        check_vma=False,
    )
    return sharded


def shard_params_for_table_parallel(
    mesh: Mesh,
    cores: Tuple[jnp.ndarray, ...],
    table_axis: str = "mp",
) -> Tuple[jnp.ndarray, ...]:
    """Place core arrays with the table dim sharded over ``table_axis``."""
    spec = NamedSharding(mesh, P(table_axis, None, None))
    return tuple(jax.device_put(c, spec) for c in cores)


def make_dp_cached_lookup(
    mesh: Mesh,
    tt_p_shapes: Sequence[int],
    tt_q_shapes: Sequence[int],
    tt_ranks: Sequence[int],
    batch_axes: Tuple[str, ...] = ("dp",),
    precision=None,
):
    """Data-parallel lookup with a replicated hot-row cache.

    Multi-chip extension of the LFU cache (SURVEY north star): cores AND
    cache tables are replicated (both are small — that is the point of TT
    compression and of caching only the hot head), the batch is sharded
    over ``batch_axes``, and each chip serves its own batch shard from its
    local cache copy with zero extra communication. With Zipf-skewed
    traffic the hot rows dominate every shard, so a replicated cache
    removes exactly the hotspotting that a row-OWNED cache would
    concentrate on one chip.

    LFU counting under this layout: run ``update_cache_state`` per-chip on
    the local batch shard inside ``shard_map`` and ``psum`` the count
    deltas (or simply count on the replicated stream — counts only steer
    eviction, exactness is not required). ``cache_populate`` runs
    replicated (deterministic, so every chip derives the same cache).

    Returns a jitted ``fn(cores, cache_state, indices[T,B,L]) -> [T,B,D]``.
    """
    from fbtt_embedding_tpu.ops import cache as cache_ops

    shapes = (tuple(tt_p_shapes), tuple(tt_q_shapes), tuple(tt_ranks))

    @functools.partial(
        jax.jit,
        in_shardings=(
            NamedSharding(mesh, P()),  # replicated cores
            NamedSharding(mesh, P()),  # replicated cache
            NamedSharding(mesh, P(None, batch_axes, None)),
        ),
        out_shardings=NamedSharding(mesh, P(None, batch_axes, None)),
    )
    def lookup(cores, cache_state, indices):
        t, b, l = indices.shape
        nnz = t * b * l
        flat = indices.reshape(nnz)
        lookup_pos = jnp.arange(nnz, dtype=jnp.int32)
        rowidx = (lookup_pos // l) % b
        tableidx = lookup_pos // (b * l)
        locations = cache_ops.cache_lookup(cache_state, flat)
        cached = locations >= 0
        rows = tt_rows(
            cores, *shapes, flat, tableidx if t > 1 else None,
            precision=precision,
        )
        cached_rows = cache_state.weight[jnp.clip(locations, 0)]
        rows = jnp.where(cached[:, None], cached_rows, rows)
        return pool_rows(rows, rowidx, tableidx if t > 1 else None, t, b)

    return lookup
