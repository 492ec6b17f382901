"""TT-compressed EmbeddingBag modules (TPU-native).

API-parity layer for the reference's ``TTEmbeddingBag`` /
``TableBatchedTTEmbeddingBag`` (``tt_embeddings_ops.py:421-934``): same
constructor surface, same semantics (sum pooling over CSR bags,
``include_last_offset=True``), fused sparse SGD/Adagrad updates, optional
LFU cache of decompressed hot rows.

Two ways to use it:

  * **Stateful module** (:class:`TableBatchedTTEmbeddingBag`): mirrors the
    reference's imperative flow — ``out = m(indices, offsets)`` then
    ``m.backward(d_out)`` applies the fused update in place (donated
    buffers). Convenient for parity tests and drop-in use.
  * **Functional core** (:func:`tt_embedding_forward` + the pytree
    :class:`TTEmbeddingParams`): jit/pjit/scan-friendly, for embedding the
    layer in larger JAX models (see ``models/dlrm.py``).
"""

from __future__ import annotations

import functools
import logging
from enum import Enum, unique
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from fbtt_embedding_tpu.ops import cache as cache_ops
from fbtt_embedding_tpu.ops.cache import CacheState
from fbtt_embedding_tpu.ops.contraction import (
    tt_matrix_to_full,
    tt_rows,
    validate_tt_shapes,
)
from fbtt_embedding_tpu.ops.fused_optim import (
    adagrad_step,
    native_optim_init,
    native_optim_step,
    sgd_step,
)
from fbtt_embedding_tpu.ops.indexing import rowidx_from_offsets
from fbtt_embedding_tpu.ops.lookup import (
    pool_rows,
    pooled_tt_lookup,
    tt_grads_from_row_cotangents,
)
from fbtt_embedding_tpu.utils.init import init_tt_cores
from fbtt_embedding_tpu.utils.shapes import suggested_tt_shapes

logger = logging.getLogger(__name__)


@unique
class OptimType(Enum):
    """Optimizer names (reference ``tt_embeddings_ops.py:18-33``).

    As in the reference, only two behaviors exist: SGD/EXACT_SGD run the
    fused SGD kernel, everything else runs the fused full-element Adagrad.
    Unlike the reference, *all* updates here are deterministic (segment
    reductions, no atomics), so SGD == EXACT_SGD by construction.
    """

    SGD = "sgd"
    EXACT_SGD = "exact_sgd"
    LAMB = "lamb"
    ADAM = "adam"
    EXACT_ADAGRAD = "exact_adagrad"
    EXACT_ROWWISE_ADAGRAD = "exact_row_wise_adagrad"
    LARS_SGD = "lars_sgd"
    PARTIAL_ROWWISE_ADAM = "partial_row_wise_adam"
    PARTIAL_ROWWISE_LAMB = "partial_row_wise_lamb"

    def __str__(self) -> str:
        return self.value


_SGD_OPTIMS = (OptimType.SGD, OptimType.EXACT_SGD)


@struct.dataclass
class TTEmbeddingParams:
    """Trainable/updatable state as one pytree (jit/checkpoint friendly)."""

    tt_cores: Tuple[jnp.ndarray, ...]
    optimizer_state: Tuple[jnp.ndarray, ...]
    cache: Optional[CacheState]


def tt_embedding_forward(
    params: TTEmbeddingParams,
    tt_p_shapes: Sequence[int],
    tt_q_shapes: Sequence[int],
    tt_ranks: Sequence[int],
    batch_size: int,
    indices: jnp.ndarray,
    rowidx: jnp.ndarray,
    tableidx: Optional[jnp.ndarray],
    cache_locations: Optional[jnp.ndarray] = None,
    weights: Optional[jnp.ndarray] = None,
    precision=None,
) -> jnp.ndarray:
    """Pooled forward with optional cache path; ``[T, B, D]``.

    Differentiable wrt ``params.tt_cores`` and ``params.cache.weight`` —
    cotangents route to the cache for cache-served lookups and to the TT
    cores otherwise (the ``where``-select's VJP does the partitioning that
    the reference implements with ``cub::DevicePartition``).
    """
    num_tables = params.tt_cores[0].shape[0]
    rows = tt_rows(
        params.tt_cores, tt_p_shapes, tt_q_shapes, tt_ranks,
        indices, tableidx, precision=precision,
    )
    if cache_locations is not None and params.cache is not None:
        cached = cache_locations >= 0
        cached_rows = params.cache.weight[jnp.clip(cache_locations, 0)]
        rows = jnp.where(cached[:, None], cached_rows, rows)
    if weights is not None:
        rows = rows * weights[:, None].astype(rows.dtype)
    return pool_rows(rows, rowidx, tableidx, num_tables, batch_size)


class TableBatchedTTEmbeddingBag:
    """Batched TT EmbeddingBag over ``num_tables`` same-shape tables.

    Constructor surface mirrors the reference
    (``tt_embeddings_ops.py:435-599``). All tables share
    ``num_embeddings x embedding_dim``; cores carry a leading table axis and
    a single lookup serves every table (the reference's "table batching").
    """

    def __init__(
        self,
        num_tables: int,
        num_embeddings: int,
        embedding_dim: int,
        tt_ranks: List[int],
        tt_p_shapes: Optional[List[int]] = None,
        tt_q_shapes: Optional[List[int]] = None,
        optimizer: OptimType = OptimType.SGD,
        learning_rate: float = 0.1,
        eps: float = 1.0e-10,
        sparse: bool = True,
        use_cache: bool = False,
        cache_size: int = 0,
        hashtbl_size: int = 0,
        weight_dist: str = "approx-normal",
        enforce_embedding_dim: bool = False,
        seed: int = 0,
        precision=None,
        impl: str = "auto",
        cache_count_interval: int = 1,
        optim_semantics: str = "reference",
        optim_hparams: Optional[dict] = None,
    ) -> None:
        assert num_tables > 0
        assert optim_semantics in ("reference", "native"), optim_semantics
        assert num_embeddings > 0
        assert embedding_dim > 0
        assert num_tables == 1 or not use_cache, (
            "cannot use cache when num_tables != 1"
        )
        self.tt_p_shapes: List[int] = (
            suggested_tt_shapes(num_embeddings, len(tt_ranks) + 1)
            if tt_p_shapes is None
            else list(tt_p_shapes)
        )
        self.tt_q_shapes: List[int] = (
            suggested_tt_shapes(
                embedding_dim,
                len(tt_ranks) + 1,
                allow_round_up=(not enforce_embedding_dim),
            )
            if tt_q_shapes is None
            else list(tt_q_shapes)
        )
        assert len(self.tt_p_shapes) == len(self.tt_q_shapes)
        assert len(tt_ranks) + 1 == len(self.tt_p_shapes)
        assert int(np.prod(self.tt_p_shapes)) >= num_embeddings
        assert int(np.prod(self.tt_q_shapes)) == embedding_dim
        self.tt_ranks: List[int] = validate_tt_shapes(
            self.tt_p_shapes, self.tt_q_shapes, list(tt_ranks)
        )
        self.tt_ndim = len(self.tt_p_shapes)
        self.num_tables = num_tables
        self.num_embeddings = num_embeddings
        self.embedding_dim = embedding_dim
        # int64 row-id regime (reference casts indices to long,
        # tt_embeddings_ops.py:823): row ids are decomposed on the host
        # in 64-bit and only int32 per-core indices reach the device.
        self._big_e = int(np.prod(self.tt_p_shapes)) > np.iinfo(np.int32).max
        if use_cache and self._big_e:
            # big-E tables use the wide-key (split int64) hash layout —
            # reference parity: its hashtbl is int64-keyed and serves any
            # E (tt_embeddings_ops.py:551-558). The dense-default sizing
            # (hashtbl_size = E, cache_size = 0.1 E) cannot apply at
            # E >= 2^31; both must be explicit.
            assert cache_size > 0 and hashtbl_size > 0, (
                "use_cache with num_embeddings >= 2**31 requires explicit "
                "cache_size and hashtbl_size (the 0.1*E / E defaults do "
                "not fit)"
            )
        self.optimizer = optimizer
        # "reference": the reference's two-behavior dispatch (SGD family
        # vs full-element Adagrad for everything else,
        # tt_embeddings_ops.py:248-266). "native": every OptimType gets
        # its true math on the cores (ops/fused_optim.py native section);
        # cache rows keep the reference update family either way.
        self.optim_semantics = optim_semantics
        self.optim_hparams = dict(optim_hparams) if optim_hparams else None
        self.learning_rate = float(learning_rate)
        self.eps = float(eps)
        self.sparse = sparse
        self.precision = precision
        self.impl = impl
        logger.info(
            "Creating TTEmbeddingBag tt_p_shapes: %s, tt_q_shapes: %s, "
            "tt_ranks: %s, sparse: %s, optimizer: %s, learning_rate: %s, "
            "eps: %s, use_cache: %s, cache_size: %s, hashtbl_size: %s",
            self.tt_p_shapes, self.tt_q_shapes, self.tt_ranks, sparse,
            optimizer, learning_rate, eps, use_cache, cache_size,
            hashtbl_size,
        )

        rng = np.random.default_rng(seed)
        cores_np = init_tt_cores(
            rng, weight_dist, num_tables, num_embeddings, embedding_dim,
            self.tt_p_shapes, self.tt_q_shapes, self.tt_ranks,
        )
        self.tt_cores: List[jnp.ndarray] = [jnp.asarray(c) for c in cores_np]
        if optim_semantics == "native":
            self.optimizer_state: List[jnp.ndarray] = list(
                native_optim_init(optimizer, self.tt_cores))
        elif optimizer in _SGD_OPTIMS:
            self.optimizer_state = [
                jnp.zeros((0,), jnp.float32) for _ in range(self.tt_ndim)
            ]
        else:
            self.optimizer_state = [jnp.zeros_like(c) for c in self.tt_cores]

        self.use_cache = use_cache
        self.cache: Optional[CacheState] = None
        if use_cache:
            if cache_size <= 0:
                cache_size = int(0.1 * num_embeddings)
            if hashtbl_size <= 0:
                hashtbl_size = num_embeddings
            assert hashtbl_size >= cache_size
            if sparse and optimizer not in _SGD_OPTIMS:
                kind = "full" if optimizer == OptimType.EXACT_ADAGRAD else "rowwise"
            else:
                kind = "none"
            self.cache = cache_ops.make_cache_state(
                hashtbl_size, cache_size, embedding_dim, kind,
                num_embeddings=None if self._big_e else num_embeddings,
                wide_keys=self.tt_ndim if self._big_e else 0,
            )
        self.warmup = True
        # Decompress-prefetch chunk for cache_populate (None = library
        # default). The reference hardcodes 200 (tt_embeddings_cuda.cu:1326);
        # SURVEY §5 asks for the chunk sizes to be tunable.
        self.populate_chunk: Optional[int] = None
        self._saved_ctx: Optional[dict] = None
        # Sampled LFU counting (opt-in; 1 = reference parity, count every
        # forward): count every k-th forward with k-scaled increments —
        # unbiased expected counts at 1/k of the freq-scatter cost (see
        # ops.cache.update_cache_state).
        self.cache_count_interval = max(1, int(cache_count_interval))
        self._count_calls = 0

    # ---------------------------------------------------------------- state

    @property
    def params(self) -> TTEmbeddingParams:
        return TTEmbeddingParams(
            tt_cores=tuple(self.tt_cores),
            optimizer_state=tuple(self.optimizer_state),
            cache=self.cache,
        )

    def load_params(self, params: TTEmbeddingParams) -> None:
        self.tt_cores = list(params.tt_cores)
        self.optimizer_state = list(params.optimizer_state)
        self.cache = params.cache

    def import_full_weight(self, weight, table: int = 0) -> None:
        """Load a trained dense ``[E, D]`` embedding table into this
        module's TT cores for ``table`` via TT-SVD
        (:func:`fbtt_embedding_tpu.utils.decompose.tt_decompose`) — the
        migration entry the reference lacks (it can only train TT cores
        from scratch). Approximation error is set by the configured
        ``tt_ranks``. Resets that table's optimizer-state slice; if the
        cache is past warmup its decompressed rows are refreshed from the
        new cores."""
        from fbtt_embedding_tpu.utils.decompose import tt_decompose

        cores = tt_decompose(
            weight, self.tt_p_shapes, self.tt_q_shapes, self.tt_ranks)
        assert 0 <= table < self.num_tables, (table, self.num_tables)
        self.tt_cores = [
            c.at[table].set(jnp.asarray(new))
            for c, new in zip(self.tt_cores, cores)
        ]
        # ndim guard: native ADAM/LAMB/PARTIAL_ROWWISE state ends with a
        # 0-d step counter (fused_optim.native_optim_init) that must pass
        # through untouched — indexing it with [table] would raise.
        self.optimizer_state = [
            s if (s.ndim == 0 or s.size == 0) else s.at[table].set(0.0)
            for s in self.optimizer_state
        ]
        if self.cache is not None and not self.warmup:
            self.cache_populate()

    def freeze_for_serving(self, batch_size: int, probe_cache: bool = True,
                           quantize: Optional[str] = None):
        """One-time weight fold for inference: ``(folded, serve)`` with
        ``serve(folded, indices, offsets, weights=None) -> [T, B, D]``.
        See :func:`make_folded_serving_fn` — the pass tables and (tt_ndim
        >= 3) the G0xG1 pair-product table are precomputed here, so every
        serve call skips the first kernel pass and the forward permute.
        ``quantize="int8"`` stores the pair table and cache rows as
        per-row-scaled int8 (2–4× serving capacity, ~0.4% row error).

        The fold snapshots the CURRENT cores and cache: training further
        or calling ``cache_populate`` afterwards does not update the
        frozen state — re-freeze, or (cache-only changes) swap the new
        cache in with :func:`refold_cache`."""
        fold, serve = make_folded_serving_fn(
            self.tt_p_shapes, self.tt_q_shapes, self.tt_ranks,
            self.num_tables, batch_size,
            probe_cache=probe_cache and self.use_cache,
            precision=self.precision, impl=self.impl, quantize=quantize)
        return fold(self.params), serve

    def state_dict(self) -> dict:
        """Flat name->array dict (reference ``state_dict`` parity: cores,
        optimizer state, cache tables all round-trip)."""
        out = {}
        for i, c in enumerate(self.tt_cores):
            out[f"tt_cores.{i}"] = c
        for i, s in enumerate(self.optimizer_state):
            out[f"optimizer_state.{i}"] = s
        if self.cache is not None:
            out["cache.keys"] = self.cache.keys
            out["cache.freq"] = self.cache.freq
            out["cache.slots"] = self.cache.slots
            out["cache.weight"] = self.cache.weight
            out["cache.opt_state"] = self.cache.opt_state
        return out

    def load_state_dict(self, state: dict) -> None:
        self.tt_cores = [
            jnp.asarray(state[f"tt_cores.{i}"]) for i in range(self.tt_ndim)
        ]
        # Length varies by optimizer (native ADAM/LAMB carry 2*ndim+1
        # entries) — read whatever the dict holds, but a valid state dict
        # always has at least one entry per core (SGD saves empty
        # arrays); fewer means a truncated/renamed checkpoint and must
        # fail HERE, not as a confusing zip-truncation later in backward.
        opt_state = []
        while f"optimizer_state.{len(opt_state)}" in state:
            opt_state.append(
                jnp.asarray(state[f"optimizer_state.{len(opt_state)}"]))
        if len(opt_state) < self.tt_ndim:
            raise KeyError(
                f"state dict has {len(opt_state)} optimizer_state.* "
                f"entries; expected at least {self.tt_ndim} (one per TT "
                f"core — empty arrays for the SGD family)")
        self.optimizer_state = opt_state
        if self.cache is not None:
            self.cache = CacheState(
                keys=jnp.asarray(state["cache.keys"]),
                freq=jnp.asarray(state["cache.freq"]),
                slots=jnp.asarray(state["cache.slots"]),
                weight=jnp.asarray(state["cache.weight"]),
                opt_state=jnp.asarray(state["cache.opt_state"]),
            )

    # ----------------------------------------------------------------- api

    def full_weight(self) -> jnp.ndarray:
        """Materialized ``[E', D]`` table (``E' = prod(p) >= E``)."""
        assert self.num_tables == 1, (
            "full_weight() only supported for num_tables == 1"
        )
        assert not self._big_e, (
            "full_weight() would materialize >= 2**31 rows"
        )
        return tt_matrix_to_full(
            self.tt_p_shapes, self.tt_q_shapes, self.tt_ranks, self.tt_cores
        )

    def set_learning_rate(self, lr: float) -> None:
        self.learning_rate = float(lr)

    def get_params(self) -> List[jnp.ndarray]:
        """Trainable arrays (no self-mutation, unlike the reference's
        ``get_params`` which appends into its own ParameterList,
        ``tt_embeddings_ops.py:882-886``)."""
        params = list(self.tt_cores)
        if self.use_cache and self.cache is not None:
            params.append(self.cache.weight)
        return params

    # --------------------------------------------------------------- cache

    def reset_cache(self) -> None:
        if self.use_cache and self.cache is not None:
            self.cache = cache_ops.reset_cache(self.cache)

    def update_cache(self, indices: jnp.ndarray) -> None:
        if self.use_cache and self.cache is not None:
            if self._big_e:
                indices = cache_ops.wide_cache_keys(
                    np.asarray(indices), self.tt_p_shapes)
            self.cache = self._jit_update_cache(self.cache, indices)

    def cache_populate(self) -> None:
        if self.use_cache and self.cache is not None:
            self.cache = self._jit_cache_populate(
                self.cache, tuple(self.tt_cores)
            )
            self.warmup = False

    def cache_hit_rate(self) -> float:
        """Fraction of the last forward's lookups served by the cache.

        The reference computes cache hits but never reports them
        (SURVEY §5); this surfaces them for free from the saved forward
        context.
        """
        ctx = self._saved_ctx
        if not ctx or ctx.get("locations") is None:
            return 0.0
        return float(jnp.mean((ctx["locations"] >= 0).astype(jnp.float32)))

    @functools.cached_property
    def _jit_update_cache(self):
        return jax.jit(cache_ops.update_cache_state)

    @functools.cached_property
    def _jit_cache_populate(self):
        shapes = (tuple(self.tt_p_shapes), tuple(self.tt_q_shapes),
                  tuple(self.tt_ranks))

        def populate(cache, cores):
            return cache_ops.cache_populate(
                cache, cores, *shapes, precision=self.precision,
                populate_chunk=self.populate_chunk,
            )

        return jax.jit(populate)

    # ------------------------------------------------------------- forward

    def forward(
        self,
        indices: jnp.ndarray,
        offsets: jnp.ndarray,
        weights: Optional[jnp.ndarray] = None,
        warmup: Optional[bool] = None,
    ) -> jnp.ndarray:
        """Pooled lookup ``[num_tables, B, D]``.

        ``warmup``: reference-parity argument
        (``tt_embeddings_ops.py:821-822``; the reference accepts it but
        ignores it in favor of ``self.warmup``). Here the *intent* is
        honored: pass ``warmup=False``/``True`` to override ``self.warmup``
        (whether cache probing is enabled) for this call; ``None`` (the
        default) defers to ``self.warmup``.
        """
        idx_parts = None
        cache_keys = None
        if self._big_e:
            if self.use_cache:
                # one host pass builds both the wide cache key rows and
                # the per-core parts (columns 2..)
                cache_keys = cache_ops.wide_cache_keys(
                    np.asarray(indices).reshape(-1), self.tt_p_shapes)
                idx_parts = tuple(
                    cache_keys[:, 2 + t] for t in range(self.tt_ndim))
            else:
                from fbtt_embedding_tpu.ops.indexing import (
                    decompose_indices64,
                )

                idx_parts = tuple(
                    jnp.asarray(part) for part in decompose_indices64(
                        np.asarray(indices).reshape(-1), self.tt_p_shapes)
                )
            indices = None
        else:
            indices = jnp.asarray(indices).astype(jnp.int32).reshape(-1)
        offsets = jnp.asarray(offsets).astype(jnp.int32).reshape(-1)
        assert (offsets.shape[0] - 1) % self.num_tables == 0
        batch_size = (offsets.shape[0] - 1) // self.num_tables

        # One fused program per step: LFU counting + cache probe + rowidx
        # expansion + contraction + pooling. The reference needs five kernel
        # launches and a blocking D2H sync here
        # (tt_embeddings_cuda.cu:1077-1496); we need one async dispatch.
        warm = self.warmup if warmup is None else warmup
        use_cache_now = (
            self.use_cache and not warm and self.num_tables == 1
        )
        count_now = self.use_cache and (
            self._count_calls % self.cache_count_interval == 0
        )
        if self.use_cache:
            self._count_calls += 1
        fwd = self._jit_forward_variant(count_now, use_cache_now)
        output, rowidx, tableidx, locations, cache = fwd(
            tuple(self.tt_cores), self.cache,
            idx_parts if self._big_e else indices, offsets, weights,
            cache_keys, batch_size=batch_size,
        )
        self.cache = cache
        self._saved_ctx = dict(
            indices=indices, idx_parts=idx_parts, rowidx=rowidx,
            tableidx=tableidx, locations=locations, weights=weights,
            batch_size=batch_size,
        )
        return output

    __call__ = forward

    def _jit_forward_variant(self, count_cache: bool, probe_cache: bool):
        # Per-INSTANCE memo (4 variants max). A functools.lru_cache over
        # a method keys on `self`, pinning every module instance (and its
        # jitted closures) in a process-global cache forever — a leak for
        # serving frontends / sweeps that construct many modules.
        cache = self.__dict__.setdefault("_fwd_variants", {})
        key = (count_cache, probe_cache)
        if key not in cache:
            cache[key] = self._build_forward_variant(count_cache,
                                                     probe_cache)
        return cache[key]

    def _build_forward_variant(self, count_cache: bool, probe_cache: bool):
        shapes = (tuple(self.tt_p_shapes), tuple(self.tt_q_shapes),
                  tuple(self.tt_ranks))
        precision = self.precision
        num_tables = self.num_tables

        impl = self.impl
        count_scale = self.cache_count_interval

        big_e = self._big_e

        @functools.partial(jax.jit, static_argnames=("batch_size",))
        def fwd(cores, cache, indices, offsets, weights, cache_keys,
                *, batch_size):
            # big-E mode: `indices` is the tuple of host-decomposed
            # int32 per-core indices; `cache_keys` carries the wide
            # (hi, lo, parts) key rows for the int64-keyed cache
            parts = indices if big_e else None
            nnz = (parts[0] if big_e else indices).shape[0]
            rowidx, tableidx = rowidx_from_offsets(
                offsets, nnz, num_tables, batch_size
            )
            tbl = tableidx if num_tables > 1 else None
            key_input = cache_keys if big_e else indices
            if count_cache and cache is not None:
                cache = cache_ops.update_cache_state(
                    cache, key_input, scale=count_scale)
            locations = (
                cache_ops.cache_lookup(cache, key_input)
                if probe_cache else None
            )
            # Cache-served lookups must be excluded from the TT path and
            # save compute (reference cub partition + D2H sync,
            # tt_embeddings_cuda.cu:1436-1488, with static shapes here):
            # flat pipeline takes the mask directly (its sorts cluster
            # dead lookups into skipped spans); the generic kernels get a
            # live-first repacking; XLA masks weights only.
            from fbtt_embedding_tpu.ops.lookup import (
                pallas_forward_available,
                pallas_sorted_available,
            )
            use_flat = (
                impl in ("auto", "pallas_sorted")
                and pallas_sorted_available(*shapes, num_tables, batch_size)
            )
            use_partition = (
                not use_flat
                and not big_e  # generic kernels take flat row ids only
                and impl in ("auto", "pallas")
                and locations is not None
                and pallas_forward_available(*shapes, num_tables, batch_size)
            )
            dead = None
            if locations is not None and use_flat:
                cached_f = (locations >= 0).astype(jnp.float32)
                dead = locations >= 0
                indices_p, rowidx_p, tbl_p, w_p, live = (
                    indices, rowidx, tbl, weights, None)
            elif locations is not None and use_partition:
                cached_f = (locations >= 0).astype(jnp.float32)
                alive = locations < 0
                live_count = jnp.sum(alive.astype(jnp.int32))
                tt_pos = jnp.cumsum(alive.astype(jnp.int32)) - 1
                c_pos = (live_count
                         + jnp.cumsum((~alive).astype(jnp.int32)) - 1)
                pos = jnp.where(alive, tt_pos, c_pos)
                indices_p = jnp.zeros_like(indices).at[pos].set(indices)
                rowidx_p = jnp.zeros_like(rowidx).at[pos].set(rowidx)
                tbl_p = (jnp.zeros_like(tbl).at[pos].set(tbl)
                         if tbl is not None else None)
                w = alive.astype(jnp.float32)
                if weights is not None:
                    w = w * weights
                w_p = jnp.zeros((nnz,), jnp.float32).at[pos].set(w)
                live = live_count[None]
            elif locations is not None:
                cached_f = (locations >= 0).astype(jnp.float32)
                w_p = 1.0 - cached_f
                if weights is not None:
                    w_p = w_p * weights
                indices_p, rowidx_p, tbl_p, live = (
                    indices, rowidx, tbl, None)
            else:
                indices_p, rowidx_p, tbl_p, w_p, live = (
                    indices, rowidx, tbl, weights, None)
            out = pooled_tt_lookup(
                cores, *shapes, batch_size,
                None if big_e else indices_p, rowidx_p, tbl_p,
                weights=w_p, precision=precision, impl=impl,
                live_count=live, dead_mask=dead, idx_parts=parts,
            )
            if locations is not None:
                cached_rows = (
                    cache.weight[jnp.clip(locations, 0)] * cached_f[:, None]
                )
                if weights is not None:
                    cached_rows = cached_rows * weights[:, None]
                out = out + pool_rows(
                    cached_rows, rowidx, tbl, num_tables, batch_size
                )
            return out, rowidx, tbl, locations, cache

        return fwd

    # ------------------------------------------------------------ backward

    def backward(self, d_output: jnp.ndarray):
        """Apply the fused update (sparse) or return dense grads.

        Sparse mode: updates ``tt_cores`` (and cache weight/optimizer
        state) in place and returns None — the functional analog of the
        reference's backward that mutates weights and returns all-None
        grads (``tt_embeddings_ops.py:209-303``).

        Dense mode: returns ``(d_tt_cores, d_cache_weight)`` for an
        external optimizer (``tt_embeddings_ops.py:304-356``).
        """
        assert self._saved_ctx is not None, "forward() must run first"
        ctx = dict(self._saved_ctx)
        if self._big_e:
            ctx["indices"] = ctx["idx_parts"]
        d_output = jnp.asarray(d_output, jnp.float32)
        if d_output.ndim == 2:
            d_output = d_output[None]

        if self.sparse:
            if self.optim_semantics == "native":
                cores, opt_state, cache = self._jit_bwd_native(
                    tuple(self.tt_cores), tuple(self.optimizer_state),
                    self.cache, d_output,
                    ctx["indices"], ctx["rowidx"], ctx["tableidx"],
                    ctx["locations"], ctx["weights"],
                    jnp.float32(self.learning_rate), jnp.float32(self.eps),
                )
                self.tt_cores = list(cores)
                self.optimizer_state = list(opt_state)
                self.cache = cache
            elif self.optimizer in _SGD_OPTIMS:
                cores, cache = self._jit_bwd_sgd(
                    tuple(self.tt_cores), self.cache, d_output,
                    ctx["indices"], ctx["rowidx"], ctx["tableidx"],
                    ctx["locations"], ctx["weights"],
                    jnp.float32(self.learning_rate),
                )
                self.tt_cores = list(cores)
                self.cache = cache
            else:
                cores, opt_state, cache = self._jit_bwd_adagrad(
                    tuple(self.tt_cores), tuple(self.optimizer_state),
                    self.cache, d_output,
                    ctx["indices"], ctx["rowidx"], ctx["tableidx"],
                    ctx["locations"], ctx["weights"],
                    jnp.float32(self.learning_rate), jnp.float32(self.eps),
                )
                self.tt_cores = list(cores)
                self.optimizer_state = list(opt_state)
                self.cache = cache
            return None
        d_cores, d_cache_weight = self._jit_bwd_dense(
            tuple(self.tt_cores),
            None if self.cache is None else self.cache.weight,
            d_output, ctx["indices"], ctx["rowidx"], ctx["tableidx"],
            ctx["locations"], ctx["weights"],
        )
        return list(d_cores), d_cache_weight

    def _row_cotangents(self, d_output, rowidx, tableidx, locations, weights):
        """Split pooled cotangent into per-lookup TT / cache cotangents."""
        if tableidx is None:
            d_rows = d_output[0][rowidx]
        else:
            t, b, d = d_output.shape
            d_rows = d_output.reshape(t * b, d)[
                tableidx * b + rowidx
            ]
        if weights is not None:
            d_rows = d_rows * weights[:, None].astype(d_rows.dtype)
        if locations is None:
            return d_rows, None
        cached = locations >= 0
        return jnp.where(cached[:, None], 0.0, d_rows), d_rows

    @functools.cached_property
    def _jit_bwd_sgd(self):
        shapes = (tuple(self.tt_p_shapes), tuple(self.tt_q_shapes),
                  tuple(self.tt_ranks))
        precision = self.precision

        big_e = self._big_e

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def bwd(cores, cache, d_output, indices, rowidx, tableidx,
                locations, weights, lr):
            d_tt_rows, d_all_rows = self._row_cotangents(
                d_output, rowidx, tableidx, locations, weights
            )
            grads = tt_grads_from_row_cotangents(
                cores, *shapes, None if big_e else indices, tableidx,
                d_tt_rows, precision=precision,
                idx_parts=indices if big_e else None,
            )
            new_cores = sgd_step(cores, grads, lr)
            if locations is not None and cache is not None:
                cache = cache_ops.cache_backward_sgd(
                    cache, d_output, locations, rowidx, lr, weights=weights
                )
            return new_cores, cache

        return bwd

    @functools.cached_property
    def _jit_bwd_adagrad(self):
        shapes = (tuple(self.tt_p_shapes), tuple(self.tt_q_shapes),
                  tuple(self.tt_ranks))
        precision = self.precision
        # EXACT_ADAGRAD carries full [cache_size, D] cache optimizer state
        # and gets the exact full-element cache update; every other non-SGD
        # OptimType routes to the row-wise approx kernel (reference
        # dispatch, tt_embeddings_ops.py:248-269 — minus the reference's
        # state-shape mismatch for EXACT_ADAGRAD).
        exact_cache = self.optimizer == OptimType.EXACT_ADAGRAD

        big_e = self._big_e

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def bwd(cores, opt_state, cache, d_output, indices, rowidx,
                tableidx, locations, weights, lr, eps):
            d_tt_rows, _ = self._row_cotangents(
                d_output, rowidx, tableidx, locations, weights
            )
            grads = tt_grads_from_row_cotangents(
                cores, *shapes, None if big_e else indices, tableidx,
                d_tt_rows, precision=precision,
                idx_parts=indices if big_e else None,
            )
            new_cores, new_state = adagrad_step(
                cores, opt_state, grads, lr, eps
            )
            if locations is not None and cache is not None:
                if exact_cache:
                    cache = cache_ops.cache_backward_adagrad(
                        cache, d_output, locations, rowidx, lr, eps,
                        weights=weights,
                    )
                else:
                    cache = cache_ops.cache_backward_rowwise_adagrad_approx(
                        cache, d_output, locations, rowidx, lr, eps,
                        weights=weights,
                    )
            return new_cores, new_state, cache

        return bwd

    @functools.cached_property
    def _jit_bwd_native(self):
        """Native-semantics fused backward: true per-OptimType math on the
        cores (``ops/fused_optim.py`` native section); cache rows keep the
        reference update family (SGD / full or row-wise Adagrad)."""
        shapes = (tuple(self.tt_p_shapes), tuple(self.tt_q_shapes),
                  tuple(self.tt_ranks))
        precision = self.precision
        optimizer = self.optimizer
        hparams = self.optim_hparams
        is_sgd = optimizer in _SGD_OPTIMS
        exact_cache = optimizer == OptimType.EXACT_ADAGRAD

        big_e = self._big_e

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def bwd(cores, opt_state, cache, d_output, indices, rowidx,
                tableidx, locations, weights, lr, eps):
            d_tt_rows, _ = self._row_cotangents(
                d_output, rowidx, tableidx, locations, weights
            )
            grads = tt_grads_from_row_cotangents(
                cores, *shapes, None if big_e else indices, tableidx,
                d_tt_rows, precision=precision,
                idx_parts=indices if big_e else None,
            )
            new_cores, new_state = native_optim_step(
                optimizer, cores, opt_state, grads, lr, eps,
                hparams=hparams,
            )
            if locations is not None and cache is not None:
                if is_sgd:
                    cache = cache_ops.cache_backward_sgd(
                        cache, d_output, locations, rowidx, lr,
                        weights=weights,
                    )
                elif exact_cache:
                    cache = cache_ops.cache_backward_adagrad(
                        cache, d_output, locations, rowidx, lr, eps,
                        weights=weights,
                    )
                else:
                    cache = cache_ops.cache_backward_rowwise_adagrad_approx(
                        cache, d_output, locations, rowidx, lr, eps,
                        weights=weights,
                    )
            return new_cores, new_state, cache

        return bwd

    @functools.cached_property
    def _jit_bwd_dense(self):
        shapes = (tuple(self.tt_p_shapes), tuple(self.tt_q_shapes),
                  tuple(self.tt_ranks))
        precision = self.precision

        big_e = self._big_e

        @jax.jit
        def bwd(cores, cache_weight, d_output, indices, rowidx, tableidx,
                locations, weights):
            d_tt_rows, _ = self._row_cotangents(
                d_output, rowidx, tableidx, locations, weights
            )
            grads = tt_grads_from_row_cotangents(
                cores, *shapes, None if big_e else indices, tableidx,
                d_tt_rows, precision=precision,
                idx_parts=indices if big_e else None,
            )
            d_cache_weight = None
            if locations is not None and cache_weight is not None:
                cached = locations >= 0
                d_rows_all, _ = self._row_cotangents(
                    d_output, rowidx, tableidx, None, weights
                )
                d_rows_cache = jnp.where(cached[:, None], d_rows_all, 0.0)
                c = cache_weight.shape[0]
                loc = jnp.where(cached, locations, c)
                d_cache_weight = (
                    jnp.zeros_like(cache_weight)
                    .at[loc].add(d_rows_cache, mode="drop")
                )
            return tuple(grads), d_cache_weight

        return bwd


def _pool_cached_rows(cached_rows, rowidx, tableidx, num_tables, bs):
    """Pool per-lookup cached rows into ``[T, B, D]``: one-hot MXU GEMM
    below the measured ~4k-output-row crossover (segment_sum costs ~20x
    more there), ``segment_sum`` above it (the one-hot is O(T*B*nnz*D)
    FLOPs and loses at large batch — same gate as the flat pipeline's
    pooling, ``ops/pallas/tt_flat.py``)."""
    from fbtt_embedding_tpu.ops.pallas.tt_flat import _POOL_ONEHOT_MAX_TB

    tb = num_tables * bs
    if tb <= _POOL_ONEHOT_MAX_TB:
        seg = rowidx if tableidx is None else tableidx * bs + rowidx
        oh = (seg[None, :]
              == jnp.arange(tb, dtype=seg.dtype)[:, None]
              ).astype(cached_rows.dtype)
        return jax.lax.dot_general(
            oh, cached_rows, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(num_tables, bs, -1)
    return pool_rows(cached_rows, rowidx, tableidx, num_tables, bs)


def make_fused_train_step(
    tt_p_shapes: Sequence[int],
    tt_q_shapes: Sequence[int],
    tt_ranks: Sequence[int],
    num_tables: int,
    batch_size: int,
    optimizer: OptimType = OptimType.SGD,
    use_cache: bool = False,
    probe_cache: bool = False,
    precision=None,
    impl: str = "auto",
    count_interval: int = 1,
    optim_semantics: str = "reference",
    optim_hparams: Optional[dict] = None,
):
    """Build a one-dispatch jitted training step (the production hot path).

    Returns ``step(params, indices, offsets, d_output, lr_eps,
    weights=None, *, bs=batch_size, count=True)`` → ``(output,
    new_params)`` — LFU
    counting, cache probe, rowidx expansion, TT contraction, pooling,
    backward, and the fused optimizer update all in ONE compiled XLA
    program with donated parameter buffers. This is the single-program
    equivalent of the reference's ~10 kernel launches + one blocking D2H
    sync per step (SURVEY §3.2/3.3).

    ``lr_eps``: a ``(learning_rate, eps)`` pair of traced scalars (one
    argument so sweeps don't retrace). ``weights``: optional ``[nnz]``
    per-sample weights (reference ``forward(..., weights)``,
    ``tt_embeddings_ops.py:821``) applied to both the pooled forward and
    the cotangents of the fused backward. ``bs`` is static (keyword-only).

    Big-E tables (``prod(p) >= 2**31``): without a cache, pass
    ``indices`` as the TUPLE of host-decomposed int32 per-core index
    parts (``ops.indexing.decompose_indices64``) instead of a flat id
    array. WITH a cache (which must be the wide-key layout,
    ``make_cache_state(..., wide_keys=tt_ndim)``), pass the wide
    key-row array from :func:`ops.cache.wide_cache_keys` (int32
    ``[nnz, 2 + ndim]``) — its ``(hi, lo)`` columns key the int64
    cache (LFU counting, probe, populate-compatible inserts) and its
    part columns feed the TT kernels, so one-dispatch cached training
    works at any ``E`` (the reference's int64-keyed hashtbl serves any
    E on its only path, ``hashtbl_cuda_utils.cuh:100-133``).

    Sampled LFU counting (opt-in): with ``count_interval=k > 1``, call
    the step with ``count=(step_idx % k == 0)`` — counting steps scale
    every increment by ``k`` (unbiased expected counts) and the other
    ``k-1`` steps skip the freq scatter entirely (a SECOND cached jit
    specialization, not a traced branch — ``lax.cond`` on the HBM-scale
    freq table inserts copies that eat the saving). The default
    (``count_interval=1``) counts every step like the reference.

    ``optim_semantics="native"`` (opt-in): every ``OptimType`` gets its
    true math on the cores — the reference routes LAMB/ADAM/LARS/rowwise
    to its Adagrad kernel (``tt_embeddings_ops.py:248-266``). Build the
    matching ``params.optimizer_state`` with
    :func:`fbtt_embedding_tpu.ops.fused_optim.native_optim_init`; cache
    rows keep the reference update family. ``optim_hparams`` overrides
    ``NATIVE_HPARAM_DEFAULTS`` (beta1/beta2/momentum/eta).
    """
    shapes = (tuple(tt_p_shapes), tuple(tt_q_shapes), tuple(tt_ranks))
    assert optim_semantics in ("reference", "native"), optim_semantics
    native = optim_semantics == "native"
    is_sgd = optimizer in _SGD_OPTIMS
    exact_cache = optimizer == OptimType.EXACT_ADAGRAD

    @functools.partial(jax.jit, donate_argnums=(0,),
                       static_argnames=("bs", "count"))
    def step(params: TTEmbeddingParams, indices, offsets, d_output, lr_eps,
             weights=None, *, bs: int = batch_size, count: bool = True):
        lr, eps = lr_eps
        parts = None
        key_input = indices
        if isinstance(indices, (tuple, list)):
            if use_cache or probe_cache:
                raise ValueError(
                    "big-E cached training takes the wide key-row array "
                    "(ops.cache.wide_cache_keys: int32 [nnz, 2 + ndim]) "
                    "as `indices`, not a bare idx_parts tuple — the "
                    "(hi, lo) columns key the int64 cache and the part "
                    "columns feed the TT kernels"
                )
            parts = tuple(indices)
            indices = None
            key_input = None
            nnz = parts[0].shape[0]
        elif indices.ndim == 2:
            # Big-E cached mode (round-4 verdict item #3): `indices` is
            # the wide key-row array from ops.cache.wide_cache_keys —
            # columns (hi, lo) key the wide int64-keyed cache (the
            # reference serves any E through its int64 hashtbl,
            # hashtbl_cuda_utils.cuh:100-133) and columns 2.. are the
            # host-decomposed per-core parts the TT kernels consume.
            parts, key_input, nnz = cache_ops.split_wide_keyrows(
                indices, len(tt_p_shapes))
            indices = None
        else:
            nnz = indices.shape[0]
        rowidx, tableidx = rowidx_from_offsets(offsets, nnz, num_tables, bs)
        tbl = tableidx if num_tables > 1 else None
        cache = params.cache
        if use_cache and cache is not None and count:
            cache = cache_ops.update_cache_state(
                cache, key_input, scale=count_interval)
        locations = (
            cache_ops.cache_lookup(cache, key_input)
            if (probe_cache and cache is not None) else None
        )

        # Cache-served lookups must be excluded from the TT path AND save
        # real compute (the reference's cub partition + blocking D2H sync,
        # tt_embeddings_cuda.cu:1436-1488, done with static shapes here):
        #   * flat sorted pipeline: pass the mask directly — its sort
        #     clusters dead lookups into sentinel spans the kernels skip,
        #     no repacking needed.
        #   * generic Pallas kernels: pack live lookups first (several
        #     [nnz] scatters) so whole blocks can be skipped via
        #     live_count.
        #   * XLA path: weight-mask only (no skipping to be had).
        from fbtt_embedding_tpu.ops.lookup import (
            pallas_forward_available,
            pallas_sorted_available,
        )
        use_flat = (
            impl in ("auto", "pallas_sorted")
            and pallas_sorted_available(*shapes, num_tables, bs)
        )
        use_partition = (
            not use_flat
            and parts is None  # repacking needs flat row ids
            and impl in ("auto", "pallas")
            and pallas_forward_available(*shapes, num_tables, bs)
        )
        dead = None
        if locations is not None and use_flat:
            dead = locations >= 0
            w_p = weights
            indices_p, rowidx_p, tbl_p, live = indices, rowidx, tbl, None
        elif locations is not None and use_partition:
            cached = locations >= 0
            alive = ~cached
            live_count = jnp.sum(alive.astype(jnp.int32))
            tt_pos = jnp.cumsum(alive.astype(jnp.int32)) - 1
            c_pos = live_count + jnp.cumsum(cached.astype(jnp.int32)) - 1
            pos = jnp.where(alive, tt_pos, c_pos)
            indices_p = jnp.zeros_like(indices).at[pos].set(indices)
            rowidx_p = jnp.zeros_like(rowidx).at[pos].set(rowidx)
            tbl_p = (jnp.zeros_like(tbl).at[pos].set(tbl)
                     if tbl is not None else None)
            w = alive.astype(jnp.float32)
            if weights is not None:
                w = w * weights
            w_p = jnp.zeros((nnz,), jnp.float32).at[pos].set(w)
            live = live_count[None]
        elif locations is not None:
            w_p = 1.0 - (locations >= 0).astype(jnp.float32)
            if weights is not None:
                w_p = w_p * weights
            indices_p, rowidx_p, tbl_p, live = indices, rowidx, tbl, None
        else:
            indices_p, rowidx_p, tbl_p, w_p, live = (
                indices, rowidx, tbl, weights, None)

        def cached_pool(out):
            if locations is None:
                return out
            cached_f = (locations >= 0).astype(jnp.float32)
            if weights is not None:
                cached_f = cached_f * weights
            cached_rows = (
                cache.weight[jnp.clip(locations, 0)] * cached_f[:, None]
            )
            return out + _pool_cached_rows(
                cached_rows, rowidx, tbl, num_tables, bs)

        # d_output is an INPUT of the fused step (the reference backward
        # API), so forward and backward need no autodiff boundary: the
        # flat train-apply shares the plan, Z1, and one fused last-core
        # kernel between them. With the per-span kernels this measured
        # SLOWER (0.115 vs 0.092 us/lookup — the 3-output kernel's larger
        # loop carries hurt more than the saved pass); span blocking
        # amortizes the carry cost and flipped the balance at SMALL
        # batches (0.744 vs 0.822 ms at the headline B=512), while at
        # large nnz the wide sort-order permutes dominate either way and
        # the 3-output kernel's extra VMEM pressure loses (~10.8 vs
        # 9.7 ms at B=8192). Auto: fused below the measured crossover.
        # FBTT_FUSED_APPLY={0,1} forces either side for A/B.
        from fbtt_embedding_tpu.ops.pallas.tt_flat import (
            flat_available as _flat_exact,
            flat_train_apply,
        )
        from fbtt_embedding_tpu.utils import knobs as _knobs
        _fa_mode = _knobs.get_str("FBTT_FUSED_APPLY", "auto")
        _FA_NNZ_MAX = 32768
        flat_apply_ok = (
            _fa_mode != "0"
            and (_fa_mode == "1" or nnz <= _FA_NNZ_MAX)
            and impl in ("auto", "pallas_sorted")
            and jax.default_backend() == "tpu"
            and _flat_exact(*shapes, num_tables, bs)
        )
        if flat_apply_ok:
            cdt = ("float32"
                   if precision == jax.lax.Precision.HIGHEST
                   else "bfloat16")
            out_tt, grads = flat_train_apply(
                params.tt_cores, *shapes, bs, indices_p, rowidx_p, tbl_p,
                w_p, dead, d_output, compute_dtype=cdt, idx_parts=parts,
            )
            output = cached_pool(out_tt)
            grads = tuple(grads)
        else:
            def fwd(cores):
                out = pooled_tt_lookup(
                    cores, *shapes, bs, indices_p, rowidx_p, tbl_p,
                    weights=w_p, precision=precision, impl=impl,
                    live_count=live, dead_mask=dead, idx_parts=parts,
                )
                return cached_pool(out)

            output, vjp = jax.vjp(fwd, params.tt_cores)
            (grads,) = vjp(d_output)
        if native:
            new_cores, new_opt = native_optim_step(
                optimizer, params.tt_cores, params.optimizer_state, grads,
                lr, eps, hparams=optim_hparams,
            )
        elif is_sgd:
            new_cores = sgd_step(params.tt_cores, grads, lr)
            new_opt = params.optimizer_state
        else:
            new_cores, new_opt = adagrad_step(
                params.tt_cores, params.optimizer_state, grads, lr, eps
            )
        # Cache rows keep the reference update family in both semantics.
        if locations is not None:
            if is_sgd:
                cache = cache_ops.cache_backward_sgd(
                    cache, d_output, locations, rowidx, lr, weights=weights
                )
            elif exact_cache:
                cache = cache_ops.cache_backward_adagrad(
                    cache, d_output, locations, rowidx, lr, eps,
                    weights=weights,
                )
            else:
                cache = cache_ops.cache_backward_rowwise_adagrad_approx(
                    cache, d_output, locations, rowidx, lr, eps,
                    weights=weights,
                )
        return output, TTEmbeddingParams(
            tt_cores=new_cores, optimizer_state=new_opt, cache=cache
        )

    return step


def make_serving_fn(
    tt_p_shapes: Sequence[int],
    tt_q_shapes: Sequence[int],
    tt_ranks: Sequence[int],
    num_tables: int,
    batch_size: int,
    probe_cache: bool = True,
    precision=None,
    impl: str = "auto",
):
    """Build a one-dispatch jitted inference lookup (the serving hot path).

    Returns ``serve(params, indices, offsets, weights=None, *,
    bs=batch_size) -> [T, B, D]`` (``bs`` is static, keyword-only):
    forward-only — no LFU counting, no backward buffers, no optimizer.
    Cache hits are served straight from the decompressed-row table and the
    TT kernels skip their lookups entirely (sentinel-key spans), so a hot
    (Zipf) request stream costs roughly ``(1 - hit_rate)`` of the TT
    forward plus one row gather — the cache's intended serving win
    (reference intent: ``cache_forward``, ``tt_embeddings_cuda.cu:
    1498-1572``; the reference has no dedicated inference entry).
    """
    shapes = (tuple(tt_p_shapes), tuple(tt_q_shapes), tuple(tt_ranks))

    @functools.partial(jax.jit, static_argnames=("bs",))
    def serve(params: TTEmbeddingParams, indices, offsets, weights=None,
              *, bs: int = batch_size):
        # Big-E serving: `indices` may be the wide key-row array
        # (ops.cache.wide_cache_keys, int32 [nnz, 2+ndim]) — (hi, lo)
        # columns probe the int64-keyed cache, part columns feed the
        # TT kernels (same contract as make_fused_train_step).
        parts = None
        key_input = indices
        if indices.ndim == 2:
            parts, key_input, nnz = cache_ops.split_wide_keyrows(
                indices, len(tt_p_shapes))
            indices = None
        else:
            nnz = indices.shape[0]
        rowidx, tableidx = rowidx_from_offsets(offsets, nnz, num_tables, bs)
        tbl = tableidx if num_tables > 1 else None
        cache = params.cache
        locations = (
            cache_ops.cache_lookup(cache, key_input)
            if (probe_cache and cache is not None) else None
        )
        from fbtt_embedding_tpu.ops.lookup import pallas_sorted_available
        use_flat = (
            impl in ("auto", "pallas_sorted")
            and pallas_sorted_available(*shapes, num_tables, bs)
        )
        dead = None
        w_p = weights
        if locations is not None:
            if use_flat:
                dead = locations >= 0
            else:
                w_p = (locations < 0).astype(jnp.float32)
                if weights is not None:
                    w_p = w_p * weights
        out = pooled_tt_lookup(
            params.tt_cores, *shapes, bs, indices, rowidx, tbl,
            weights=w_p, precision=precision, impl=impl, dead_mask=dead,
            idx_parts=parts,
        )
        if locations is not None:
            cached_f = (locations >= 0).astype(jnp.float32)
            if weights is not None:
                cached_f = cached_f * weights
            cached_rows = (
                cache.weight[jnp.clip(locations, 0)] * cached_f[:, None]
            )
            out = out + _pool_cached_rows(
                cached_rows, rowidx, tbl, num_tables, bs)
        return out

    return serve


@struct.dataclass
class FoldedServingParams:
    """Frozen-weight serving state (:func:`make_folded_serving_fn`).

    Flat mode: ``setup`` holds the folded pass tables + pair-product
    table (cores are not carried — the fold replaces them). Fallback
    mode (configs the flat pipeline cannot serve): ``params`` carries
    the original pytree and serving runs the regular path.

    Quantized folds (``make_folded_serving_fn(..., quantize="int8")``)
    store the pair table inside ``setup`` as an ``(int8, scale)`` pair
    and the cache's decompressed-row table as int8 (``cache.weight``)
    with its per-row scales in ``cache_scale``.
    """

    setup: Optional[Tuple] = None
    params: Optional[TTEmbeddingParams] = None
    cache: Optional[CacheState] = None
    cache_scale: Optional[jnp.ndarray] = None


def make_folded_serving_fn(
    tt_p_shapes: Sequence[int],
    tt_q_shapes: Sequence[int],
    tt_ranks: Sequence[int],
    num_tables: int,
    batch_size: int,
    probe_cache: bool = True,
    precision=None,
    impl: str = "auto",
    interpret: bool = False,
    quantize: Optional[str] = None,
):
    """Weight-folded inference: returns ``(fold, serve)``.

    At inference the TT cores are frozen, so everything the flat forward
    derives from them per call — the kernel core layouts, the
    block-diagonal pass tables, and (tt_ndim >= 3) the G0xG1
    pair-product table — folds ONCE into ``fold(params) ->
    FoldedServingParams``. ``serve(folded, indices, offsets,
    weights=None, *, bs=None) -> [T, B, D]`` then runs one sort, a
    pair-table gather (no first-pass kernel, no z0 gather, no forward
    sort-order permute), the remaining kernel pass(es), and the pool.
    ``bs`` (static, keyword-only) overrides the per-call batch size,
    matching :func:`make_serving_fn`. Because the build cost is
    amortized to zero, the pair table engages at ANY batch size —
    training gates it at nnz >= 16k (``docs/PERF.md``). The fold trades
    HBM for latency: [T*p0*p1, q0*q1*r2] — 45 MB bf16 at the reference
    headline shape.

    The fold snapshots EVERYTHING, including ``params.cache``: if the
    LFU cache is repopulated after freezing (``cache_populate``), a
    folded server keeps reading the stale decompressed rows. Re-run
    ``fold(params)`` after repopulating — or, when the cores are
    unchanged, use :func:`refold_cache` to swap in the new cache while
    reusing the existing pass/pair tables.

    ``quantize="int8"`` shrinks the fold's two big HBM residents —
    the pair-product table and the LFU cache's decompressed-row table
    (45 MB bf16 + ``C*D`` fp32, ~282 MB at the reference headline
    config with ``cache_size=0.1E``) — to per-row-scaled int8: 2–4×
    the serving capacity per chip for a ~0.4%-of-row-absmax rounding
    error per gathered row (pooling averages it further). Dequant is
    one fused multiply after each row gather; the serve-time kernels
    and their compute dtype are unchanged. Quantization applies to the
    flat fold only — fallback-mode folds carry the original pytree and
    log a warning.

    The reference has no serving entry at all (its closest analog is the
    cache-populate decompress, ``tt_embeddings_cuda.cu:1156-1258``);
    this is net-new, TPU-idiomatic weight folding at export time.
    Falls back to :func:`make_serving_fn` semantics (cores carried,
    regular dispatch) when the flat pipeline cannot serve the config.
    """
    if quantize not in (None, "int8"):
        raise ValueError(
            f"quantize must be None or 'int8', got {quantize!r}")
    from fbtt_embedding_tpu.ops.lookup import (
        flat_pad_plan,
        pad_cores_for_flat,
        pallas_sorted_available,
    )
    from fbtt_embedding_tpu.ops.pallas import tt_flat

    p = tuple(tt_p_shapes)
    q = tuple(tt_q_shapes)
    rfull = tuple(validate_tt_shapes(tt_p_shapes, tt_q_shapes, tt_ranks))
    shapes = (p, q, rfull)

    def _flat_serveable() -> bool:
        # Mirror pallas_sorted_available's padded-shape re-check (minus the
        # backend probe): a pad plan alone is not enough — the PADDED shapes
        # must also clear the span-cap/VMEM gates in flat_available.
        if tt_flat.flat_available(p, q, rfull, num_tables, batch_size):
            return True
        plan = flat_pad_plan(p, q, rfull, batch_size)
        if plan is None:
            return False
        rp_, qlp_, bp_ = plan
        return tt_flat.flat_available(
            p, q[:-1] + (qlp_,), tuple(rp_), num_tables, bp_)

    use_flat = impl in ("auto", "pallas_sorted") and (
        pallas_sorted_available(p, q, rfull, num_tables, batch_size)
        or (interpret and _flat_serveable())
    )

    if not use_flat:
        if quantize is not None:
            logger.warning(
                "make_folded_serving_fn(quantize=%r): the flat pipeline "
                "is unavailable for this config/backend — the fallback "
                "fold carries the original (unquantized) pytree.",
                quantize)
        plain = make_serving_fn(
            tt_p_shapes, tt_q_shapes, tt_ranks, num_tables, batch_size,
            probe_cache=probe_cache, precision=precision, impl=impl)

        def fold(params: TTEmbeddingParams) -> FoldedServingParams:
            return FoldedServingParams(params=params)

        def serve(fp: FoldedServingParams, indices, offsets, weights=None,
                  *, bs: Optional[int] = None):
            return plain(fp.params, indices, offsets, weights,
                         bs=batch_size if bs is None else bs)

        return fold, serve

    cdt = ("float32"
           if (interpret or precision == jax.lax.Precision.HIGHEST)
           else "bfloat16")
    use_p, use_q, use_r = p, q, rfull
    pad = None
    if not tt_flat.flat_available(p, q, rfull, num_tables, batch_size):
        pad = flat_pad_plan(p, q, rfull, batch_size)
        rp, qlp, _bp = pad
        use_q = q[:-1] + (qlp,)
        use_r = tuple(rp)
    pair = tt_flat.pair_structural_ok(
        num_tables, use_p, use_q, use_r, jnp.dtype(cdt).itemsize)

    @jax.jit
    def fold(params: TTEmbeddingParams) -> FoldedServingParams:
        cores = params.tt_cores
        if pad is not None:
            cores = pad_cores_for_flat(cores, p, q, rfull, pad)
        setup = tt_flat.make_serving_fold(
            cores, use_p, use_q, use_r, compute_dtype=cdt, pair=pair,
            quantize=quantize)
        cache = params.cache if probe_cache else None
        cache_scale = None
        if quantize == "int8" and cache is not None:
            qw, cache_scale = tt_flat.quantize_rows_int8(cache.weight)
            cache = cache.replace(weight=qw)
        return FoldedServingParams(
            setup=setup, cache=cache, cache_scale=cache_scale)

    @functools.partial(jax.jit, static_argnames=("bs",))
    def serve(fp: FoldedServingParams, indices, offsets, weights=None,
              *, bs: Optional[int] = None):
        if fp.setup is None:
            raise ValueError(
                "FoldedServingParams.setup is None (fallback-mode fold — "
                "the flat pipeline was unavailable when fold() ran) but "
                "this serve() was built for flat mode. Rebuild the "
                "(fold, serve) pair with make_folded_serving_fn on the "
                "current backend, or serve via make_serving_fn.")
        bcall = batch_size if bs is None else bs
        # The flat kernels pool into num_tables*b segment rows, which
        # must tile to a multiple of 8; pad the batch and slice after.
        b_eff = bcall
        if (num_tables * b_eff) % 8 != 0:
            b_eff = -(-b_eff // 8) * 8
        # Big-E: wide key rows (same contract as make_serving_fn)
        parts = None
        key_input = indices
        if indices.ndim == 2:
            parts, key_input, nnz = cache_ops.split_wide_keyrows(
                indices, len(p))
            indices = None
        else:
            nnz = indices.shape[0]
        rowidx, tableidx = rowidx_from_offsets(
            offsets, nnz, num_tables, bcall)
        tbl = tableidx if num_tables > 1 else None
        cache = fp.cache
        locations = (
            cache_ops.cache_lookup(cache, key_input)
            if (probe_cache and cache is not None) else None
        )
        dead = locations >= 0 if locations is not None else None
        seg = tt_flat._seg_for(nnz)
        plan, nza = tt_flat._build_plan(
            indices, rowidx, tbl, weights, None, list(use_p), num_tables,
            b_eff, dead_mask=dead, idx_parts=parts, seg=seg, pair=pair)
        out, _ = tt_flat.flat_lookup_forward(
            None, use_p, use_q, use_r, b_eff, plan, nza,
            compute_dtype=cdt, interpret=interpret, seg=seg,
            setup=fp.setup, num_tables=num_tables)
        if pad is not None:
            ql = q[-1]
            out = out[:, :bcall].reshape(
                (num_tables, bcall) + use_q
            )[..., :ql].reshape(num_tables, bcall, -1)
        elif b_eff != bcall:
            out = out[:, :bcall]
        if locations is not None:
            cached_f = (locations >= 0).astype(jnp.float32)
            if weights is not None:
                cached_f = cached_f * weights
            loc0 = jnp.clip(locations, 0)
            if fp.cache_scale is not None:
                # int8 fold: dequant fuses into the gather consumer
                cached_rows = (
                    cache.weight[loc0].astype(jnp.float32)
                    * (fp.cache_scale[loc0] * cached_f)[:, None])
            else:
                cached_rows = cache.weight[loc0] * cached_f[:, None]
            out = out + _pool_cached_rows(
                cached_rows, rowidx, tbl, num_tables, bcall)
        return out

    return fold, serve


def refold_cache(
    fp: FoldedServingParams, params: TTEmbeddingParams
) -> FoldedServingParams:
    """Cache-only refresh of a folded serving state.

    After ``cache_populate`` the decompressed-row table changes but the
    TT cores (and therefore the folded pass/pair tables) do not — swap
    in the new cache without re-running the fold. Only valid when the
    cores are unchanged since ``fold(params)``; if they changed, re-fold.
    Fallback-mode folds (``setup is None``) carry the whole pytree, so
    the refresh is a full params swap there. Quantized folds re-quantize
    the fresh cache rows (the fold-time pair-table quantization is
    untouched — it derives from the cores).
    """
    if fp.setup is None:
        return FoldedServingParams(params=params)
    cache, cache_scale = params.cache, None
    # The fold was quantized if it carries cache scales OR its pair
    # table is an (int8, scale) pair — the latter catches folds frozen
    # BEFORE the cache was first populated (cache None at fold time),
    # the exact flow refold_cache exists for.
    quantized = fp.cache_scale is not None or isinstance(fp.setup[1], tuple)
    if quantized and cache is not None:
        from fbtt_embedding_tpu.ops.pallas import tt_flat
        qw, cache_scale = tt_flat.quantize_rows_int8(cache.weight)
        cache = cache.replace(weight=qw)
    return FoldedServingParams(
        setup=fp.setup, cache=cache, cache_scale=cache_scale)


def make_bucketed_serving_fn(
    tt_p_shapes: Sequence[int],
    tt_q_shapes: Sequence[int],
    tt_ranks: Sequence[int],
    num_tables: int,
    batch_buckets: Sequence[int],
    nnz_buckets: Sequence[int],
    probe_cache: bool = True,
    precision=None,
    impl: str = "auto",
    interpret: bool = False,
    quantize: Optional[str] = None,
):
    """Variable-request-size serving front-end: returns ``(fold, serve)``.

    A jitted serve specializes per ``(batch, nnz)`` shape — a production
    server receiving arbitrary request sizes would recompile constantly.
    This wrapper rounds each request UP to the smallest configured
    bucket (host-side padding: empty pad bags, weight-0 pad lookups) and
    dispatches to the folded flat serve, so at most
    ``len(batch_buckets) * len(nnz_buckets)`` programs ever compile, and
    the outputs are sliced back to the true batch. Pad lookups gather
    the sentinel-masked zero rows and carry weight 0 — they contribute
    exactly nothing to any real bag.

    ``serve(fp, indices, offsets, weights=None) -> [T, B, D]`` accepts
    any ``B <= max(batch_buckets)`` and ``nnz <= max(nnz_buckets)``
    (CSR layout as everywhere: ``offsets`` has ``T*B + 1`` entries,
    table-major). The reference has no serving entry (SURVEY §2.6);
    request bucketing is standard TPU serving practice (static shapes).
    """
    bb = sorted(set(int(v) for v in batch_buckets))
    nb = sorted(set(int(v) for v in nnz_buckets))
    if not bb or not nb:
        raise ValueError("batch_buckets and nnz_buckets must be non-empty")
    fold, serve = make_folded_serving_fn(
        tt_p_shapes, tt_q_shapes, tt_ranks, num_tables, bb[-1],
        probe_cache=probe_cache, precision=precision, impl=impl,
        interpret=interpret, quantize=quantize)

    def _bucket(v: int, buckets, what: str) -> int:
        for cap in buckets:
            if v <= cap:
                return cap
        raise ValueError(
            f"{what}={v} exceeds the largest configured bucket "
            f"{buckets[-1]}")

    def serve_any(fp: FoldedServingParams, indices, offsets, weights=None):
        idx = np.asarray(indices)
        off = np.asarray(offsets)
        t = num_tables
        if (off.shape[0] - 1) % t != 0:
            raise ValueError(
                f"offsets has {off.shape[0]} entries; expected T*B+1 "
                f"with T={t}")
        b = (off.shape[0] - 1) // t
        nnz = idx.shape[0]
        bs = _bucket(b, bb, "batch")
        nz = _bucket(nnz, nb, "nnz")

        if idx.ndim == 2:
            # wide key rows (big-E): pad keys get (hi, lo) = -1 — they
            # miss every cache probe — and in-range part columns 0,
            # which the weight-0 pad lookups zero out
            idx_p = np.zeros((nz, idx.shape[1]), idx.dtype)
            idx_p[:nnz] = idx
            idx_p[nnz:, :2] = -1
        else:
            idx_p = np.zeros((nz,), idx.dtype)
            idx_p[:nnz] = idx
        w_p = np.zeros((nz,), np.float32)
        w_p[:nnz] = 1.0 if weights is None else np.asarray(weights)
        # table-major CSR re-layout: table t's real bags keep their
        # spans, its pad bags are empty (start == end == the table's
        # real end); the LAST pad bag absorbs the padded index tail,
        # which its weight-0 entries zero out.
        off_p = np.empty((t * bs + 1,), off.dtype)
        off_p[0] = 0
        for ti in range(t):
            seg = off[ti * b:(ti + 1) * b + 1]
            off_p[ti * bs + 1:ti * bs + b + 1] = seg[1:]
            off_p[ti * bs + b + 1:(ti + 1) * bs + 1] = seg[-1]
        off_p[t * bs] = nz

        out = serve(fp, jnp.asarray(idx_p), jnp.asarray(off_p),
                    jnp.asarray(w_p), bs=bs)
        return out[:, :b]

    return fold, serve_any


class TTEmbeddingBag(TableBatchedTTEmbeddingBag):
    """Single-table TT EmbeddingBag; forward returns ``[B, D]``
    (reference ``tt_embeddings_ops.py:889-934``)."""

    def __init__(
        self,
        num_embeddings: int,
        embedding_dim: int,
        tt_ranks: List[int],
        tt_p_shapes: Optional[List[int]] = None,
        tt_q_shapes: Optional[List[int]] = None,
        optimizer: OptimType = OptimType.SGD,
        learning_rate: float = 0.1,
        eps: float = 1.0e-10,
        sparse: bool = True,
        use_cache: bool = True,
        cache_size: int = 0,
        hashtbl_size: int = 0,
        weight_dist: str = "approx-normal",
        enforce_embedding_dim: bool = False,
        seed: int = 0,
        precision=None,
        impl: str = "auto",
        cache_count_interval: int = 1,
        optim_semantics: str = "reference",
        optim_hparams: Optional[dict] = None,
    ) -> None:
        super().__init__(
            1, num_embeddings, embedding_dim, tt_ranks, tt_p_shapes,
            tt_q_shapes, optimizer, learning_rate, eps, sparse, use_cache,
            cache_size, hashtbl_size, weight_dist, enforce_embedding_dim,
            seed, precision, impl, cache_count_interval,
            optim_semantics, optim_hparams,
        )

    def forward(self, indices, offsets, weights=None,
                warmup: Optional[bool] = None) -> jnp.ndarray:
        """``warmup`` matches the reference's single-table signature
        (``tt_embeddings_ops.py:928-931``); semantics as in
        :meth:`TableBatchedTTEmbeddingBag.forward` (the intent — a
        per-call cache-probe override — not the reference's silent
        ignore)."""
        return super().forward(indices, offsets, weights, warmup)[0]

    __call__ = forward
