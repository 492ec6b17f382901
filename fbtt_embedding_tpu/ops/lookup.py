"""Pooled TT-embedding lookup (forward + dense backward).

TPU-native replacement for the reference's forward host driver
(``tt_embeddings_forward_cuda``, ``tt_embeddings_cuda.cu:964-1075``) and
segment-sum pooling kernel (``reduce_output_kernel``,
``tt_embeddings_cuda.cu:920-962``).

Design notes (TPU-first):
  * no chunked pointer-array GEMM loop — the whole nnz batch is one traced
    program; XLA tiles the batched contraction onto the MXU.
  * pooling is ``jax.ops.segment_sum`` — deterministic, no atomics
    (the reference's warp-walk kernel relies on sorted-by-construction
    rowidx; segment_sum has no such requirement).
  * the dense backward is plain JAX autodiff through the contraction chain
    with optional rematerialization, matching the reference's
    recompute-in-backward strategy (``tt_embeddings_cuda.cu:529-545``) at
    the XLA level: nothing but indices is saved from the forward.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import logging

import jax
import jax.numpy as jnp
import numpy as np

from fbtt_embedding_tpu.ops.contraction import tt_rows
from fbtt_embedding_tpu.ops.indexing import rowidx_from_offsets

logger = logging.getLogger(__name__)
_FALLBACK_LOGGED = set()


def pool_rows(
    rows: jnp.ndarray,
    rowidx: jnp.ndarray,
    tableidx: Optional[jnp.ndarray],
    num_tables: int,
    batch_size: int,
) -> jnp.ndarray:
    """Sum-pool per-lookup rows into ``[num_tables, B, D]`` bags."""
    d = rows.shape[-1]
    if num_tables == 1 or tableidx is None:
        seg = rowidx
    else:
        seg = tableidx * batch_size + rowidx
    pooled = jax.ops.segment_sum(
        rows, seg, num_segments=num_tables * batch_size
    )
    return pooled.reshape(num_tables, batch_size, d)


def tt_forward(
    tt_cores: Sequence[jnp.ndarray],
    tt_p_shapes: Sequence[int],
    tt_q_shapes: Sequence[int],
    tt_ranks: Sequence[int],
    batch_size: int,
    indices: jnp.ndarray,
    rowidx: jnp.ndarray,
    tableidx: Optional[jnp.ndarray] = None,
    weights: Optional[jnp.ndarray] = None,
    remat: bool = False,
    precision=None,
    idx_parts: Optional[Sequence[jnp.ndarray]] = None,
) -> jnp.ndarray:
    """Pooled TT-embedding forward: ``[num_tables, B, D]`` sum-pooled output.

    Functional analog of the reference binding ``tt_forward``
    (``tt_embeddings.cpp:132``). Differentiable wrt ``tt_cores`` (dense-grad
    mode); use :mod:`fbtt_embedding_tpu.ops.fused_optim` for the fused
    sparse-update path.

    Args:
      weights: optional ``[nnz]`` per-lookup scale (per-sample weights) —
        generalizes the reference, which only supports unweighted sum.
    """
    num_tables = tt_cores[0].shape[0]

    def rows_fn(cores):
        return tt_rows(
            cores, tt_p_shapes, tt_q_shapes, tt_ranks, indices, tableidx,
            precision=precision, idx_parts=idx_parts,
        )

    if remat:
        rows_fn = jax.checkpoint(rows_fn)
    rows = rows_fn(tuple(tt_cores))
    if weights is not None:
        rows = rows * weights[:, None].astype(rows.dtype)
    return pool_rows(rows, rowidx, tableidx, num_tables, batch_size)


def tt_embedding_bag_forward(
    tt_cores: Sequence[jnp.ndarray],
    tt_p_shapes: Sequence[int],
    tt_q_shapes: Sequence[int],
    tt_ranks: Sequence[int],
    indices: jnp.ndarray,
    offsets: jnp.ndarray,
    batch_size: int,
    weights: Optional[jnp.ndarray] = None,
    remat: bool = False,
    precision=None,
) -> jnp.ndarray:
    """EmbeddingBag-style entry: (indices, offsets) -> ``[T, B, D]``.

    ``offsets`` has ``num_tables * batch_size + 1`` entries,
    ``include_last_offset=True`` semantics (reference test oracle,
    ``tt_embeddings_test.py:95-102``).
    """
    num_tables = tt_cores[0].shape[0]
    nnz = indices.shape[0]
    rowidx, tableidx = rowidx_from_offsets(offsets, nnz, num_tables, batch_size)
    return tt_forward(
        tt_cores, tt_p_shapes, tt_q_shapes, tt_ranks, batch_size,
        indices, rowidx, tableidx if num_tables > 1 else None,
        weights=weights, remat=remat, precision=precision,
    )


def tt_grads_from_row_cotangents(
    tt_cores: Sequence[jnp.ndarray],
    tt_p_shapes: Sequence[int],
    tt_q_shapes: Sequence[int],
    tt_ranks: Sequence[int],
    indices: jnp.ndarray,
    tableidx: Optional[jnp.ndarray],
    d_rows: jnp.ndarray,
    precision=None,
    idx_parts: Optional[Sequence[jnp.ndarray]] = None,
) -> List[jnp.ndarray]:
    """Core gradients given per-lookup row cotangents ``[nnz, D]``.

    Used by the cached path, where cotangents of cache-served lookups are
    zeroed so their gradient flows to ``cache_weight`` only (reference
    routes this by partitioning lookups; we route by masking).
    """
    def rows_fn(cores):
        return tt_rows(
            cores, tt_p_shapes, tt_q_shapes, tt_ranks, indices, tableidx,
            precision=precision, idx_parts=idx_parts,
        )

    _, vjp = jax.vjp(rows_fn, tuple(tt_cores))
    (grads,) = vjp(d_rows.astype(tt_cores[0].dtype))
    return list(grads)


def tt_dense_backward(
    tt_cores: Sequence[jnp.ndarray],
    tt_p_shapes: Sequence[int],
    tt_q_shapes: Sequence[int],
    tt_ranks: Sequence[int],
    batch_size: int,
    indices: jnp.ndarray,
    rowidx: jnp.ndarray,
    tableidx: Optional[jnp.ndarray],
    d_output: jnp.ndarray,
    precision=None,
) -> List[jnp.ndarray]:
    """Dense core gradients for a given output cotangent.

    Functional analog of ``tt_dense_backward`` (``tt_embeddings.cpp:133``):
    returns ``d_tt_cores`` (same shapes as cores) without touching optimizer
    state. Implemented as a VJP of :func:`tt_forward` — the gather's
    transpose is a deterministic scatter-add (the reference uses
    ``atomicAdd``, ``tt_embeddings_cuda.cu:362-377``).
    """
    def fwd(cores):
        return tt_forward(
            cores, tt_p_shapes, tt_q_shapes, tt_ranks, batch_size,
            indices, rowidx, tableidx, precision=precision,
        )

    _, vjp = jax.vjp(fwd, tuple(tt_cores))
    (grads,) = vjp(d_output.astype(tt_cores[0].dtype))
    return list(grads)


# ---------------------------------------------------------------- dispatch

@functools.lru_cache(maxsize=None)
def _mosaic_probe() -> bool:
    """One-shot runtime probe: can Mosaic compile a representative kernel
    on this backend?

    The static availability gates encode the tiling/VMEM rules we have
    measured, but Mosaic support varies by TPU generation and libtpu
    version; a backend that reports "tpu" yet rejects the kernel lowering
    would otherwise crash at first dispatch inside the user's jit. Probing
    one tiny MXU-dot kernel compile per process (cached) turns that crash
    into a logged fallback to the XLA path. Compile-only — nothing runs on
    the chip, and the CPU/interpret paths never reach this (the backend
    check precedes it).
    """
    import jax as _jax
    from jax.experimental import pallas as pl

    def _k(x_ref, y_ref, o_ref):
        o_ref[...] = jnp.dot(x_ref[...], y_ref[...],
                             preferred_element_type=jnp.float32)

    try:
        f = pl.pallas_call(
            _k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))
        x = jax.ShapeDtypeStruct((8, 128), jnp.float32)
        y = jax.ShapeDtypeStruct((128, 128), jnp.float32)
        _jax.jit(f).lower(x, y).compile()
        return True
    except Exception as e:  # Mosaic/libtpu rejection
        logger.warning(
            "Pallas/Mosaic probe failed on backend %s (%s: %s); the fused "
            "TT kernels are disabled for this process and the XLA path "
            "serves all configs",
            _jax.default_backend(), type(e).__name__, e)
        return False


def pallas_forward_available(
    tt_p_shapes, tt_q_shapes, tt_ranks, num_tables, batch_size,
) -> bool:
    """True when the fused Pallas forward kernel can serve this config on
    the current default backend."""
    import jax as _jax

    if _jax.default_backend() != "tpu" or not _mosaic_probe():
        return False
    from fbtt_embedding_tpu.ops.pallas.tt_kernel import kernel_available

    r = list(tt_ranks)
    if len(r) == len(tt_p_shapes) - 1:
        r = [1] + r + [1]
    return kernel_available(
        tuple(tt_p_shapes), tuple(tt_q_shapes), tuple(r), num_tables,
        batch_size, backward=False,
    )


def pallas_backward_available(
    tt_p_shapes, tt_q_shapes, tt_ranks, num_tables, batch_size,
) -> bool:
    import jax as _jax

    if _jax.default_backend() != "tpu" or not _mosaic_probe():
        return False
    from fbtt_embedding_tpu.ops.pallas.tt_kernel import kernel_available

    r = list(tt_ranks)
    if len(r) == len(tt_p_shapes) - 1:
        r = [1] + r + [1]
    return kernel_available(
        tuple(tt_p_shapes), tuple(tt_q_shapes), tuple(r), num_tables,
        batch_size, backward=True,
    )


def _pad_up(x: int, m: int) -> int:
    return -(-x // m) * m


def flat_pad_plan(tt_p_shapes, tt_q_shapes, ranks, batch_size):
    """Padded ``(full_ranks, q_last, B)`` satisfying the flat kernels'
    multiple-of-8 tiling gates (any tt_ndim 2-4), or None if no padding is
    needed.

    Zero-padding ranks / the last q-dim / the batch is mathematically
    exact: zero rank-channels contribute nothing to outputs or real-core
    gradients, and the pad/slice pair differentiates to slice/pad — so
    reference-style odd ranks (13/12/7 in the reference's own test suite,
    ``tt_embeddings_test.py:65-70``) take the fast path instead of
    silently falling back to XLA.

    The flat kernels stage core-``t``'s input as ``q0`` lane-blocks of
    width ``mm_t * r_t`` (``mm_t = q1*..*q_{t-1}``) and its output as
    blocks of ``mm_t * q_t * r_{t+1}``; each block width must be a
    multiple of 8 lanes. Padding rank ``r_t`` to
    ``ceil8(mm_t * r_t) / mm_t`` fixes pass ``t``'s input AND pass
    ``t-1``'s output (they are the same width); the final pass's output
    width is fixed by padding the last q-dim.
    """
    import math

    ndim = len(tt_p_shapes)
    q = list(tt_q_shapes)
    r = list(ranks)  # full boundary ranks, len ndim + 1
    rp = list(r)
    mm = 1
    for t in range(1, ndim):
        rp[t] = _pad_up(r[t], 8 // math.gcd(mm, 8))
        mm *= q[t]
    mm_last = mm // q[ndim - 1]
    qlp = _pad_up(q[ndim - 1], 8 // math.gcd(mm_last, 8))
    bp = _pad_up(batch_size, 8)
    if (tuple(rp), qlp, bp) == (tuple(r), q[ndim - 1], batch_size):
        return None
    return tuple(rp), qlp, bp


def pallas_sorted_available(
    tt_p_shapes, tt_q_shapes, tt_ranks, num_tables, batch_size,
    allow_padding: bool = True,
) -> bool:
    """True when the flat sorted-run pipeline can serve this config on the
    current default backend (tt_ndim 2-4; odd ranks/dims are zero-padded
    to the tiling gates when ``allow_padding``)."""
    import jax as _jax

    if _jax.default_backend() != "tpu" or not _mosaic_probe():
        return False
    from fbtt_embedding_tpu.ops.pallas.tt_flat import flat_available

    r = list(tt_ranks)
    if len(r) == len(tt_p_shapes) - 1:
        r = [1] + r + [1]
    if flat_available(
            tuple(tt_p_shapes), tuple(tt_q_shapes), tuple(r), num_tables,
            batch_size):
        return True
    if not allow_padding:
        return False
    plan = flat_pad_plan(tt_p_shapes, tt_q_shapes, r, batch_size)
    if plan is None:
        return False
    rp, qlp, bp = plan
    qp = tuple(tt_q_shapes[:-1]) + (qlp,)
    return flat_available(tuple(tt_p_shapes), qp, rp, num_tables, bp)


def pad_cores_for_flat(tt_cores, tt_p_shapes, tt_q_shapes, ranks, plan):
    """Zero-pad cores (module layout ``[T, p_t, r_t*q_t*r_{t+1}]``) to a
    :func:`flat_pad_plan`'s padded ranks / last q-dim. Exact — see
    ``flat_pad_plan``."""
    rp, qlp, _ = plan
    ndim = len(tt_p_shapes)
    t = tt_cores[0].shape[0]
    out = []
    for ti in range(ndim):
        q_t = tt_q_shapes[ti] if ti < ndim - 1 else qlp
        c = tt_cores[ti].reshape(
            t, tt_p_shapes[ti], ranks[ti], tt_q_shapes[ti], ranks[ti + 1])
        c = jnp.pad(c, (
            (0, 0), (0, 0), (0, rp[ti] - ranks[ti]),
            (0, q_t - tt_q_shapes[ti]), (0, rp[ti + 1] - ranks[ti + 1]),
        ))
        out.append(c.reshape(t, tt_p_shapes[ti], rp[ti] * q_t * rp[ti + 1]))
    return tuple(out)


def any_pallas_forward_available(
    tt_p_shapes, tt_q_shapes, tt_ranks, num_tables, batch_size,
) -> bool:
    """True when SOME fused kernel (sorted or generic) serves this config —
    the gate callers use to decide live-first partitioning."""
    return pallas_sorted_available(
        tt_p_shapes, tt_q_shapes, tt_ranks, num_tables, batch_size
    ) or pallas_forward_available(
        tt_p_shapes, tt_q_shapes, tt_ranks, num_tables, batch_size
    )


@functools.lru_cache(maxsize=None)
def _make_pooled_pallas_vjp(p, q, r, num_tables, batch_size, has_tableidx,
                            has_weights, precision, interpret,
                            pallas_bwd):
    """Pooled lookup: Pallas fused forward, Pallas or XLA backward.

    Measured on v5e at the benchmark config: the Pallas forward (cores in
    VMEM, fused gather+chain+pool) is ~3x faster than XLA's
    gather+dot+segment_sum, and the Pallas backward (in-VMEM recompute +
    hybrid one-hot-dot / streamed-vals scatters) beats XLA's
    HIGHEST-precision one-hot grad contractions by ~20%.
    """
    from fbtt_embedding_tpu.ops.indexing import decompose_indices
    from fbtt_embedding_tpu.ops.pallas.tt_kernel import (
        tt_backward_pallas,
        tt_forward_pallas,
    )

    pl_, ql_, rl_ = list(p), list(q), list(r)

    def fwd_impl(cores, indices, rowidx, tableidx, weights, live):
        idx_parts = decompose_indices(indices, pl_)
        return tt_forward_pallas(
            cores, pl_, ql_, rl_, batch_size, idx_parts, rowidx,
            tableidx if has_tableidx else None,
            weights if has_weights else None,
            interpret=interpret,
            live_count=live,
        )

    @jax.custom_vjp
    def fn(cores, indices, rowidx, tableidx, weights, live):
        return fwd_impl(cores, indices, rowidx, tableidx, weights, live)

    def fn_fwd(cores, indices, rowidx, tableidx, weights, live):
        out = fwd_impl(cores, indices, rowidx, tableidx, weights, live)
        return out, (cores, indices, rowidx, tableidx, weights, live)

    def fn_bwd(res, d_output):
        cores, indices, rowidx, tableidx, weights, live = res
        tbl = tableidx if has_tableidx else None
        if pallas_bwd:
            idx_parts = decompose_indices(indices, pl_)
            grads = tt_backward_pallas(
                cores, pl_, ql_, rl_, batch_size, idx_parts, rowidx,
                d_output, tbl, weights if has_weights else None,
                interpret=interpret,
                live_count=live,
            )
        else:
            if tbl is None:
                d_rows = d_output[0][rowidx]
            else:
                t, b, d = d_output.shape
                d_rows = d_output.reshape(t * b, d)[tbl * b + rowidx]
            if has_weights:
                d_rows = d_rows * weights[:, None].astype(d_rows.dtype)
            grads = tt_grads_from_row_cotangents(
                cores, pl_, ql_, rl_, indices, tbl, d_rows,
                precision=precision,
            )
        nnz = indices.shape[0]
        zi = np.zeros((nnz,), dtype=jax.dtypes.float0)
        z1 = np.zeros((1,), dtype=jax.dtypes.float0)
        return (
            tuple(grads), zi, zi,
            (zi if has_tableidx else None),
            (jnp.zeros_like(weights) if has_weights else None),
            (z1 if live is not None else None),
        )

    fn.defvjp(fn_fwd, fn_bwd)
    return fn


def pooled_tt_lookup(
    tt_cores: Sequence[jnp.ndarray],
    tt_p_shapes: Sequence[int],
    tt_q_shapes: Sequence[int],
    tt_ranks: Sequence[int],
    batch_size: int,
    indices: jnp.ndarray,
    rowidx: jnp.ndarray,
    tableidx: Optional[jnp.ndarray] = None,
    weights: Optional[jnp.ndarray] = None,
    precision=None,
    impl: str = "auto",
    interpret: bool = False,
    live_count: Optional[jnp.ndarray] = None,
    dead_mask: Optional[jnp.ndarray] = None,
    idx_parts: Optional[Sequence[jnp.ndarray]] = None,
) -> jnp.ndarray:
    """Pooled TT-embedding lookup ``[num_tables, B, D]``, best-impl dispatch.

    ``impl``: "auto" (index-sorted shared-slab Pallas kernels on TPU when
    supported, generic Pallas next, XLA otherwise), "pallas_sorted",
    "pallas", or "xla". Differentiable wrt ``tt_cores`` in every mode
    (``weights`` is a non-differentiable per-lookup scale used for masking
    and per-sample weights).

    ``live_count`` (Pallas modes): [1]-shaped traced count of live lookups;
    when the caller packs live lookups first (cache-served ones at the
    tail with weight 0), kernel blocks past the count are skipped — the
    cache's compute saving with static shapes. The sorted mode keeps the
    live-first packing through its sort (dead lookups get the max key).

    ``dead_mask`` (pallas_sorted only): [nnz] bool marking cache-served
    lookups IN PLACE — no positional packing needed; the pipeline's sort
    clusters them into skipped sentinel spans. Cheaper than live_count
    packing (which costs several [nnz] scatters on the caller side).
    """
    from fbtt_embedding_tpu.ops.contraction import validate_tt_shapes

    ranks = validate_tt_shapes(tt_p_shapes, tt_q_shapes, tt_ranks)
    num_tables = tt_cores[0].shape[0]
    if impl == "auto":
        if pallas_sorted_available(
                tt_p_shapes, tt_q_shapes, ranks, num_tables, batch_size):
            impl = "pallas_sorted"
        elif idx_parts is None and pallas_forward_available(
                tt_p_shapes, tt_q_shapes, ranks, num_tables, batch_size):
            # the generic kernels take flat row ids; precomputed parts
            # (the int64 row-id path) route to the flat or XLA paths
            impl = "pallas"
        else:
            impl = "xla"
            key = (tuple(tt_p_shapes), tuple(tt_q_shapes), tuple(ranks),
                   num_tables, batch_size)
            if (jax.default_backend() == "tpu"
                    and key not in _FALLBACK_LOGGED):
                _FALLBACK_LOGGED.add(key)
                logger.info(
                    "TT lookup config p=%s q=%s ranks=%s T=%s B=%s falls "
                    "back to the XLA path (no fused kernel serves it: "
                    "tt_ndim != 3 with unpaddable tiling, or the span cap "
                    "was exceeded)", *key)
    if impl == "pallas_sorted":
        from fbtt_embedding_tpu.ops.pallas.tt_flat import (
            flat_available,
            make_flat_vjp,
        )

        # bf16 staged intermediates by default (fp32 master cores and
        # fp32 accumulation — the MXU multiplies in bf16 at DEFAULT
        # precision anyway; staging Z1/dZ1 in bf16 halves the pipeline's
        # HBM traffic). HIGHEST precision requests fp32 staging.
        cdt = ("float32"
               if (interpret or precision == jax.lax.Precision.HIGHEST)
               else "bfloat16")
        aux = dead_mask if dead_mask is not None else live_count

        use_p = tuple(tt_p_shapes)
        use_q = tuple(tt_q_shapes)
        use_r = tuple(ranks)
        use_b = batch_size
        pad = None
        if not flat_available(use_p, use_q, use_r, num_tables, batch_size):
            pad = flat_pad_plan(tt_p_shapes, tt_q_shapes, ranks, batch_size)
            if pad is None or not flat_available(
                    use_p, tuple(tt_q_shapes[:-1]) + (pad[1],), pad[0],
                    num_tables, pad[2]):
                raise ValueError(
                    "impl='pallas_sorted' cannot serve this config even "
                    f"with rank/dim padding (p={tt_p_shapes}, "
                    f"q={tt_q_shapes}, ranks={ranks}, T={num_tables}, "
                    f"B={batch_size}) — use impl='auto' to fall back"
                )
        if pad is not None:
            # zero-pad odd ranks / last q-dim / batch to the tiling gates
            # (exact; see flat_pad_plan) and slice the output back
            rp, qlp, bp = pad
            cores_use = pad_cores_for_flat(
                tt_cores, tt_p_shapes, tt_q_shapes, ranks, pad)
            use_q = tuple(tt_q_shapes[:-1]) + (qlp,)
            use_r = tuple(rp)
            use_b = bp
        else:
            cores_use = tuple(tt_cores)
        fn = make_flat_vjp(
            use_p, use_q, use_r,
            num_tables, use_b, tableidx is not None,
            weights is not None, aux is not None, interpret,
            compute_dtype=cdt, live_is_mask=dead_mask is not None,
            parts_mode=idx_parts is not None,
        )
        key_in = tuple(idx_parts) if idx_parts is not None else indices
        out = fn(cores_use, key_in, rowidx, tableidx, weights, aux)
        if pad is not None:
            ql = tt_q_shapes[-1]
            out = out[:, :batch_size].reshape(
                (num_tables, batch_size) + use_q
            )[..., :ql].reshape(num_tables, batch_size, -1)
        return out
    if impl == "pallas":
        pallas_bwd = interpret or pallas_backward_available(
            tt_p_shapes, tt_q_shapes, ranks, num_tables, batch_size)
        fn = _make_pooled_pallas_vjp(
            tuple(tt_p_shapes), tuple(tt_q_shapes), tuple(ranks),
            num_tables, batch_size, tableidx is not None,
            weights is not None, precision, interpret, pallas_bwd,
        )
        return fn(tuple(tt_cores), indices, rowidx, tableidx, weights,
                  live_count)
    rows = tt_rows(
        tt_cores, tt_p_shapes, tt_q_shapes, ranks, indices, tableidx,
        precision=precision, idx_parts=idx_parts,
    )
    if weights is not None:
        rows = rows * jax.lax.stop_gradient(weights)[:, None].astype(rows.dtype)
    return pool_rows(rows, rowidx, tableidx, num_tables, batch_size)
