"""Streaming hot-row cache update kernel.

The cached TRAINING step's dominant cost on TPU is updating the touched
rows of the decompressed-row table: XLA lowers ``weight.at[loc].add(u)``
to a serialized random-row read-modify-write (~75 ns/row at the headline
shape — ``docs/PERF.md``), the same memory behavior an uncompressed
embedding table pays and the thing the reference's massively-parallel
atomic kernel (``cache_backward_sgd_cuda``,
``tt_embeddings_cuda.cu:1574-1657``) avoids by saturating the memory
system with thousands of concurrent threads.

This kernel restores the concurrency with explicit DMA: per grid step it
issues a CHUNK of row-gather DMAs into a VMEM scratch (all in flight
together), applies the whole chunk's updates as ONE vector add, and
streams the rows back with a second batch of DMAs — turning a
latency-bound serial RMW chain into bandwidth-bound batched traffic.

Contract (enforced by the host wrapper in ``ops/cache.py``):
  * ``rows`` are UNIQUE (duplicates pre-aggregated by sort + segment-sum
    — deterministic, and exactly what the optimizer semantics need);
  * pad/invalid entries carry ``row >= c_rows`` and a ZERO update row —
    they clamp to the last row and write back what they read (the grid
    is sequential on TPU, so identical rewrites cannot race).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 256  # rows per grid step; all CHUNK gathers are in flight at once


def _cdiv(a, b):
    return -(-a // b)


@functools.lru_cache(maxsize=None)
def _stream_update_call(nrows, c_rows, d, interpret):
    nchunks = nrows // CHUNK

    def kernel(rows_ref, upd_ref, w_ref, w_out, scratch, g_sem, s_sem):
        del w_ref  # aliased with w_out; all access goes through w_out
        ci = pl.program_id(0)
        base = ci * CHUNK

        # sentinel rows (>= c_rows) get NO DMA at all — a clamped dummy
        # transfer would race a real update of the clamp target row
        # (concurrent writebacks have no order). Starts and waits pair
        # under the same predicate, so the semaphore stays balanced.
        def real(k):
            return rows_ref[base + k] < c_rows

        def clamped(k):
            return jnp.minimum(rows_ref[base + k], c_rows - 1)

        # phase A: launch every gather in the chunk (concurrent DMAs),
        # then drain the semaphore
        def issue_g(k, _):
            @pl.when(real(k))
            def _():
                pltpu.make_async_copy(
                    w_out.at[clamped(k)], scratch.at[k], g_sem).start()
            return 0

        jax.lax.fori_loop(0, CHUNK, issue_g, 0)

        def wait_g(k, _):
            @pl.when(real(k))
            def _():
                pltpu.make_async_copy(
                    w_out.at[clamped(k)], scratch.at[k], g_sem).wait()
            return 0

        jax.lax.fori_loop(0, CHUNK, wait_g, 0)

        # phase B: one vector add for the whole chunk (pad rows add 0)
        scratch[:] = scratch[:] + upd_ref[:]

        # phase C: stream the rows back
        def issue_s(k, _):
            @pl.when(real(k))
            def _():
                pltpu.make_async_copy(
                    scratch.at[k], w_out.at[clamped(k)], s_sem).start()
            return 0

        jax.lax.fori_loop(0, CHUNK, issue_s, 0)

        def wait_s(k, _):
            @pl.when(real(k))
            def _():
                pltpu.make_async_copy(
                    scratch.at[k], w_out.at[clamped(k)], s_sem).wait()
            return 0

        jax.lax.fori_loop(0, CHUNK, wait_s, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec((CHUNK, d), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((CHUNK, d), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((c_rows, d), jnp.float32),
        grid_spec=grid_spec,
        # inputs flatten as (rows, upd, weight) -> weight aliases out 0
        input_output_aliases={2: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )


def streaming_available(d: int) -> bool:
    """The row DMA wants lane-aligned fp32 rows."""
    return d % 128 == 0 or d in (64,)


def streaming_row_update(weight: jnp.ndarray, rows: jnp.ndarray,
                         updates: jnp.ndarray,
                         interpret: bool = False) -> jnp.ndarray:
    """``weight[rows] += updates`` for UNIQUE ``rows`` (sentinel
    ``rows >= C`` must carry zero updates). Donates/aliases ``weight``.
    """
    c_rows, d = weight.shape
    n = rows.shape[0]
    nrows = _cdiv(n, CHUNK) * CHUNK
    if nrows != n:
        rows = jnp.pad(rows, (0, nrows - n),
                       constant_values=jnp.int32(c_rows))
        updates = jnp.pad(updates, ((0, nrows - n), (0, 0)))
    return _stream_update_call(nrows, c_rows, d, interpret)(
        rows.astype(jnp.int32), updates.astype(jnp.float32), weight)


def aggregate_row_updates(loc: jnp.ndarray, d_rows: jnp.ndarray,
                          c_rows: int):
    """Sort + segment-aggregate per-lookup updates into unique-row form.

    Returns ``(rows_u, upd_u)`` of length nnz: position ``u`` holds the
    u-th distinct touched row and the SUM of its updates; tail positions
    carry the sentinel ``c_rows`` with zero updates. Deterministic
    (sorted order), which also makes the optimizer math exact for
    duplicate lookups — same aggregation the deterministic cache
    backwards already use.

    ``loc`` entries ``>= c_rows`` or ``< 0`` are dropped (their updates
    must already be zeroed by the caller's mask).
    """
    nnz = loc.shape[0]
    key = jnp.where((loc >= 0) & (loc < c_rows), loc, c_rows)
    order = jnp.argsort(key, stable=True)
    key_s = key[order]
    upd_s = d_rows[order]
    is_first = jnp.concatenate(
        [jnp.ones((1,), bool), key_s[1:] != key_s[:-1]])
    uniq = jnp.cumsum(is_first.astype(jnp.int32)) - 1  # [nnz]
    upd_u = jax.ops.segment_sum(upd_s, uniq, num_segments=nnz)
    rows_u = jax.ops.segment_max(key_s, uniq, num_segments=nnz)
    # untouched tail of segment ids -> sentinel (segment_max yields the
    # dtype min for empty segments)
    n_uniq = uniq[-1] + 1
    pos = jnp.arange(nnz, dtype=jnp.int32)
    rows_u = jnp.where(pos < n_uniq, rows_u, c_rows).astype(jnp.int32)
    # sentinel segment (invalid/padded lookups) must carry zero updates
    upd_u = jnp.where((rows_u < c_rows)[:, None], upd_u, 0.0)
    return rows_u, upd_u
