"""Windowed scatter-add for LFU-rank-concentrated row updates.

The cached TRAINING step's dominant cost on TPU was updating the touched
rows of the decompressed-row table: XLA lowers ``weight.at[loc].add(u)``
on an HBM-resident table to a serialized random-row read-modify-write at
~75 ns/row (measured; the same memory behavior an uncompressed embedding
table pays, and what the reference's massively-parallel atomic kernel —
``cache_backward_sgd_cuda``, ``tt_embeddings_cuda.cu:1574-1657`` —
avoids by saturating the memory system with thousands of threads).

Measured facts that shape this design (single v5e chip, n=10240 update
rows, D=64, table C=1.1M — see docs/PERF.md):

  * scatter into the full [1.1M, 64] table: 0.75–0.81 ms — the HBM
    random-RMW floor; ``unique_indices``/``indices_are_sorted`` hints
    and pre-aggregation do NOT help (aggregation's segment_sum is
    itself a scatter);
  * scatter into a table of <= ~16 MB: ~free (<0.08 ms) — the target
    stays in fast memory across the loop;
  * a dense ``w[:W] += delta`` slab add: ~free (contiguous);
  * per-row DMA streaming (Pallas, 256 B transfers): 4.0 ms —
    descriptor-overhead-bound, a measured dead end.

The cache assigns locations BY LFU RANK (``cache_populate`` orders slots
by descending frequency), so under the skewed traffic that makes a cache
worth having, update locations concentrate in the low rows. That turns
the scatter into:

  1. rows inside a VMEM-scale window ``[0, W)``: scatter into a small
     ``[W, D]`` delta (free) + one dense slab add (free);
  2. stragglers: compacted to a fixed-size list with one scalar sort +
     gathers (sorts/gathers are fast; it is only scatters that serialize)
     and scattered directly (cap * 75 ns);
  3. straggler overflow (uniform/adversarial traffic): a ``lax.cond``
     falls back to the full scatter — worst case equals the plain
     scatter, typical case is ~5x faster.

Exact same semantics as ``table.at[loc].add(upd, mode="drop")`` for
out-of-range/negative ``loc``; deterministic (fixed summation order per
path); fp32 rounding may differ from the one-pass scatter at ~1 ulp
since window rows fold through the delta slab.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

WINDOW = 32768  # rows; [W, D] delta must stay VMEM-scale (8 MB at D=64)
STRAGGLER_CAP = 2048


def hot_scatter_add(table: jnp.ndarray, loc: jnp.ndarray,
                    upd: jnp.ndarray, window: int = WINDOW,
                    straggler_cap: int = STRAGGLER_CAP) -> jnp.ndarray:
    """``table.at[loc].add(upd, mode="drop")``, fast when ``loc`` is
    concentrated in the low rows (LFU-ranked cache locations).

    ``loc`` entries ``< 0`` or ``>= len(table)`` are dropped.
    """
    c_rows, d = table.shape
    n = loc.shape[0]
    loc = loc.astype(jnp.int32)
    if c_rows <= window + window // 2:
        # table is already small enough for the fast direct scatter
        sent = jnp.where((loc >= 0) & (loc < c_rows), loc, c_rows)
        return table.at[sent].add(upd.astype(table.dtype), mode="drop")

    valid = (loc >= 0) & (loc < c_rows)
    in_w = valid & (loc < window)

    # 1) window rows: small-target scatter + dense slab add (both ~free)
    delta = jnp.zeros((window + 1, d), jnp.float32).at[
        jnp.where(in_w, loc, window)
    ].add(jnp.where(in_w[:, None], upd, 0.0).astype(jnp.float32))
    table = table.at[0:window].add(delta[:window].astype(table.dtype))

    # 2) stragglers: compact positions with one scalar sort (straggler
    #    positions first, ascending), gather their rows/updates
    pos = jnp.arange(n, dtype=jnp.int32)
    strag = valid & ~in_w
    skey = jax.lax.sort(jnp.where(strag, pos, jnp.int32(n)))
    take = skey[:straggler_cap]
    live = take < n
    takec = jnp.minimum(take, n - 1)
    s_loc = jnp.where(live, loc[takec], c_rows)
    s_upd = jnp.where(live[:, None], upd[takec], 0.0)
    n_strag = jnp.sum(strag.astype(jnp.int32))

    def none_(t):
        return t

    def compacted(t):
        return t.at[s_loc].add(s_upd.astype(t.dtype), mode="drop")

    def overflow(t):
        # adversarial/uniform traffic: full-width straggler scatter
        return t.at[jnp.where(strag, loc, c_rows)].add(
            jnp.where(strag[:, None], upd, 0.0).astype(t.dtype),
            mode="drop")

    return jax.lax.cond(
        n_strag == 0, none_,
        lambda t: jax.lax.cond(
            n_strag <= straggler_cap, compacted, overflow, t),
        table)
