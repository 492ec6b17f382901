"""Windowed scatter-add for LFU-rank-concentrated row updates.

The cached TRAINING step's dominant cost on TPU was updating the touched
rows of the decompressed-row table: XLA lowers ``weight.at[loc].add(u)``
on an HBM-resident table to serialized random-row read-modify-writes at
~70 ns/row (measured; the same memory behavior an uncompressed embedding
table pays, and what the reference's massively-parallel atomic kernel —
``cache_backward_sgd_cuda``, ``tt_embeddings_cuda.cu:1574-1657`` —
avoids by saturating the memory system with thousands of threads).

Measured facts that shape this design (single v5e chip, n=10240 update
rows, D=64, table C=1.1M — see docs/PERF.md):

  * scatter into the full [1.1M, 64] table: 0.72 ms — the HBM
    random-RMW floor; ``unique_indices``/``indices_are_sorted`` hints
    and pre-sorting do NOT help (sorted+hinted measured 2.1 ms);
  * scatter into a target of <= ~16 MB: ~free (<0.08 ms) — the cost is
    random-access latency on the big target, not operand length;
  * a dense ``w[:W] += delta`` slab add: ~free (contiguous);
  * per-row DMA streaming (Pallas, 256 B transfers): 4.0 ms —
    descriptor-overhead-bound, a dead end;
  * ``lax.cond`` with the [C, D] table as operand: +0.65 ms of XLA
    copy-insertion — branching on the table is MORE expensive than the
    scatter it tries to skip. ``lax.while_loop`` table carries are
    copy-free (verified), so dynamic work lives in a while loop.

The cache assigns locations BY LFU RANK (``cache_populate`` orders slots
by descending frequency), so under skewed traffic update locations
concentrate in the low rows. The algorithm (cond-free):

  1. rows inside the ``[0, W)`` window: scatter into a small ``[W, D]``
     delta (free) + one dense slab add (free);
  2. stragglers: positions compacted with one scalar sort, then applied
     in ``ceil(n_strag / cap)`` chunked scatters inside a
     ``lax.while_loop`` — ZERO iterations when the window absorbed
     everything, and never more than ``ceil(n/cap)`` (≈ the plain
     scatter's cost) under adversarial/uniform traffic.

Exact same semantics as ``table.at[loc].add(upd, mode="drop")`` for
out-of-range/negative ``loc``; deterministic (fixed summation order);
fp32 rounding may differ from the one-pass scatter at ~1 ulp since
window rows fold through the delta slab.

Measured at n=10240, B=512 headline shape: zipf(1.3)+ traffic (few
stragglers) ~0.1 ms vs 0.72 plain; zipf(1.05) (5.5k stragglers beyond
any VMEM-scale window) ~0.8 ms — the irreducible novel-random-row
influx; uniform worst case ~1.0 ms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

WINDOW = 65536  # rows; [W, D] delta stays ~16 MB at D=64 (the measured
                # free-scatter target ceiling)
CHUNK = 2048    # straggler rows applied per while-loop trip


def hot_scatter_add(table: jnp.ndarray, loc: jnp.ndarray,
                    upd: jnp.ndarray, window: int = WINDOW,
                    chunk: int = CHUNK) -> jnp.ndarray:
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
    #    positions first, ascending), apply in while-chunks — the loop
    #    body count is DYNAMIC (0 trips when the window absorbed all),
    #    which is what neither a cond (table copies) nor a fixed-width
    #    scatter (operand cost) can give
    pos = jnp.arange(n, dtype=jnp.int32)
    strag = valid & ~in_w
    skey = jax.lax.sort(jnp.where(strag, pos, jnp.int32(n)))
    # Pad to a whole number of chunks (sentinel n = dead): dynamic_slice
    # CLAMPS an out-of-range start to size-chunk, so an unpadded tail
    # chunk would re-read (and re-apply) positions from the previous
    # chunk — and n < chunk would not even trace. Padding removes both.
    n_pad = -(-max(n, 1) // chunk) * chunk
    if n_pad != n:
        skey = jnp.concatenate([
            skey, jnp.full((n_pad - n,), n, jnp.int32)])
    n_strag = jnp.sum(strag.astype(jnp.int32))
    n_chunks = (n_strag + chunk - 1) // chunk

    def more(carry):
        i, _ = carry
        return i < n_chunks

    def apply_chunk(carry):
        i, t = carry
        take = jax.lax.dynamic_slice(skey, (i * chunk,), (chunk,))
        live = take < n
        takec = jnp.minimum(take, n - 1)
        s_loc = jnp.where(live, loc[takec], c_rows)
        s_upd = jnp.where(live[:, None], upd[takec], 0.0)
        return i + 1, t.at[s_loc].add(s_upd.astype(t.dtype), mode="drop")

    _, table = jax.lax.while_loop(more, apply_chunk,
                                  (jnp.int32(0), table))
    return table
