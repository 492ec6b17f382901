"""Software LFU cache of decompressed hot embedding rows.

TPU-native re-design of the reference's cache subsystem
(``hashtbl_cuda_utils.cuh`` + ``tt_embeddings_cuda.cu:1077-1336,1498-1835``):
an open-addressing hash table (MurmurHash3 finalizer, linear probing,
MAX_PROBES=3) that counts per-row lookup frequencies, a populate step that
keeps the top-``cache_size`` rows and prefetches their decompressed values,
and a masked two-path forward.

Key departures from the CUDA design, all deliberate:

  * **No atomics, no host sync.** The reference partitions lookups into
    TT/cached segments with ``cub::DevicePartition`` and a blocking D2H copy
    of the split point (``tt_embeddings_cuda.cu:1436-1488``). XLA needs
    static shapes, so we never partition: the forward computes a per-lookup
    ``cache_location`` (-1 = not cached) and selects rows with a mask. The
    whole step stays on-device with zero syncs.
  * **Deterministic inserts.** The reference's ``hashtbl_insert`` resolves
    races with ``atomicCAS`` (non-deterministic claim order). Here claims
    are resolved by a scatter-min tournament per probe round — bitwise
    reproducible across runs.
  * **Deterministic counting.** Duplicate indices within a batch are
    pre-aggregated by sort + segment-sum before touching the table.
  * int32 keys/counters (TPU-friendly; the reference uses int64). Row
    ids >= 2^31 (the reference's int64 key range,
    ``hashtbl_cuda_utils.cuh:100-133``) are served by the **wide-key**
    hashed mode: each table row stores ``(hi, lo, part_0..part_{n-1})``
    int32 columns — the 64-bit id split at bit 31 plus its host-decomposed
    per-core indices, so populate can decompress winners without 64-bit
    device arithmetic. Build key rows with :func:`wide_cache_keys`.
  * **Direct-indexed mode.** When ``hashtbl_size >= num_embeddings`` —
    which is the reference's *default* (``hashtbl_size = E``,
    ``tt_embeddings_ops.py:548``) — hashing is pointless: a dense
    ``freq[E]`` table gives EXACT counts with a single scatter-add
    (~20x faster than the tournament at the benchmark config) and lookup
    is one gather into a dense ``slots[E]`` table. The hashed
    open-addressing mode remains for ``hashtbl_size < E``. Direct mode is
    marked by ``keys.shape == (0,)`` (shape-static, so jit-friendly).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import struct

MAX_PROBES = 3  # same as the reference (tt_embeddings_cuda.cu:29)
EMPTY_KEY = -1
_INT32_MAX = jnp.iinfo(jnp.int32).max


@struct.dataclass
class CacheState:
    """Device-resident cache tables (a pytree; checkpointable as-is).

    Analog of the reference module buffers ``hashtbl`` / ``cache_freq`` /
    ``cache_state`` / ``cache_weight`` / ``cache_optimizer_state``
    (``tt_embeddings_ops.py:551-585``).
    """

    keys: jnp.ndarray        # int32[H] (hashed) / int32[0] (direct mode)
                             # / int32[H, 2+ndim] (wide-key hashed, big-E)
    freq: jnp.ndarray        # int32[H] / int32[E], LFU counts
    slots: jnp.ndarray       # int32[H] / int32[E]: slot/row -> cache row or -1
    weight: jnp.ndarray      # float32[C, D], decompressed hot rows
    opt_state: jnp.ndarray   # float32[C] (rowwise) / [C, D] (exact) / [0]

    @property
    def direct(self) -> bool:
        """True when counting is direct-indexed by row id (no hash table)."""
        return self.keys.shape[0] == 0

    @property
    def wide(self) -> bool:
        """True for the wide-key (int64 row id) hashed layout."""
        return self.keys.ndim == 2

    @property
    def hashtbl_size(self) -> int:
        return self.keys.shape[0]

    @property
    def cache_size(self) -> int:
        return self.weight.shape[0]


def make_cache_state(
    hashtbl_size: int,
    cache_size: int,
    embedding_dim: int,
    opt_state_kind: str = "none",  # "none" | "rowwise" | "full"
    num_embeddings: Optional[int] = None,
    wide_keys: int = 0,
) -> CacheState:
    """Allocate cache tables.

    If ``num_embeddings`` is given and ``hashtbl_size >= num_embeddings``
    (the reference's default sizing), uses the direct-indexed layout:
    ``freq``/``slots`` are dense ``[num_embeddings]`` tables and ``keys``
    is empty.

    ``wide_keys``: pass the table's ``tt_ndim`` to get the wide-key
    hashed layout for int64 row ids (``prod(p) >= 2**31``): each key row
    stores ``(hi, lo, part_0..part_{ndim-1})`` — see
    :func:`wide_cache_keys`. Mutually exclusive with direct mode.
    """
    if opt_state_kind == "rowwise":
        opt = jnp.zeros((cache_size,), jnp.float32)
    elif opt_state_kind == "full":
        opt = jnp.zeros((cache_size, embedding_dim), jnp.float32)
    else:
        opt = jnp.zeros((0,), jnp.float32)
    if wide_keys:
        return CacheState(
            keys=jnp.full((hashtbl_size, 2 + wide_keys), EMPTY_KEY,
                          jnp.int32),
            freq=jnp.zeros((hashtbl_size,), jnp.int32),
            slots=jnp.full((hashtbl_size,), -1, jnp.int32),
            weight=jnp.zeros((cache_size, embedding_dim), jnp.float32),
            opt_state=opt,
        )
    direct = num_embeddings is not None and hashtbl_size >= num_embeddings
    n = num_embeddings if direct else hashtbl_size
    return CacheState(
        keys=jnp.full((0 if direct else hashtbl_size,), EMPTY_KEY, jnp.int32),
        freq=jnp.zeros((n,), jnp.int32),
        slots=jnp.full((n,), -1, jnp.int32),
        weight=jnp.zeros((cache_size, embedding_dim), jnp.float32),
        opt_state=opt,
    )


def wide_cache_keys(indices64, tt_p_shapes) -> "jnp.ndarray":
    """Host-side key rows for the wide (int64) cache mode:
    ``int32 [nnz, 2 + ndim]`` columns ``(hi, lo, part_0..part_{ndim-1})``
    where ``hi = id >> 31`` and ``lo = id & 0x7FFFFFFF`` (both
    non-negative, so the device never touches 64-bit integers — the
    reference instead keys its table with device int64,
    ``tt_embeddings_ops.py:551-558``). The decomposed per-core parts ride
    along so :func:`cache_populate` can decompress winning rows without
    64-bit device arithmetic.
    """
    import numpy as np

    from fbtt_embedding_tpu.ops.indexing import decompose_indices64

    idx = np.asarray(indices64, dtype=np.int64).reshape(-1)
    hi = (idx >> 31).astype(np.int32)
    lo = (idx & 0x7FFFFFFF).astype(np.int32)
    parts = decompose_indices64(idx, tt_p_shapes)
    return jnp.asarray(np.stack([hi, lo, *parts], axis=1))


def split_wide_keyrows(keyrows: jnp.ndarray, ndim: int):
    """Split a wide key-row array (:func:`wide_cache_keys`) into the
    pieces the lookup/serving/training entries consume.

    Returns ``(idx_parts, key_input, nnz)``: per-core int32 part columns
    for the TT kernels, the full rows for cache counting/probing, and
    the row count. Validates the column layout once, centrally — every
    entry that accepts 2-D ``indices`` routes through here.
    """
    if keyrows.ndim != 2 or keyrows.shape[1] != 2 + ndim:
        raise ValueError(
            f"wide key rows must be [nnz, 2 + ndim] = [*, {2 + ndim}] "
            f"int32 (hi, lo, part_0..part_{ndim - 1}) from "
            f"ops.cache.wide_cache_keys; got shape {keyrows.shape}")
    parts = tuple(keyrows[:, 2 + t] for t in range(ndim))
    return parts, keyrows, keyrows.shape[0]


def _murmur_fmix32(x: jnp.ndarray) -> jnp.ndarray:
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def hash_keys(keys: jnp.ndarray, table_size: int) -> jnp.ndarray:
    """MurmurHash3 32-bit finalizer, reduced mod table size.

    Same mixing constants as the reference (``hashtbl_cuda_utils.cuh:44-98``)
    applied to int32 row ids.
    """
    x = _murmur_fmix32(keys.astype(jnp.uint32))
    return (x % jnp.uint32(table_size)).astype(jnp.int32)


def hash_keys_wide(hi: jnp.ndarray, lo: jnp.ndarray,
                   table_size: int) -> jnp.ndarray:
    """Hash for split int64 keys: fold the high word into the low word
    (golden-ratio multiply) then the same finalizer — the 32-bit analog of
    the reference hashing device int64 keys
    (``hashtbl_cuda_utils.cuh:44-98``)."""
    x = lo.astype(jnp.uint32) ^ (
        hi.astype(jnp.uint32) * jnp.uint32(0x9E3779B1))
    x = _murmur_fmix32(x)
    return (x % jnp.uint32(table_size)).astype(jnp.int32)


def update_cache_state(state: CacheState, indices: jnp.ndarray,
                       scale: int = 1) -> CacheState:
    """LFU frequency counting: insert-or-increment each index.

    ``scale`` multiplies every increment — the sampled-counting hook:
    counting every k-th step with ``scale=k`` keeps the expected counts
    unbiased while cutting the scatter cost k-fold (the [nnz] scatter
    into the HBM-scale freq table is ~0.2 ms/step at the headline
    config, the largest single cost of the B=512 train step). LFU
    ranking is a replacement-policy heuristic, not part of the lookup
    math, so sampling changes WHICH rows get cached only marginally;
    the default (every step, scale=1) matches the reference exactly
    (``tt_embeddings_cuda.cu:1279-1323`` counts per batch).

    Deterministic analog of ``update_cache_state_kernel``
    (``tt_embeddings_cuda.cu:1077-1113``): duplicate indices are
    pre-aggregated, then each unique key either matches an existing table
    entry within MAX_PROBES linear-probe slots or claims the first empty
    probe slot. Claim conflicts inside the batch are resolved entirely in
    registers (a per-round tournament over the nnz candidate list plus a
    sorted-membership check against earlier winners), so the whole update
    costs exactly TWO table scatters (keys, freq) regardless of probe
    count — XLA scatters into the multi-MB table are the expensive part.
    Keys that lose every probe are dropped, matching the reference's
    approximate counting.

    Direct mode: ONE scatter-add into the dense ``freq`` table — exact
    counts, no hashing, no sort.
    """
    if state.direct:
        # Sort + promise_in_bounds is the measured-fast scatter path on
        # TPU (0.24 unsorted-drop -> 0.11 sorted-drop -> 0.04 ms sorted-
        # promise at the headline config: XLA's mode="drop" clamp
        # machinery doubles the scatter cost). Indices are clipped so the
        # promise is always honored; out-of-range ids (undefined behavior
        # in the reference's CUDA kernels) contribute a ZERO increment —
        # dropped, not miscounted against the boundary rows.
        n = state.freq.shape[0]
        idx = indices.astype(jnp.int32)
        valid = ((idx >= 0) & (idx < n)).astype(jnp.int32) * jnp.int32(scale)
        ii, inc = jax.lax.sort(
            [jnp.clip(idx, 0, n - 1), valid], num_keys=1)
        freq = state.freq.at[ii].add(
            inc, mode="promise_in_bounds", indices_are_sorted=True)
        return state.replace(freq=freq)
    if state.wide:
        return _update_cache_state_wide(state, indices, scale=scale)
    h_size = state.hashtbl_size
    nnz = indices.shape[0]
    idx = jnp.sort(indices.astype(jnp.int32))
    is_first = jnp.concatenate(
        [jnp.ones((1,), bool), idx[1:] != idx[:-1]]
    )
    run_id = jnp.cumsum(is_first.astype(jnp.int32)) - 1
    run_counts = jax.ops.segment_sum(
        jnp.ones((nnz,), jnp.int32), run_id, num_segments=nnz
    )
    cnt = run_counts[run_id]  # per-position count of its run

    h = hash_keys(idx, h_size)
    slots = [(h + j) % h_size for j in range(MAX_PROBES)]

    def tournament(keys_table, unplaced):
        """One claim round: probe all slots at once (gathers are cheap;
        scatters and big sorts are not), find matches, and resolve empty-
        slot claims with ONE stable argsort over the (probe, key) candidate
        list — probe-major, keys ascending, so ties break lexicographically
        by (probe, key): deterministic. Each key takes its earliest winning
        probe; a slot it won at a later probe stays empty."""
        keys_at = [keys_table[s] for s in slots]
        match_j = [unplaced & (k == idx) for k in keys_at]
        matched = jnp.stack(match_j).any(axis=0)
        match_slot = jnp.full((nnz,), h_size, jnp.int32)
        for j in range(MAX_PROBES - 1, -1, -1):
            match_slot = jnp.where(match_j[j], slots[j], match_slot)
        cand = jnp.concatenate([
            jnp.where(unplaced & ~matched & (keys_at[j] == EMPTY_KEY),
                      slots[j], h_size)
            for j in range(MAX_PROBES)
        ])
        order = jnp.argsort(cand, stable=True)
        cand_sorted = cand[order]
        first = jnp.concatenate(
            [jnp.ones((1,), bool), cand_sorted[1:] != cand_sorted[:-1]]
        )
        win_flat = jnp.zeros((MAX_PROBES * nnz,), bool).at[order].set(
            first & (cand_sorted < h_size)
        )
        win_j = win_flat.reshape(MAX_PROBES, nnz)
        won_slot = jnp.full((nnz,), h_size, jnp.int32)
        taken = jnp.zeros((nnz,), bool)
        for j in range(MAX_PROBES):
            take = win_j[j] & ~taken
            won_slot = jnp.where(take, slots[j], won_slot)
            taken = taken | take
        placed = jnp.where(matched, match_slot, won_slot)
        return placed, won_slot

    # Round 1, then a second round for keys that lost every claim — after
    # the round-1 winners are scattered in, a fresh gather shows the true
    # emptiness (including slots won-but-unused in round 1), so most
    # conflict cascades resolve. Residual losers are dropped, matching the
    # reference's probe-exhausted approximate counting
    # (hashtbl_cuda_utils.cuh:102-133).
    keys = state.keys
    # Negative ids are invalid (UB in the reference's CUDA kernels); id
    # -1 would "match" empty slots (EMPTY_KEY) and park counts on
    # never-occupied slots that a later real claimant would inherit.
    # Drop them — same "dropped, not miscounted" semantic as direct
    # mode — which also makes -1 a safe CSR pad sentinel
    # (ops.indexing.pad_csr_to_fixed).
    unplaced = is_first & (idx >= 0)
    placed_slot = jnp.full((nnz,), h_size, jnp.int32)
    for _ in range(2):
        placed, won_slot = tournament(keys, unplaced)
        keys = keys.at[won_slot].set(idx, mode="drop")
        placed_slot = jnp.where(placed < h_size, placed, placed_slot)
        unplaced = unplaced & (placed == h_size)

    freq = state.freq.at[placed_slot].add(
        cnt * jnp.int32(scale), mode="drop")
    return state.replace(keys=keys, freq=freq)


def _update_cache_state_wide(state: CacheState, keyrows: jnp.ndarray,
                             scale: int = 1) -> CacheState:
    """Wide-key (int64 row id) insert-or-increment.

    Same deterministic tournament as the int32 hashed mode, keyed on the
    ``(hi, lo)`` column pair; winners scatter their FULL key row (split id
    + decomposed parts) so populate can decompress without 64-bit device
    math. ``keyrows``: int32 ``[nnz, 2 + ndim]`` from
    :func:`wide_cache_keys`.
    """
    h_size = state.hashtbl_size
    nnz, k = keyrows.shape
    cols = [keyrows[:, j] for j in range(k)]
    sorted_cols = jax.lax.sort(cols, num_keys=2, is_stable=True)
    hi, lo = sorted_cols[0], sorted_cols[1]
    rows_sorted = jnp.stack(sorted_cols, axis=1)
    is_first = jnp.concatenate(
        [jnp.ones((1,), bool), (hi[1:] != hi[:-1]) | (lo[1:] != lo[:-1])]
    )
    run_id = jnp.cumsum(is_first.astype(jnp.int32)) - 1
    run_counts = jax.ops.segment_sum(
        jnp.ones((nnz,), jnp.int32), run_id, num_segments=nnz
    )
    cnt = run_counts[run_id]

    h = hash_keys_wide(hi, lo, h_size)
    slots = [(h + j) % h_size for j in range(MAX_PROBES)]

    def tournament(keys_table, unplaced):
        keys_at = [keys_table[s] for s in slots]  # [nnz, k] each
        match_j = [
            unplaced & (ka[:, 0] == hi) & (ka[:, 1] == lo)
            for ka in keys_at
        ]
        matched = jnp.stack(match_j).any(axis=0)
        match_slot = jnp.full((nnz,), h_size, jnp.int32)
        for j in range(MAX_PROBES - 1, -1, -1):
            match_slot = jnp.where(match_j[j], slots[j], match_slot)
        cand = jnp.concatenate([
            jnp.where(
                unplaced & ~matched & (keys_at[j][:, 0] == EMPTY_KEY),
                slots[j], h_size)
            for j in range(MAX_PROBES)
        ])
        order = jnp.argsort(cand, stable=True)
        cand_sorted = cand[order]
        first = jnp.concatenate(
            [jnp.ones((1,), bool), cand_sorted[1:] != cand_sorted[:-1]]
        )
        win_flat = jnp.zeros((MAX_PROBES * nnz,), bool).at[order].set(
            first & (cand_sorted < h_size)
        )
        win_j = win_flat.reshape(MAX_PROBES, nnz)
        won_slot = jnp.full((nnz,), h_size, jnp.int32)
        taken = jnp.zeros((nnz,), bool)
        for j in range(MAX_PROBES):
            take = win_j[j] & ~taken
            won_slot = jnp.where(take, slots[j], won_slot)
            taken = taken | take
        placed = jnp.where(matched, match_slot, won_slot)
        return placed, won_slot

    keys = state.keys
    # Negative int64 ids (invalid; UB in the reference's CUDA kernels)
    # have hi < 0 — hi == -1 would read as EMPTY_KEY once inserted,
    # letting later keys overwrite the occupied slot and hiding it from
    # populate. Drop them here (never place), matching the direct mode's
    # "dropped, not miscounted" semantic; valid ids always have hi >= 0.
    unplaced = is_first & (hi >= 0)
    placed_slot = jnp.full((nnz,), h_size, jnp.int32)
    for _ in range(2):
        placed, won_slot = tournament(keys, unplaced)
        keys = keys.at[won_slot].set(rows_sorted, mode="drop")
        placed_slot = jnp.where(placed < h_size, placed, placed_slot)
        unplaced = unplaced & (placed == h_size)

    freq = state.freq.at[placed_slot].add(
        cnt * jnp.int32(scale), mode="drop")
    return state.replace(keys=keys, freq=freq)


def cache_lookup(state: CacheState, indices: jnp.ndarray) -> jnp.ndarray:
    """Per-lookup cache locations; -1 where the row is not cached.

    Vectorized analog of ``cache_lookup_kernel``
    (``tt_embeddings_cuda.cu:1356-1375``); probing stops at the first match
    (an empty slot simply never matches).

    Direct mode: one gather into the dense ``slots`` table. Wide mode:
    ``indices`` is a key-row array from :func:`wide_cache_keys` (only the
    first two ``(hi, lo)`` columns are probed).
    """
    if state.direct:
        idx = indices.astype(jnp.int32)
        loc = state.slots.at[idx].get(mode="fill", fill_value=-1)
        # mode="fill" only catches OUT-OF-RANGE indices after JAX's
        # negative-index wrapping, so -1 would probe slots[E-1] and
        # could return a real location — mask negatives (the CSR pad
        # sentinel and any invalid id) to an explicit miss.
        return jnp.where(idx >= 0, loc, -1)
    h_size = state.hashtbl_size
    if state.wide:
        hi, lo = indices[:, 0], indices[:, 1]
        h = hash_keys_wide(hi, lo, h_size)
        loc = jnp.full(hi.shape, -1, jnp.int32)
        found = jnp.zeros(hi.shape, bool)
        for probe in range(MAX_PROBES):
            slot = (h + probe) % h_size
            hit = (~found & (state.keys[slot, 0] == hi)
                   & (state.keys[slot, 1] == lo))
            loc = jnp.where(hit, state.slots[slot], loc)
            found = found | hit
        return loc
    idx = indices.astype(jnp.int32)
    h = hash_keys(idx, h_size)
    loc = jnp.full(idx.shape, -1, jnp.int32)
    found = jnp.zeros(idx.shape, bool)
    for probe in range(MAX_PROBES):
        slot = (h + probe) % h_size
        hit = ~found & (state.keys[slot] == idx)
        loc = jnp.where(hit, state.slots[slot], loc)
        found = found | hit
    return loc




# Default decompress-prefetch chunk; override per call via
# ``cache_populate(..., populate_chunk=)`` (SURVEY §5: the reference
# hardcodes its populate chunk at 200, tt_embeddings_cuda.cu:1326 — here
# it is a tunable).
DEFAULT_POPULATE_CHUNK = 8192
_POPULATE_CHUNK = DEFAULT_POPULATE_CHUNK  # backward-compat alias


def _decompress_rows(tt_cores, tt_p_shapes, tt_q_shapes, tt_ranks,
                     rows_idx, precision, chunk=None):
    """Chunked TT decompression of ``rows_idx`` -> ``[len, D]``.

    The reference prefetches cache rows in chunks of 200
    (``tt_embeddings_cuda.cu:1326``); one-shot decompression of a
    production-size cache (e.g. 1.1M rows at the benchmark config) would
    materialize a multi-GB gather intermediate and OOM HBM. ``lax.map``
    keeps the peak at one chunk.
    """
    from fbtt_embedding_tpu.ops.contraction import tt_rows  # avoid cycle

    if chunk is None:
        chunk = DEFAULT_POPULATE_CHUNK
    n = rows_idx.shape[0]
    # wide mode hands [n, ndim] per-core parts instead of flat row ids
    # (big-E rows cannot be flat int32); tt_rows takes them as idx_parts
    parts_mode = rows_idx.ndim == 2

    def compute(ri):
        if parts_mode:
            return tt_rows(
                tt_cores, tt_p_shapes, tt_q_shapes, tt_ranks, None,
                tableidx=None, precision=precision,
                idx_parts=[ri[:, t] for t in range(ri.shape[1])])
        return tt_rows(tt_cores, tt_p_shapes, tt_q_shapes, tt_ranks,
                       ri, tableidx=None, precision=precision)

    if n <= chunk:
        return compute(rows_idx)
    pad = (-n) % chunk
    pad_width = ((0, pad), (0, 0)) if parts_mode else (0, pad)
    padded = jnp.pad(rows_idx, pad_width)
    if parts_mode:
        chunks = padded.reshape(-1, chunk, rows_idx.shape[1])
    else:
        chunks = padded.reshape(-1, chunk)

    out = jax.lax.map(compute, chunks)
    d = out.shape[-1]
    return out.reshape(-1, d)[:n]


def populate_plan(
    state: CacheState,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Winner selection half of :func:`cache_populate` (no decompression).

    Returns ``(new_keys, new_freq, new_slots, winner_rows, valid)`` where
    ``winner_rows[s]`` is the row id (or ``[ndim]`` per-core parts, wide
    mode) to decompress into cache slot ``s`` and ``valid[s]`` marks slots
    that actually won (freq > 0). Deterministic, so a replicated caller
    derives the identical plan on every device — the basis of the
    row-owned sharded populate (``parallel/sharded.py``), where each
    owner decompresses only its ``slot % dp`` share.
    """
    c_size = state.cache_size
    if state.direct:
        n = state.freq.shape[0]
        # Exact top-k for small tables; TPU-optimized approximate top-k for
        # big ones (the reference's LFU is itself approximate, and populate
        # is a rare, user-triggered event).
        if n > (1 << 21):
            top_freq, top_rows = jax.lax.approx_max_k(
                state.freq.astype(jnp.float32), c_size, recall_target=0.95
            )
            top_freq = top_freq.astype(jnp.int32)
        else:
            top_freq, top_rows = jax.lax.top_k(state.freq, c_size)
        valid = top_freq > 0
        scatter_rows = jnp.where(valid, top_rows.astype(jnp.int32), n)
        new_slots = (
            jnp.full((n,), -1, jnp.int32)
            .at[scatter_rows]
            .set(jnp.arange(c_size, dtype=jnp.int32), mode="drop")
        )
        winner = jnp.zeros((n,), bool).at[scatter_rows].set(True, mode="drop")
        new_freq = jnp.where(winner, state.freq, jnp.int32(0))
        winner_rows = jnp.where(valid, top_rows.astype(jnp.int32), 0)
        return state.keys, new_freq, new_slots, winner_rows, valid

    h_size = state.hashtbl_size
    occupied = (state.keys[:, 0] != EMPTY_KEY) if state.wide else (
        state.keys != EMPTY_KEY)
    masked_freq = jnp.where(occupied, state.freq, jnp.int32(-1))
    top_freq, top_slots = jax.lax.top_k(masked_freq, c_size)
    valid = top_freq > 0

    new_slots = jnp.full((h_size,), -1, jnp.int32)
    ranks_ = jnp.arange(c_size, dtype=jnp.int32)
    scatter_slots = jnp.where(valid, top_slots, h_size)
    new_slots = new_slots.at[scatter_slots].set(ranks_, mode="drop")

    winner = jnp.zeros((h_size,), bool).at[scatter_slots].set(True, mode="drop")
    if state.wide:
        new_keys = jnp.where(winner[:, None], state.keys,
                             jnp.int32(EMPTY_KEY))
        # decompress winners from their stored per-core parts (no 64-bit
        # device math needed)
        winner_rows = jnp.where(
            valid[:, None], state.keys[top_slots][:, 2:], 0)
    else:
        new_keys = jnp.where(winner, state.keys, jnp.int32(EMPTY_KEY))
        winner_rows = jnp.where(valid, state.keys[top_slots], 0)
    new_freq = jnp.where(winner, state.freq, jnp.int32(0))
    return new_keys, new_freq, new_slots, winner_rows, valid


def cache_populate(
    state: CacheState,
    tt_cores: Sequence[jnp.ndarray],
    tt_p_shapes: Sequence[int],
    tt_q_shapes: Sequence[int],
    tt_ranks: Sequence[int],
    precision=None,
    populate_chunk: Optional[int] = None,
) -> CacheState:
    """Keep the top-``cache_size`` rows by frequency; evict the rest;
    decompress the winners into ``weight``.

    Analog of ``cache_populate_cuda`` (``tt_embeddings_cuda.cu:1260-1336``):
    radix-sort-descending + ``mark_popular_colidx_kernel`` + GEMM-chain
    prefetch become ``lax.top_k`` + masked scatters + one batched TT
    reconstruction. Losers are fully evicted (key/freq reset), matching the
    reference's restart-counting behavior. Optimizer state of surviving rows
    is reset (the reference keeps stale state; resetting is the conservative
    deterministic choice).
    """
    new_keys, new_freq, new_slots, winner_rows, valid = populate_plan(state)
    rows = _decompress_rows(
        tt_cores, tt_p_shapes, tt_q_shapes, tt_ranks,
        winner_rows, precision, chunk=populate_chunk,
    )
    return CacheState(
        keys=new_keys, freq=new_freq, slots=new_slots,
        weight=jnp.where(valid[:, None], rows, 0.0),
        opt_state=jnp.zeros_like(state.opt_state),
    )


def preprocess_indices(
    indices: jnp.ndarray,
    offsets: jnp.ndarray,
    num_tables: int,
    batch_size: int,
    warmup: bool,
    cache_state: Optional[CacheState],
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(indices, offsets) -> (indices, rowidx, tableidx, cache_locations).

    API analog of ``preprocess_indices_sync`` (``tt_embeddings.cpp:138``)
    minus the sync and the partitioning: lookups keep their order and
    ``cache_locations[i] == -1`` marks the TT path. During warmup or without
    a cache everything takes the TT path (``tt_embeddings_cuda.cu:
    1410-1412``).
    """
    from fbtt_embedding_tpu.ops.indexing import rowidx_from_offsets

    nnz = indices.shape[0]
    rowidx, tableidx = rowidx_from_offsets(offsets, nnz, num_tables, batch_size)
    if warmup or cache_state is None or num_tables != 1:
        locations = jnp.full((nnz,), -1, jnp.int32)
    else:
        locations = cache_lookup(cache_state, indices)
    return indices, rowidx, tableidx, locations


def cache_forward(
    state: CacheState,
    locations: jnp.ndarray,
    rowidx: jnp.ndarray,
    batch_size: int,
    output: jnp.ndarray,
) -> jnp.ndarray:
    """Accumulate cached rows into pooled output ``[1, B, D]``.

    Analog of ``cache_forward_kernel`` (``tt_embeddings_cuda.cu:1498-1572``).
    """
    cached = locations >= 0
    rows = state.weight[jnp.clip(locations, 0)]
    rows = jnp.where(cached[:, None], rows, 0.0)
    pooled = jax.ops.segment_sum(rows, rowidx, num_segments=batch_size)
    return output + pooled[None]


def cache_row_grads(
    d_output: jnp.ndarray,
    locations: jnp.ndarray,
    rowidx: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-lookup output cotangents for the cached partition.

    Returns (d_rows ``[nnz, D]`` masked to cached lookups, cached mask).
    ``d_output`` is ``[1, B, D]`` (cache requires num_tables == 1).
    ``weights``: optional per-sample weights; the cotangent of a weighted
    lookup is ``w * d_out[row]``.
    """
    cached = locations >= 0
    d_rows = d_output[0][rowidx]
    if weights is not None:
        d_rows = d_rows * weights[:, None].astype(d_rows.dtype)
    return jnp.where(cached[:, None], d_rows, 0.0), cached


def cache_backward_dense(
    state: CacheState,
    d_output: jnp.ndarray,
    locations: jnp.ndarray,
    rowidx: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Dense grad wrt ``weight`` (``cache_backward_dense_cuda``,
    ``tt_embeddings_cuda.cu:1659-1733``)."""
    d_rows, cached = cache_row_grads(d_output, locations, rowidx, weights)
    loc = jnp.where(cached, locations, state.cache_size)
    return (
        jnp.zeros_like(state.weight).at[loc].add(d_rows, mode="drop")
    )


def cache_backward_sgd(
    state: CacheState,
    d_output: jnp.ndarray,
    locations: jnp.ndarray,
    rowidx: jnp.ndarray,
    learning_rate,
    weights: Optional[jnp.ndarray] = None,
) -> CacheState:
    """Fused SGD on cached rows (``cache_backward_sgd_cuda``,
    ``tt_embeddings_cuda.cu:1574-1657``), deterministic scatter-add.

    Updates only the touched rows in place (a dense ``[C, D]`` gradient
    would cost ~1 GB of HBM traffic per step at production cache sizes).
    """
    d_rows, cached = cache_row_grads(d_output, locations, rowidx, weights)
    loc = jnp.where(cached, locations, state.cache_size)
    lr = jnp.asarray(learning_rate, jnp.float32)
    # The XLA scatter-add here was the cached TRAINING step's dominant
    # cost on TPU (~75 ns/row at the benchmark shape): updating hot rows
    # of an HBM-resident [C, D] table is a serialized random row
    # read-modify-write — the memory behavior an uncompressed table
    # pays. hot_scatter_add exploits the LFU-rank concentration of
    # cache locations (window + compacted stragglers, see
    # ops/hot_scatter.py for the measurement story);
    # FBTT_HOT_SCATTER=0 forces the plain scatter for A/B.
    if _use_hot_scatter():
        from fbtt_embedding_tpu.ops.hot_scatter import hot_scatter_add

        return state.replace(
            weight=hot_scatter_add(state.weight, loc, -lr * d_rows))
    return state.replace(
        weight=state.weight.at[loc].add(-lr * d_rows, mode="drop")
    )


def _use_hot_scatter() -> bool:
    from fbtt_embedding_tpu.utils import knobs

    return knobs.get_str("FBTT_HOT_SCATTER", "auto") != "0"


def cache_backward_adagrad(
    state: CacheState,
    d_output: jnp.ndarray,
    locations: jnp.ndarray,
    rowidx: jnp.ndarray,
    learning_rate,
    eps,
    weights: Optional[jnp.ndarray] = None,
) -> CacheState:
    """EXACT full-element Adagrad on cached rows.

    The reference allocates a full ``[cache_size, D]`` optimizer state for
    ``OptimType.EXACT_ADAGRAD`` (``tt_embeddings_ops.py:576-585``) but then
    routes it into the *row-wise* kernel
    (``cache_backward_rowwise_adagrad_approx_cuda``,
    ``tt_embeddings_cuda.cu:1735-1835``), which indexes it as a scalar-per-
    row buffer — the intent (a per-element exact Adagrad, matching the TT
    cores' full-element update) is clear from the allocation; this
    implements that intent. Semantics mirror ``adagrad_step`` on the TT
    cores: the row's aggregate gradient G (duplicate lookups pre-summed,
    deterministic) drives ``s += G^2; w -= lr * G / (sqrt(s) + eps)``.

    Requires ``state.opt_state.shape == state.weight.shape``; raises
    otherwise instead of silently broadcasting (the crash class this
    replaces).
    """
    if state.opt_state.shape != state.weight.shape:
        raise ValueError(
            "cache_backward_adagrad needs full [cache_size, D] optimizer "
            f"state, got {state.opt_state.shape} vs weight "
            f"{state.weight.shape}; use "
            "cache_backward_rowwise_adagrad_approx for row-wise state"
        )
    d_rows, cached = cache_row_grads(d_output, locations, rowidx, weights)
    loc = jnp.where(cached, locations, state.cache_size)
    g = jnp.zeros_like(state.weight).at[loc].add(d_rows, mode="drop")
    new_opt = state.opt_state + g * g
    lr = jnp.asarray(learning_rate, jnp.float32)
    upd = lr * g / (jnp.sqrt(new_opt) + jnp.asarray(eps, jnp.float32))
    return state.replace(weight=state.weight - upd, opt_state=new_opt)


def cache_backward_rowwise_adagrad_approx(
    state: CacheState,
    d_output: jnp.ndarray,
    locations: jnp.ndarray,
    rowidx: jnp.ndarray,
    learning_rate,
    eps,
    weights: Optional[jnp.ndarray] = None,
) -> CacheState:
    """Row-wise approximate Adagrad on cached rows.

    Deterministic variant of ``cache_backward_rowwise_adagrad_approx_cuda``
    (``tt_embeddings_cuda.cu:1735-1835``): the reference accumulates each
    lookup's mean(g^2) into the row's scalar state with atomics and applies
    per-lookup updates against the racing running state; here all lookups
    hitting a row are aggregated first, then a single update uses the final
    state — the same "approx" semantics, made order-independent.

    Requires row-wise ``[cache_size]`` optimizer state; raises on a full
    ``[cache_size, D]`` state instead of broadcasting garbage (route
    EXACT_ADAGRAD to :func:`cache_backward_adagrad`).
    """
    if state.opt_state.shape != (state.cache_size,):
        raise ValueError(
            "cache_backward_rowwise_adagrad_approx needs row-wise "
            f"[cache_size] optimizer state, got {state.opt_state.shape}; "
            "use cache_backward_adagrad for full [cache_size, D] state"
        )
    d_rows, cached = cache_row_grads(d_output, locations, rowidx, weights)
    loc = jnp.where(cached, locations, state.cache_size)
    d = d_rows.shape[-1]
    gsq_mean = jnp.sum(d_rows * d_rows, axis=-1) / d
    new_opt = state.opt_state.at[loc].add(gsq_mean, mode="drop")
    lr = jnp.asarray(learning_rate, jnp.float32)
    scale = lr / (jnp.sqrt(new_opt) + jnp.asarray(eps, jnp.float32))
    # per-lookup update with the FINAL aggregated state (linear in the
    # row's gradient sum, so scatter-adding per lookup is equivalent to
    # the aggregate-then-update form) — touched rows only, no dense [C, D]
    # gradient intermediate.
    per_lookup_scale = scale.at[jnp.clip(loc, 0, state.cache_size - 1)].get(
        mode="fill", fill_value=0.0
    ) * cached.astype(jnp.float32)
    w_upd = -per_lookup_scale[:, None] * d_rows
    if _use_hot_scatter():
        from fbtt_embedding_tpu.ops.hot_scatter import hot_scatter_add

        new_w = hot_scatter_add(state.weight, loc, w_upd)
    else:
        new_w = state.weight.at[loc].add(w_upd, mode="drop")
    return state.replace(weight=new_w, opt_state=new_opt)


def reset_cache(state: CacheState) -> CacheState:
    """Clear counting state (fixes the reference's ``use_cahce`` typo bug,
    ``tt_embeddings_ops.py:794-798``, which made reset unreachable)."""
    return state.replace(
        keys=jnp.full_like(state.keys, EMPTY_KEY),
        freq=jnp.zeros_like(state.freq),
        slots=jnp.full_like(state.slots, -1),
    )
