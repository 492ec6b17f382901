"""Flat sorted-run TT lookup pipeline (tt_ndim 2-4) — the fast train path.

Replaces per-lookup work entirely. The generic kernels
(:mod:`.tt_kernel`) pay ~5 ns of dynamic-access latency per per-lookup
VMEM operation — at the reference benchmark shape
(``/root/reference/README.md:18-20``) that is ~7 ops x 10240 lookups per
direction and dominates the step. Here every stage is either a wide XLA
gather, a one-hot MXU GEMM, or a *segment-grid run kernel* over
lookup-major arrays; nothing touches memory one lookup at a time.

Pipeline, shown for tt_ndim == 3 (2 and 4 generalize: one sort + one
segment-grid pass per middle/last core, block-diagonal-expanded over the
accumulated middle digits — see ``_bd_widths``). D-order ``(a0, a1, a2)``;
rows are lookups, lanes carry the ``q0`` digit as ``blocks`` of width
``w``:

  sort lookups by i1 and (separately) by i2      stable multi-op sorts
  span tables = searchsorted(keys, arange(P))    core row j <-> row span
  z0L   = G0f[idx_s1]                            XLA gather [nnz, q0*r1]
  Z1L   = SegTransform_i1(z0L, G1)               [nnz, q0*q1*r2]
  Z1L2  = Z1L[perm12]                            XLA gather (s1 -> s2)
  rows  = SegTransform_i2(Z1L2, G2bd)            [nnz, D]; G2bd is the
                                                 block-diagonal last core,
                                                 built by one eye-broadcast
  out   = onehot(rowidx_s2) @ rows               one-hot pooling GEMM

Pair-product fusion (``_pair_gate``, default at nnz >= 16k): since
``Z1[row] = G0[i0] @ G1[i1]`` depends only on the (i0, i1) pair, a
per-step ``[T*p0*p1 + 1, q0*q1*r2]`` pair table replaces the z0 gather,
the first-pass kernel, AND the s1->s2 permute — the forward becomes

  G01   = einsum(G0, G1) + zero row              ~15 us MXU + one stream
  Z1L2  = G01[pairid_s2]                         one gather, directly s2

(a gather composes with any permutation for free). The backward is
unchanged — z0 is recomputed by the free ``G0f[i0_s1]`` gather.

  backward:
  drsL  = dout[rowidx_s2] * w                    XLA gather [nnz, D]
  dZ1L2, dG2bd = SegAccum_i2(Z1L2, drsL, G2bd)   one kernel: NT-transform
                                                 + per-run accumulation
  dZ1L  = dZ1L2[perm21]                          XLA gather (s2 -> s1)
  dz0L, dG1 = SegAccum_i1(z0L, dZ1L, G1)         one kernel
  dG0   = onehot(i0_s1)^T @ dz0L                 exact-fp32 one-hot GEMM
  dG2   = sum of diagonal blocks of dG2bd

Kernel structure: the grid runs over fixed SEG-lookup segments with
*blocked* in/out specs, so Pallas streams the big flat arrays through
VMEM with automatically pipelined (double-buffered) DMA — works at any
nnz (full-array VMEM residency OOMs past ~16k lookups) and every memory
op is tile-aligned by construction. Sortedness bounds the work: a
segment intersects ``1 + runs_in_segment`` spans (~2-4 on average), each
applied to the whole segment with an iota-range mask; masking traffic is
VMEM-only. Core-gradient accumulation lands in a VMEM-resident
``[P, ., .]`` accumulator indexed by span (exact fp32; grid steps are
sequential so read-modify-write is race-free). Total slab reads are
O(p_t); total row traffic is O(nnz) streamed at HBM bandwidth.

Numerics: fp32 master cores; intermediates staged in a configurable
``compute_dtype`` (bf16 by default on TPU — the MXU multiplies in bf16
at DEFAULT precision anyway, so bf16 staging halves HBM traffic at zero
additional rounding of the dot inputs); accumulations (pooling, core
grads, dG0) in fp32; dG0 reduction at HIGHEST (exact fp32). Interpreter
mode (CPU tests) uses fp32 staging and is exact.

Cache-served lookups (live-first packed by the caller, ``live_count``)
and padding get a sentinel sort key: they cluster into the final span,
which the kernels skip (their outputs stay zero) — the reference's
cub-partition compute saving (``tt_embeddings_cuda.cu:1436-1488``) with
static shapes.

Reference anchors replaced: the whole CUDA hot path —
``tt_embeddings_cuda.cu:964-1075`` (forward chain), ``:920-962``
(pooling), ``:419-652`` (backward recompute + grad GEMMs + atomicAdd).

Device-trace-driven notes (v5e):
  * permutation maps come from sorts, not scatters: an [nnz] scatter
    costs ~62 us where an extra sort operand is ~6 us; the inverse of a
    permutation is computed by sorting it with iota carried.
  * the block-diagonal last core is ONE eye-broadcast fusion; building
    it with ``.at[].set`` cost 3 dynamic-update-slices x 107 us.
  * host transposes of cores cost ~200 us/step; all "transposed" operand
    uses are NT dimension numbers inside the kernels.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fbtt_embedding_tpu.utils import knobs as _knobs

SEG = _knobs.get_int("FBTT_SEG") or 256  # lookups per grid segment


def _seg_for(nnz: int) -> int:
    """Segment size for a given nnz. Larger segments amortize the
    per-program envelope (~0.5 us of fixed latency on top of the block
    DMA) over more lookups; the trip count per segment grows with
    seg * spans / nnz, so small batches keep small segments. FBTT_SEG
    pins a value for A/B runs."""
    env = _knobs.get_int("FBTT_SEG")
    if env:
        return env
    # Large batches keep big segments: interleaved A/B at B=8192
    # (nnz=164k) measured seg 512 at 6.618 ms vs seg 256 at 6.686 (and
    # round-3: 9.74/9.44/9.55 at 256/512/1024 pre-pair).
    if nnz >= 65536:
        return 512
    # Small/medium batches: the masked span work costs ~spans x seg x bw
    # VPU traffic per pass regardless of span length, so the span term
    # scales with p_rows * seg — smaller segments cut it. Round-5
    # interleaved within-epoch A/Bs: B=512 counting-off 0.712-0.714 ms
    # at seg 256/sb8 vs 0.576 at seg 128/sb4 (seg 64 0.663, seg 32
    # worse); B=2048 (nnz=41k) 2.213 at seg 512 vs 2.161 at 256 vs
    # 2.119 at 128. The 128-vs-512 crossover is bracketed in
    # (41k, 164k) nnz; the boundary sits at 64k.
    return 128


def _sb_for(nza: int, n_spans: int, seg: int) -> int:
    """Trip width (spans per kernel loop iteration) for one pass.

    The masked lane-concat costs ``sb x`` the segment stream in VPU
    traffic per trip, so blocking only pays when a segment actually
    intersects multiple spans: at B=512 a 256-row segment sees ~6 spans
    and sb=4 amortizes per-trip latency ~4x, while at B=8192 a 512-row
    segment sees <1 span and sb=4 is pure masking waste (measured 9.44
    -> 8.63 ms at sb=2; sb=1 doubles trips there and loses, 9.05; at
    B=32768 with ~0.2 spans/segment sb=1 wins, 33.8 vs 34.8 ms). Always
    <= SPAN_BLOCK — the table/accumulator padding and the span-table
    tail are sized for SPAN_BLOCK. ``FBTT_TRIP_SB`` pins a value for
    A/B."""
    env = _knobs.get_int("FBTT_TRIP_SB")
    if env:
        return max(1, min(SPAN_BLOCK, env))
    spans_per_seg = n_spans * seg / max(nza, 1)
    if spans_per_seg >= 2.0:
        # the masked-concat VPU work per pass is ~trips x sb x seg x bw
        # independent of sb (trips x sb ~ spans/seg), so wider trips only
        # amortize loop latency; round-5 within-epoch A/B at B=512 had
        # sb=4 beat sb=8 (0.576 vs 0.71 with the seg-128 default, and
        # 0.598 even at SPAN_BLOCK=8) — the old sb=8 dense-span branch
        # is retired
        return min(SPAN_BLOCK, 4)
    return min(SPAN_BLOCK, 2 if spans_per_seg >= 0.35 else 1)


def _spp_for(nseg: int, seg: int) -> int:
    """Segments per kernel PROGRAM (grid batching).

    Each grid step pays a fixed envelope (prologue, scalar reads,
    pipeline latency) on top of its block DMA; at small batch the three
    passes run ~240 programs and that envelope is the dominant kernel
    cost. Processing ``spp`` consecutive segments inside one program
    divides the program count by ``spp`` WITHOUT growing the span-mask
    work (each sub-segment keeps its own seg-row masks — unlike raising
    ``seg``, which scales the masked span work by p_rows x seg).
    ``FBTT_SPP`` pins a value for A/B. Default 1: measured NEUTRAL on
    v5e at B=512 counting-off (interleaved within-epoch, 8 rounds:
    0.578 / 0.578 / 0.580 / 0.585 ms at spp 1/2/4/8) — Mosaic's grid
    pipeline already overlaps the per-program envelope across steps, so
    batching programs buys nothing; kept as the A/B record that rules
    out program-count overhead as the B=512 kernel floor.
    """
    env = _knobs.get_int("FBTT_SPP")
    if env:
        return env if nseg % env == 0 else 1
    return 1


# cap on spans per kernel loop iteration (import-time A/B override);
# also the table/accumulator padding and span-table tail size —
# _sb_for's per-pass trip width never exceeds it. Default 4 per the
# round-5 B=512 A/B (SPAN_BLOCK 4 vs 8 at seg=128/sb=4: 0.576 vs
# 0.598 ms); no in-policy cell uses sb > 4 anymore.
SPAN_BLOCK = _knobs.get_int("FBTT_SPAN_BLOCK") or 4

# First-pass pair-product fusion: cap on the per-step [T*p0*p1 + 1,
# q0*q1*r2] pair table (HBM transient, rebuilt each step from the
# master cores)
_PAIR_TABLE_BYTES = 96 * 1024 * 1024


def pair_structural_ok(num_tables: int, p, q, r, itemsize: int) -> bool:
    """Whether a G0xG1 pair-product table is structurally buildable:
    tt_ndim >= 3, pair ids fit int32, table under ``_PAIR_TABLE_BYTES``.
    Shared by the per-step training gate (:func:`_pair_gate`, which adds
    an nnz amortization threshold) and the serving fold (which has no
    per-step build cost and uses the structural gate alone)."""
    if len(p) < 3:
        return False
    r = list(r)
    if len(r) == len(p) - 1:
        r = [1] + r + [1]
    rows = num_tables * p[0] * p[1]
    width = q[0] * q[1] * r[2]
    return rows + 1 < 2 ** 31 and (rows + 1) * width * itemsize <= \
        _PAIR_TABLE_BYTES


def _pair_gate(nza: int, num_tables: int, p, q, r, itemsize: int) -> bool:
    """Whether to fuse cores 0 and 1 into a per-step pair-product table.

    ``Z1[row] = G0[i0] @ G1[i1]`` depends only on the pair ``(i0, i1)``
    — T*p0*p1 distinct values (44k at the reference headline shape, a
    45 MB bf16 table) vs nnz rows. Precomputing the table (one ~15 us
    MXU einsum + one HBM stream per step) lets the forward gather
    ``Z1`` DIRECTLY in the second sort space — a gather composes with
    any permutation for free — eliminating the first-pass kernel, the
    z0 gather, and one of the two [nnz, q0*q1*r2] sort-order permutes
    (the measured wall at large batch; see docs/PERF.md). The backward
    is unchanged (its permute and the i1 accumulation stay).

    Auto gate: table under ``_PAIR_TABLE_BYTES`` and nza large enough
    that the per-step build amortizes — measured on v5e at the headline
    shape: nnz=10240 regresses 0.99 -> 1.08 ms (the 45 MB table build
    dominates), nnz=40960 wins 2.51 -> 2.20 ms, nnz=163840 wins
    8.51 -> 6.41 ms, so the crossover sits between 10k and 40k lookups.
    ``FBTT_PAIR={0,1}`` overrides the heuristic for A/B runs but never
    the structural gates (ndim >= 3, int32 pair ids, table budget)."""
    if not pair_structural_ok(num_tables, p, q, r, itemsize):
        return False
    env = _knobs.get_str("FBTT_PAIR")
    if env in ("0", "1"):
        return env == "1"
    return nza >= 16384
MAX_SPAN_ROWS = 4096  # cap on distinct core rows (span/accum table size)
_ONEHOT_PRECISION = jax.lax.Precision.HIGHEST


def _cdiv(a, b):
    return -(-a // b)


def _bd_widths(tt_q_shapes, ranks):
    """Per-core (mm, bw_in, bw_out): the lookup-major state before core t
    has q0 lane-blocks of width mm_t * r_t, where mm_t = q1*..*q_{t-1} is
    the accumulated middle digits; core t applies as a block-diagonal
    expansion BD_{mm_t}(G_t) of shape [mm_t*r_t, mm_t*q_t*r_{t+1}]."""
    ndim = len(tt_q_shapes)
    out = []
    mm = 1
    for t in range(1, ndim):
        bw_in = mm * ranks[t]
        bw_out = mm * tt_q_shapes[t] * ranks[t + 1]
        out.append((mm, bw_in, bw_out))
        mm *= tt_q_shapes[t]
    return out


# Per-pass VMEM budget for the worst-case resident set of _seg_accum_call:
# the fp32 gradient accumulator [T*p_t, bw_in, bw_out] plus the expanded
# core table in fp32 (HIGHEST-precision staging) — 8 bytes per table
# element together. Must fit under the kernels' 100MB vmem_limit_bytes
# with headroom for the double-buffered SEG-row block specs.
_PASS_VMEM_BUDGET = 64 * 1024 * 1024


def flat_available(
    tt_p_shapes: Sequence[int],
    tt_q_shapes: Sequence[int],
    tt_ranks: Sequence[int],
    num_tables: int,
    batch_size: int,
) -> bool:
    """Gates for the flat pipeline (tt_ndim 2-4): multiple-of-8 tiling
    gates on every staged lane-block width, the span-table cap, and a
    per-pass VMEM budget covering the backward's fp32 accumulator plus
    the expanded core table (each pass's worst case, not a summed
    estimate — the passes run as separate kernels)."""
    ndim = len(tt_p_shapes)
    if ndim not in (2, 3, 4):
        return False
    q = list(tt_q_shapes)
    r = list(tt_ranks)
    if len(r) == ndim - 1:
        r = [1] + r + [1]
    if (q[0] * r[1]) % 8 != 0:
        return False
    for t, (mm, bw_in, bw_out) in enumerate(_bd_widths(q, r), start=1):
        if bw_in % 8 != 0 or bw_out % 8 != 0:
            return False
        if num_tables * tt_p_shapes[t] * bw_in * bw_out * 8 > \
                _PASS_VMEM_BUDGET:
            return False
        if num_tables * tt_p_shapes[t] + 1 > MAX_SPAN_ROWS:
            return False
    if (num_tables * batch_size) % 8 != 0:
        return False
    return True


# --------------------------------------------------------------- kernels


def _trip_mode() -> str:
    """Per-trip compute strategy for the span-blocked kernels.

    ``concat``: lane-concatenate the ``sb`` masked states and run ONE
    wide MXU dot per block per trip. ``dots``: run ``sb`` small
    static-sliced dots per block and mask/accumulate the narrow results
    — skips the concat's VMEM materialization (~1 MB/trip at the
    headline shape) at the cost of more MXU issues. Both are exact; the
    faster one on the target generation is an A/B question
    (``FBTT_TRIP`` overrides).
    """
    return _knobs.get_str("FBTT_TRIP", "concat")


def _span_masks(runs_ref, rows, j0, p_rows, sb):
    """Row masks for the ``sb`` consecutive spans starting at ``j0``.

    Spans past the real table (the sentinel span and the padded tail)
    get an empty mask — sentinel spans fold into the row mask instead of
    a branch (``lax.cond`` inside the loop measured slower), and the
    table/accumulator carry ``sb`` rows of zero padding so the slab
    slice below never reads out of bounds.
    """
    masks = []
    for s in range(sb):
        js = j0 + s
        real = js < p_rows
        st = runs_ref[js]
        en = runs_ref[js + 1]
        masks.append((rows >= st) & (rows < en) & real)
    return masks


@functools.lru_cache(maxsize=None)
def _seg_transform_call(nseg, blocks, bw_in, bw_out, p_rows, dt, out_dt,
                        interpret, sb=SPAN_BLOCK, trip="concat", seg=SEG):
    """Segment-grid transform: for each SEG-lookup segment, apply every
    intersecting core row's slab to its row range:
    ``y_b[rows of j] = x_b[rows of j] @ table[j]``.

    Span-blocked: each loop iteration handles ``sb`` consecutive spans
    with ONE contiguous slab slice and ONE MXU dot over the
    lane-concatenated masked states — per-iteration latency (dynamic
    slab read, small-dot pipeline fill, loop control) dominated the
    per-span variant, so amortizing it over ``sb`` spans cuts the pass
    time nearly proportionally. The masked concatenation keeps the math
    exact: a lookup row belongs to exactly one span, every other span's
    contribution is an exact fp32 zero.

    ``t_ref`` is the 2-D stacked table ``[(p_rows + sb) * bw_in, bw_out]``
    (``sb`` rows of zero padding) from :func:`_stacked_table`.
    """
    in_w = blocks * bw_in
    out_w = blocks * bw_out
    dt = jnp.dtype(dt)
    out_dt = jnp.dtype(out_dt)
    spp = _spp_for(nseg, seg)

    def kernel(runs_ref, first_ref, cnt_ref, x_ref, t_ref, y_ref):
        # spp sub-segments per grid step (program-count batching): each
        # keeps its own seg-row span masks — the envelope amortizes, the
        # masked span work does not grow
        for h in range(spp):
            si = pl.program_id(0) * spp + h
            base = si * seg
            # [seg, 1] row ids — the span mask broadcasts across lanes
            # instead of materializing [seg, bw] compares per iteration
            rows = base + jax.lax.broadcasted_iota(
                jnp.int32, (seg, 1), 0)
            r0 = h * seg
            xbs = [x_ref[r0:r0 + seg, b * bw_in:(b + 1) * bw_in]
                   for b in range(blocks)]
            zero = jnp.zeros((seg, bw_in), dt)

            zero_out = jnp.zeros((seg, bw_out), out_dt)

            def run_body(k, outs, rows=rows, xbs=xbs, zero=zero,
                         zero_out=zero_out, si=si):
                j0 = first_ref[si] + k * sb
                stacked = t_ref[pl.ds(j0 * bw_in, sb * bw_in), :]
                masks = _span_masks(runs_ref, rows, j0, p_rows, sb)
                new_outs = []
                for b in range(blocks):
                    if trip == "dots":
                        ob = outs[b]
                        for s in range(sb):
                            yb = jnp.dot(
                                xbs[b],
                                stacked[s * bw_in:(s + 1) * bw_in, :],
                                preferred_element_type=jnp.float32)
                            ob = ob + jnp.where(
                                masks[s], yb.astype(out_dt), zero_out)
                        new_outs.append(ob)
                        continue
                    xcat = jnp.concatenate(
                        [jnp.where(masks[s], xbs[b], zero)
                         for s in range(sb)],
                        axis=1)
                    yb = jnp.dot(xcat, stacked,
                                 preferred_element_type=jnp.float32)
                    new_outs.append(outs[b] + yb.astype(out_dt))
                return tuple(new_outs)

            outs0 = tuple(
                jnp.zeros((seg, bw_out), out_dt) for _ in range(blocks))
            trips = (cnt_ref[si] + (sb - 1)) // sb
            outs = jax.lax.fori_loop(0, trips, run_body, outs0)
            for b in range(blocks):
                y_ref[r0:r0 + seg, b * bw_out:(b + 1) * bw_out] = outs[b]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nseg // spp,),
        in_specs=[
            pl.BlockSpec((spp * seg, in_w), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((spp * seg, out_w), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nseg * seg, out_w), out_dt),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


@functools.lru_cache(maxsize=None)
def _seg_accum_call(nseg, blocks, bw_x, bw_y, p_rows, dt, z_dt, interpret,
                    acc_t=False, sb=SPAN_BLOCK, trip="concat", seg=SEG):
    """Segment-grid accumulate + NT-transform: for each segment and each
    intersecting core row j,

      acc[j] += sum over blocks b of x_b[rows of j]^T @ y_b[rows of j]
      z_b[rows of j] = y_b[rows of j] @ table[j]^T   (NT dims)

    acc is a VMEM-resident fp32 accumulator shared by all grid steps
    (sequential on TPU, so the read-modify-write is race-free). Layout
    is 2-D stacked, ``[(p_rows + sb) * rps, lanes]`` with per-span tile
    ``[rps, lanes]`` — ``sb`` consecutive spans accumulate with ONE
    contiguous dynamic-slice read-modify-write.

    Span-blocked like :func:`_seg_transform_call`: each loop iteration
    covers ``sb`` spans with one slab slice and one dot per product —
    the masked lane-concatenation makes every out-of-span contribution
    an exact zero, so the results are bit-identical to the per-span
    loop while amortizing the per-iteration latency.

    ``acc_t``: accumulate TRANSPOSED per-span tiles ``[bw_y, bw_x]``
    (``y^T @ x``) — when ``bw_y < 128`` the natural ``[bw_x, bw_y]``
    tile leaves most of the 128 vector lanes empty and the dynamic
    read-modify-write runs on partial tiles; the caller transposes the
    small result back once outside the kernel.
    """
    x_w = blocks * bw_x
    y_w = blocks * bw_y
    dt = jnp.dtype(dt)
    z_dt = jnp.dtype(z_dt)
    rps, lanes = (bw_y, bw_x) if acc_t else (bw_x, bw_y)
    acc_shape = ((p_rows + sb) * rps, lanes)
    spp = _spp_for(nseg, seg)

    def kernel(runs_ref, first_ref, cnt_ref, x_ref, y_ref, t_ref,
               acc_ref, z_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        for h in range(spp):
            si = pl.program_id(0) * spp + h
            base = si * seg
            r0 = h * seg
            rows = base + jax.lax.broadcasted_iota(
                jnp.int32, (seg, 1), 0)
            xbs = [x_ref[r0:r0 + seg, b * bw_x:(b + 1) * bw_x]
                   for b in range(blocks)]
            ybs = [y_ref[r0:r0 + seg, b * bw_y:(b + 1) * bw_y]
                   for b in range(blocks)]
            zero_x = jnp.zeros((seg, bw_x), dt)
            zero_y = jnp.zeros((seg, bw_y), dt)
            zero_zx = jnp.zeros((seg, bw_x), jnp.float32)
            _run_subseg(si, r0, rows, xbs, ybs, zero_x, zero_y, zero_zx,
                        runs_ref, first_ref, cnt_ref, t_ref, acc_ref,
                        z_ref)

    def _run_subseg(si, r0, rows, xbs, ybs, zero_x, zero_y, zero_zx,
                    runs_ref, first_ref, cnt_ref, t_ref, acc_ref, z_ref):
        def run_body(k, zs):
            j0 = first_ref[si] + k * sb
            stacked = t_ref[pl.ds(j0 * bw_x, sb * bw_x), :]
            masks = _span_masks(runs_ref, rows, j0, p_rows, sb)
            new_zs = []
            if trip == "dots":
                a_parts = [jnp.zeros((rps, lanes), jnp.float32)
                           for _ in range(sb)]
                for b in range(blocks):
                    zb = zs[b]
                    for s in range(sb):
                        slab_s = stacked[s * bw_x:(s + 1) * bw_x, :]
                        zc = jax.lax.dot_general(
                            ybs[b], slab_s, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        zb = zb + jnp.where(masks[s], zc,
                                            zero_zx).astype(z_dt)
                        if acc_t:
                            ym = jnp.where(masks[s], ybs[b], zero_y)
                            a_parts[s] = a_parts[s] + jax.lax.dot_general(
                                ym, xbs[b], (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
                        else:
                            xm = jnp.where(masks[s], xbs[b], zero_x)
                            a_parts[s] = a_parts[s] + jax.lax.dot_general(
                                xm, ybs[b], (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
                    new_zs.append(zb)
                acc_ref[pl.ds(j0 * rps, sb * rps), :] += jnp.concatenate(
                    a_parts, axis=0)
                return tuple(new_zs)
            a = jnp.zeros((sb * rps, lanes), jnp.float32)
            for b in range(blocks):
                if acc_t:
                    ycat = jnp.concatenate(
                        [jnp.where(masks[s], ybs[b], zero_y)
                         for s in range(sb)], axis=1)
                    a = a + jax.lax.dot_general(
                        ycat, xbs[b], (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                else:
                    xcat = jnp.concatenate(
                        [jnp.where(masks[s], xbs[b], zero_x)
                         for s in range(sb)], axis=1)
                    a = a + jax.lax.dot_general(
                        xcat, ybs[b], (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                zcat = jax.lax.dot_general(
                    ybs[b], stacked, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                zb = zs[b]
                for s in range(sb):
                    zb = zb + jnp.where(
                        masks[s],
                        zcat[:, s * bw_x:(s + 1) * bw_x],
                        zero_zx,
                    ).astype(z_dt)
                new_zs.append(zb)
            acc_ref[pl.ds(j0 * rps, sb * rps), :] += a
            return tuple(new_zs)

        zs0 = tuple(jnp.zeros((seg, bw_x), z_dt) for _ in range(blocks))
        trips = (cnt_ref[si] + (sb - 1)) // sb
        zs = jax.lax.fori_loop(0, trips, run_body, zs0)
        for b in range(blocks):
            z_ref[r0:r0 + seg, b * bw_x:(b + 1) * bw_x] = zs[b]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nseg // spp,),
        in_specs=[
            pl.BlockSpec((spp * seg, x_w), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((spp * seg, y_w), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(acc_shape, lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((spp * seg, x_w), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct(acc_shape, jnp.float32),
            jax.ShapeDtypeStruct((nseg * seg, x_w), z_dt),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )




@functools.lru_cache(maxsize=None)
def _seg_accum_dg0_call(nseg, blocks, bw_x, bw_y, p_rows, tp0_pad, dt,
                        interpret, acc_t=False, sb=SPAN_BLOCK,
                        trip="concat", seg=SEG):
    """Innermost backward pass with FUSED first-core gradient: like
    :func:`_seg_accum_call`, but the NT-transformed cotangent rows
    (``dz0 = y @ table^T``, fp32) never leave VMEM — each segment
    contracts them against an in-register one-hot of the first-core row
    ids into a VMEM-resident ``[tp0_pad, blocks*bw_x]`` fp32 accumulator
    (exact fp32: the dot runs at HIGHEST precision, matching the XLA
    one-hot GEMM it replaces). Saves the [nza, blocks*bw_x] fp32 dz0
    HBM round trip AND the XLA path's materialized [nza, tp0] fp32
    one-hot operand (131 MB at nnz=164k) — matmul operands do not fuse
    on TPU.

    ``i0_ref`` rows carry the table-combined first-core id (sentinel
    ``tp0`` for dead/pad rows — it lands in a padded accumulator row the
    caller slices off)."""
    x_w = blocks * bw_x
    y_w = blocks * bw_y
    dt = jnp.dtype(dt)
    rps, lanes = (bw_y, bw_x) if acc_t else (bw_x, bw_y)
    acc_shape = ((p_rows + sb) * rps, lanes)

    def kernel(runs_ref, first_ref, cnt_ref, x_ref, y_ref, i0_ref, t_ref,
               acc_ref, dg0_ref):
        si = pl.program_id(0)

        @pl.when(si == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
            dg0_ref[:] = jnp.zeros_like(dg0_ref)

        base = si * seg
        rows = base + jax.lax.broadcasted_iota(jnp.int32, (seg, 1), 0)
        xbs = [x_ref[:, b * bw_x:(b + 1) * bw_x] for b in range(blocks)]
        ybs = [y_ref[:, b * bw_y:(b + 1) * bw_y] for b in range(blocks)]
        zero_x = jnp.zeros((seg, bw_x), dt)
        zero_y = jnp.zeros((seg, bw_y), dt)
        zero_zx = jnp.zeros((seg, bw_x), jnp.float32)

        def run_body(k, zs):
            j0 = first_ref[si] + k * sb
            stacked = t_ref[pl.ds(j0 * bw_x, sb * bw_x), :]
            masks = _span_masks(runs_ref, rows, j0, p_rows, sb)
            new_zs = []
            if trip == "dots":
                a_parts = [jnp.zeros((rps, lanes), jnp.float32)
                           for _ in range(sb)]
                for b in range(blocks):
                    zb = zs[b]
                    for s in range(sb):
                        slab_s = stacked[s * bw_x:(s + 1) * bw_x, :]
                        zc = jax.lax.dot_general(
                            ybs[b], slab_s, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        zb = zb + jnp.where(masks[s], zc, zero_zx)
                        if acc_t:
                            ym = jnp.where(masks[s], ybs[b], zero_y)
                            a_parts[s] = a_parts[s] + jax.lax.dot_general(
                                ym, xbs[b], (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
                        else:
                            xm = jnp.where(masks[s], xbs[b], zero_x)
                            a_parts[s] = a_parts[s] + jax.lax.dot_general(
                                xm, ybs[b], (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
                    new_zs.append(zb)
                acc_ref[pl.ds(j0 * rps, sb * rps), :] += jnp.concatenate(
                    a_parts, axis=0)
                return tuple(new_zs)
            a = jnp.zeros((sb * rps, lanes), jnp.float32)
            for b in range(blocks):
                if acc_t:
                    ycat = jnp.concatenate(
                        [jnp.where(masks[s], ybs[b], zero_y)
                         for s in range(sb)], axis=1)
                    a = a + jax.lax.dot_general(
                        ycat, xbs[b], (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                else:
                    xcat = jnp.concatenate(
                        [jnp.where(masks[s], xbs[b], zero_x)
                         for s in range(sb)], axis=1)
                    a = a + jax.lax.dot_general(
                        xcat, ybs[b], (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                zcat = jax.lax.dot_general(
                    ybs[b], stacked, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                zb = zs[b]
                for s in range(sb):
                    zb = zb + jnp.where(
                        masks[s],
                        zcat[:, s * bw_x:(s + 1) * bw_x],
                        zero_zx,
                    )
                new_zs.append(zb)
            acc_ref[pl.ds(j0 * rps, sb * rps), :] += a
            return tuple(new_zs)

        zs0 = tuple(
            jnp.zeros((seg, bw_x), jnp.float32) for _ in range(blocks))
        trips = (cnt_ref[si] + (sb - 1)) // sb
        zs = jax.lax.fori_loop(0, trips, run_body, zs0)
        zfull = (jnp.concatenate(list(zs), axis=1)
                 if blocks > 1 else zs[0])  # [seg, x_w] fp32 dz0 rows
        oh = (i0_ref[:, 0][:, None] == jax.lax.broadcasted_iota(
            jnp.int32, (seg, tp0_pad), 1)).astype(jnp.float32)
        dg0_ref[:, :] += jax.lax.dot_general(
            oh, zfull, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nseg,),
        in_specs=[
            pl.BlockSpec((seg, x_w), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((seg, y_w), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((seg, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(acc_shape, lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tp0_pad, x_w), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct(acc_shape, jnp.float32),
            jax.ShapeDtypeStruct((tp0_pad, x_w), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


def _dg0_fused_gate(tp0: int, width: int) -> bool:
    """Whether to fuse dG0 into the innermost accum kernel
    (``FBTT_DG0={fused,onehot}``). Default: **onehot** — measured
    within-run on v5e at the headline shape, the fused variant LOSES at
    every batch size (0.70 -> 0.74 ms at B=512, 6.45 -> 6.63 at B=8192,
    30.3 -> 31.0 at B=32k): the per-segment HIGHEST-precision one-hot
    dot plus the [tp0, q0*r1] VMEM accumulator read-modify-write cost
    more than the dz0 HBM round trip and XLA's one-hot GEMM they
    replace. Kept as an A/B knob (and as the measurement record)."""
    env = _knobs.get_str("FBTT_DG0")
    if env not in ("fused", "onehot"):
        return False
    if env == "onehot":
        return False
    return tp0 + 1 <= MAX_SPAN_ROWS and (tp0 + 8) * width * 4 <= \
        8 * 1024 * 1024


def _seg_accum_i1(nseg, blocks, bw_in, bw_out, p_rows, tp0, dt, interpret,
                  runs, first, cnt, x, y, i0c, table, seg=SEG,
                  sb=SPAN_BLOCK):
    """Innermost-pass wrapper: fused-dG0 accum kernel. Returns
    (dG in canonical [p, bw_in, bw_out], dG0 flat [tp0, blocks*bw_in])."""
    acc_t = _acc_transposed(bw_in, bw_out)
    tp0_pad = _cdiv(tp0 + 1, 8) * 8
    dgbd, dg0 = _seg_accum_dg0_call(
        nseg, blocks, bw_in, bw_out, p_rows, tp0_pad, dt, interpret,
        acc_t=acc_t, trip=_trip_mode(), seg=seg, sb=sb)(
        runs, first, cnt, x, y, i0c.reshape(-1, 1), table)
    return (_acc_to_canonical(dgbd, p_rows, bw_in, bw_out, acc_t),
            dg0[:tp0])


@functools.lru_cache(maxsize=None)
def _seg_fused_i2_call(nseg, blocks, bw_x, bw_y, p_rows, dt, interpret,
                       acc_t=False, sb=SPAN_BLOCK, trip="concat", seg=SEG):
    """Fused last-core pass for the train step (d_output known up front):
    per segment and intersecting core row j,

      rows_b[rows of j] = x_b[rows of j] @ table[j]        (forward)
      z_b[rows of j]    = y_b[rows of j] @ table[j]^T      (dZ1, NT dims)
      acc[j]           += sum_b x_b^T @ y_b                (dG2)

    One grid pass instead of a transform + an accum pass — the segment's
    x/y loads and span logic are shared. Span-blocked with the 2-D
    stacked table/accumulator layout (see :func:`_seg_accum_call`);
    ``acc_t`` stores the accumulator transposed."""
    x_w = blocks * bw_x
    y_w = blocks * bw_y
    dt = jnp.dtype(dt)
    rps, lanes = (bw_y, bw_x) if acc_t else (bw_x, bw_y)
    acc_shape = ((p_rows + sb) * rps, lanes)
    spp = _spp_for(nseg, seg)

    def kernel(runs_ref, first_ref, cnt_ref, x_ref, y_ref, t_ref,
               acc_ref, z_ref, rows_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        for h in range(spp):
            si = pl.program_id(0) * spp + h
            base = si * seg
            r0 = h * seg
            rows_i = base + jax.lax.broadcasted_iota(
                jnp.int32, (seg, 1), 0)
            xbs = [x_ref[r0:r0 + seg, b * bw_x:(b + 1) * bw_x]
                   for b in range(blocks)]
            ybs = [y_ref[r0:r0 + seg, b * bw_y:(b + 1) * bw_y]
                   for b in range(blocks)]
            zero_x = jnp.zeros((seg, bw_x), dt)
            zero_y = jnp.zeros((seg, bw_y), dt)
            _sub(si, r0, rows_i, xbs, ybs, zero_x, zero_y,
                 runs_ref, first_ref, cnt_ref, t_ref, acc_ref, z_ref,
                 rows_ref)

    def _sub(si, r0, rows_i, xbs, ybs, zero_x, zero_y,
             runs_ref, first_ref, cnt_ref, t_ref, acc_ref, z_ref,
             rows_ref):
        def run_body(k, carry):
            zs, rs = carry
            j0 = first_ref[si] + k * sb
            stacked = t_ref[pl.ds(j0 * bw_x, sb * bw_x), :]
            masks = _span_masks(runs_ref, rows_i, j0, p_rows, sb)
            new_zs, new_rs = [], []
            zero_zx = jnp.zeros((seg, bw_x), jnp.float32)
            if trip == "dots":
                a_parts = [jnp.zeros((rps, lanes), jnp.float32)
                           for _ in range(sb)]
                for b in range(blocks):
                    zb, rb_acc = zs[b], rs[b]
                    for s in range(sb):
                        slab_s = stacked[s * bw_x:(s + 1) * bw_x, :]
                        xm = jnp.where(masks[s], xbs[b], zero_x)
                        if acc_t:
                            ym = jnp.where(masks[s], ybs[b], zero_y)
                            a_parts[s] = a_parts[s] + jax.lax.dot_general(
                                ym, xbs[b], (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
                        else:
                            a_parts[s] = a_parts[s] + jax.lax.dot_general(
                                xm, ybs[b], (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
                        zc = jax.lax.dot_general(
                            ybs[b], slab_s, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        zb = zb + jnp.where(masks[s], zc,
                                            zero_zx).astype(dt)
                        rc = jnp.dot(xm, slab_s,
                                     preferred_element_type=jnp.float32)
                        rb_acc = rb_acc + rc.astype(dt)
                    new_zs.append(zb)
                    new_rs.append(rb_acc)
                acc_ref[pl.ds(j0 * rps, sb * rps), :] += jnp.concatenate(
                    a_parts, axis=0)
                return tuple(new_zs), tuple(new_rs)
            a = jnp.zeros((sb * rps, lanes), jnp.float32)
            for b in range(blocks):
                xcat = jnp.concatenate(
                    [jnp.where(masks[s], xbs[b], zero_x)
                     for s in range(sb)], axis=1)
                if acc_t:
                    ycat = jnp.concatenate(
                        [jnp.where(masks[s], ybs[b], zero_y)
                         for s in range(sb)], axis=1)
                    a = a + jax.lax.dot_general(
                        ycat, xbs[b], (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                else:
                    a = a + jax.lax.dot_general(
                        xcat, ybs[b], (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                zcat = jax.lax.dot_general(
                    ybs[b], stacked, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                zb = zs[b]
                for s in range(sb):
                    zb = zb + jnp.where(
                        masks[s],
                        zcat[:, s * bw_x:(s + 1) * bw_x],
                        zero_zx,
                    ).astype(dt)
                new_zs.append(zb)
                rb = jnp.dot(xcat, stacked,
                             preferred_element_type=jnp.float32)
                new_rs.append(rs[b] + rb.astype(dt))
            acc_ref[pl.ds(j0 * rps, sb * rps), :] += a
            return tuple(new_zs), tuple(new_rs)

        zs0 = tuple(jnp.zeros((seg, bw_x), dt) for _ in range(blocks))
        rs0 = tuple(jnp.zeros((seg, bw_y), dt) for _ in range(blocks))
        trips = (cnt_ref[si] + (sb - 1)) // sb
        zs, rs = jax.lax.fori_loop(0, trips, run_body, (zs0, rs0))
        for b in range(blocks):
            z_ref[r0:r0 + seg, b * bw_x:(b + 1) * bw_x] = zs[b]
            rows_ref[r0:r0 + seg, b * bw_y:(b + 1) * bw_y] = rs[b]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nseg // spp,),
        in_specs=[
            pl.BlockSpec((spp * seg, x_w), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((spp * seg, y_w), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(acc_shape, lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((spp * seg, x_w), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((spp * seg, y_w), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct(acc_shape, jnp.float32),
            jax.ShapeDtypeStruct((nseg * seg, x_w), dt),
            jax.ShapeDtypeStruct((nseg * seg, y_w), dt),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


def _acc_transposed(bw_in: int, bw_out: int) -> bool:
    """Whether to store a pass's gradient accumulator transposed.

    Rule: keep the WIDER of (bw_in, bw_out) on lanes. A [bw_in, bw_out]
    fp32 tile with bw_out < 128 lanes runs the per-span dynamic-index
    read-modify-write on masked partial tiles (e.g. the ndim-3 last-core
    pass: [128, 16]); `FBTT_ACC_T={0,1}` overrides for A/B runs."""
    mode = _knobs.get_str("FBTT_ACC_T", "auto")
    if mode in ("0", "1"):
        return mode == "1"
    return bw_out < bw_in


def _acc_to_canonical(acc2d, p_rows, bw_in, bw_out, acc_t):
    """2-D stacked kernel accumulator (with its span-block scratch tail)
    -> canonical ``[p_rows, bw_in, bw_out]``."""
    rps, lanes = (bw_out, bw_in) if acc_t else (bw_in, bw_out)
    acc = acc2d[:p_rows * rps].reshape(p_rows, rps, lanes)
    return jnp.swapaxes(acc, 1, 2) if acc_t else acc


def _seg_accum(nseg, blocks, bw_in, bw_out, p_rows, dt, z_dt, interpret,
               runs, first, cnt, x, y, table, seg=SEG, sb=SPAN_BLOCK):
    """Accum-pass wrapper: picks the accumulator orientation and returns
    the gradient in the canonical [p, bw_in, bw_out] layout."""
    acc_t = _acc_transposed(bw_in, bw_out)
    dgbd, z = _seg_accum_call(
        nseg, blocks, bw_in, bw_out, p_rows, dt, z_dt, interpret,
        acc_t=acc_t, trip=_trip_mode(), seg=seg, sb=sb)(
        runs, first, cnt, x, y, table)
    return _acc_to_canonical(dgbd, p_rows, bw_in, bw_out, acc_t), z


# ----------------------------------------------------------- host glue


class FlatPlan(NamedTuple):
    """Per-core sorted orders, span tables, and permutation maps shared by
    forward and backward. All per-lookup arrays have NZA entries (nnz
    padded to whole SEG-lookup segments; pad rows carry sentinel keys).

    Index convention: pass t (1-based core index) lives in sort-space
    ``s_t``; list entry ``t-1`` holds its tables. ``perm_fwd[t-1]`` maps
    positions of ``s_{t+1}`` to positions of ``s_t`` (gather map used when
    moving the state forward); ``perm_bwd`` is the inverse chain."""

    i0_s1: jnp.ndarray        # [NZA] first-core rows (table-combined)
    alive1: jnp.ndarray       # [NZA] bool, real & live, s1 order
    runs: Tuple[jnp.ndarray, ...]    # per pass: [T*p_t + 2] span starts
    first: Tuple[jnp.ndarray, ...]   # per pass: [nseg]
    cnt: Tuple[jnp.ndarray, ...]     # per pass: [nseg]
    perm_fwd: Tuple[jnp.ndarray, ...]  # per gap t->t+1: [NZA]
    perm_bwd: Tuple[jnp.ndarray, ...]  # per gap t+1->t: [NZA]
    rowidx_last: jnp.ndarray  # [NZA] pooled-row ids in the LAST space
    w_last: Optional[jnp.ndarray]
    # pair-fusion mode only: [NZA] (i0, i1) pair ids in the s2 space
    # (sentinel = T*p0*p1 for dead/pad rows); None otherwise
    pair_s2: Optional[jnp.ndarray] = None


def _span_table(key_sorted: jnp.ndarray, p_rows: int, nseg: int, seg=SEG):
    """(spans by core row, per-segment first span, per-segment span
    count) from the sorted keys — all via searchsorted, no scatters.

    ``runs`` carries ``SPAN_BLOCK`` extra tail entries (all ``= nza``,
    i.e. empty spans) so the kernels' span-blocked loop can read bounds
    for a full block starting at the sentinel span without going out of
    range."""
    edges = jnp.arange(p_rows + SPAN_BLOCK + 1, dtype=jnp.int32)
    runs = jnp.searchsorted(
        key_sorted.astype(jnp.int32), edges, side="left"
    ).astype(jnp.int32)
    seg_starts = jnp.arange(nseg, dtype=jnp.int32) * seg
    first = (jnp.searchsorted(runs, seg_starts, side="right") - 1
             ).astype(jnp.int32)
    last = (jnp.searchsorted(runs, seg_starts + (seg - 1), side="right") - 1
            ).astype(jnp.int32)
    return runs, first, (last - first + 1).astype(jnp.int32)


def _perm_rows(x: jnp.ndarray, perm: jnp.ndarray) -> jnp.ndarray:
    """Row-permute ``x[perm]``, optionally u32-packing 2-byte rows.

    A TPU row-gather reads whole (sublane, 128-lane) tiles, so its HBM
    cost is proportional to the LANE-TILES each row touches, not its
    bytes: a [nnz, 512] bf16 row is 4 lane-tiles (16 KB read for 1 KB
    used); lane-pairs bitcast to uint32 halve that. Measured ISOLATED
    (pack hoisted out of the loop) the packed gather wins 14%
    (12.2 vs 14.3 ns/row) — but IN-GRAPH the pack's [n, w/2, 2]
    reshape materializes with a 2-wide minor dim (64x tile padding) and
    the step REGRESSES badly, so the default is the plain gather.
    ``FBTT_PACK_PERM=1`` re-enables for A/B."""
    n, w = x.shape
    if (x.dtype.itemsize == 2 and w % 2 == 0
            and _knobs.get_str("FBTT_PACK_PERM", "0") == "1"):
        xu = jax.lax.bitcast_convert_type(
            x.reshape(n, w // 2, 2), jnp.uint32)
        return jax.lax.bitcast_convert_type(
            xu[perm], x.dtype).reshape(n, w)
    return x[perm]


def _invert_perm(perm: jnp.ndarray) -> jnp.ndarray:
    """Inverse permutation by sorting (an [n] scatter costs ~10x more on
    TPU than carrying iota through a sort)."""
    n = perm.shape[0]
    _, inv = jax.lax.sort(
        [perm, jnp.arange(n, dtype=jnp.int32)], num_keys=1, is_stable=True)
    return inv


def _build_plan(indices, rowidx, tableidx, weights, live_count,
                tt_p_shapes, num_tables, batch_size, dead_mask=None,
                idx_parts=None, seg=SEG, pair=False):
    from fbtt_embedding_tpu.ops.indexing import tt_strides

    ndim = len(tt_p_shapes)
    nnz = rowidx.shape[0]
    nza = _cdiv(nnz, seg) * seg
    nseg = nza // seg

    if idx_parts is not None:
        parts = [p_.astype(jnp.int32) for p_ in idx_parts]
    else:
        strides = tt_strides(tt_p_shapes)
        idx32 = indices.astype(jnp.int32)
        parts = [
            (idx32 // int(strides[t])) % tt_p_shapes[t]
            for t in range(ndim)
        ]
    # (i0, i1) pair id — the flat [T, p0, p1] index (i0c*p1 + i1 with
    # table-combined i0c equals t*p0*p1 + i0*p1 + i1)
    pairc = (parts[0] * tt_p_shapes[1] + parts[1]) if pair else None
    if tableidx is not None and num_tables > 1:
        t32 = tableidx.astype(jnp.int32)
        parts = [p_ + t32 * tt_p_shapes[t] for t, p_ in enumerate(parts)]
        rowc = rowidx.astype(jnp.int32) + t32 * batch_size
        if pair:
            pairc = pairc + t32 * (tt_p_shapes[0] * tt_p_shapes[1])
    else:
        rowc = rowidx.astype(jnp.int32)

    sents = [int(num_tables * p_) for p_ in tt_p_shapes]
    if dead_mask is not None:
        dead = dead_mask
    elif live_count is not None:
        pos = jnp.arange(nnz, dtype=jnp.int32)
        dead = pos >= live_count.astype(jnp.int32).reshape(())
    else:
        dead = None
    pairp = None
    if pair:
        sent_pair = int(num_tables * tt_p_shapes[0] * tt_p_shapes[1])
        if dead is not None:
            pairc = jnp.where(dead, jnp.int32(sent_pair), pairc)
        pairp = jnp.pad(pairc, (0, nza - nnz), constant_values=sent_pair)
    keys = []
    for t in range(1, ndim):
        k = parts[t]
        if dead is not None:
            k = jnp.where(dead, jnp.int32(sents[t]), k)
        keys.append(jnp.pad(k, (0, nza - nnz), constant_values=sents[t]))

    i0p = jnp.pad(parts[0], (0, nza - nnz))
    rowp = jnp.pad(rowc, (0, nza - nnz), constant_values=-1)
    posp = jnp.arange(nza, dtype=jnp.int32)
    wp = (jnp.pad(weights.astype(jnp.float32), (0, nza - nnz))
          if weights is not None else None)

    # chain of stable sorts, one per middle/last core. Each sort runs on
    # the ORIGINAL-order key array and carries: the previous space's
    # orig->slot map (so the gap permutation "slot_t -> slot_{t-1}" falls
    # out sorted, no gather), and the original positions (to build this
    # space's orig->slot map for the next sort). rowidx/weights ride the
    # LAST sort — pooling and cotangent gathers happen in that space.
    if pair and ndim == 3:
        # pair-fusion fast plan (one sort fewer): the forward never uses
        # the s1->s2 permutation, only the backward needs s1 slot -> s2
        # slot. Sort by i2 FIRST (carrying pair ids, pooling arrays, and
        # positions), invert the carried positions once (orig -> s2
        # slot), then let the i1 sort carry those s2 slots directly —
        # perm_bwd falls out sorted with no second inversion.
        ops2 = [keys[1], pairp, rowp]
        if wp is not None:
            ops2.append(wp)
        ops2.append(posp)
        res2 = jax.lax.sort(ops2, num_keys=1, is_stable=True)
        k2_s, pair_s2, row_s = res2[0], res2[1], res2[2]
        w_s = res2[3] if wp is not None else None
        slot2_of_orig = _invert_perm(res2[-1])
        runs2, first2, cnt2 = _span_table(k2_s, sents[2], nseg, seg=seg)

        res1 = jax.lax.sort(
            [keys[0], i0p, slot2_of_orig], num_keys=1, is_stable=True)
        k1_s, i0_s1, perm_bwd0 = res1
        alive1 = k1_s < sents[1]
        runs1, first1, cnt1 = _span_table(k1_s, sents[1], nseg, seg=seg)

        return FlatPlan(
            i0_s1=i0_s1, alive1=alive1,
            runs=(runs1, runs2), first=(first1, first2),
            cnt=(cnt1, cnt2),
            perm_fwd=(None,), perm_bwd=(perm_bwd0,),
            rowidx_last=row_s, w_last=w_s, pair_s2=pair_s2,
        ), nza

    runs_l, first_l, cnt_l = [], [], []
    perm_fwd, perm_bwd = [], []
    i0_s1 = alive1 = row_s = w_s = pair_s2 = None
    inv_prev = None  # orig position -> slot in the previous space
    for t in range(1, ndim):
        is_last = t == ndim - 1
        ops = [keys[t - 1]]
        if t == 1:
            ops.append(i0p)
        else:
            ops.append(inv_prev)
        if not is_last:
            # positions feed the NEXT sort's carry; the last sort carries
            # the pooling arrays instead
            ops.append(posp)
        else:
            ops.append(rowp)
            if wp is not None:
                ops.append(wp)
        if pair and t == 2:
            # pair-fusion: pair ids ride the second sort so the forward
            # can gather Z1 directly in the s2 space
            ops.append(pairp)
        res = jax.lax.sort(ops, num_keys=1, is_stable=True)
        if pair and t == 2:
            pair_s2 = res[-1]
            res = res[:-1]
        k_s, second = res[0], res[1]
        if t == 1:
            i0_s1 = second
            alive1 = k_s < sents[1]
        else:
            perm = second  # slot_t -> slot_{t-1}
            perm_fwd.append(perm)
            perm_bwd.append(_invert_perm(perm))
        if is_last:
            row_s = res[2]
            w_s = res[3] if wp is not None else None
        else:
            inv_prev = _invert_perm(res[2])  # orig -> slot_t
        r_, f_, c_ = _span_table(k_s, sents[t], nseg, seg=seg)
        runs_l.append(r_)
        first_l.append(f_)
        cnt_l.append(c_)

    return FlatPlan(
        i0_s1=i0_s1, alive1=alive1,
        runs=tuple(runs_l), first=tuple(first_l), cnt=tuple(cnt_l),
        perm_fwd=tuple(perm_fwd), perm_bwd=tuple(perm_bwd),
        rowidx_last=row_s, w_last=w_s, pair_s2=pair_s2,
    ), nza


def _bd_table(gk_t: jnp.ndarray, mm: int, dt):
    """Core t kernel layout [tp_t, r_t, q_t*r_{t+1}] -> block-diagonal
    expansion over the ``mm`` accumulated middle digits,
    [tp_t, mm*r_t, mm*q_t*r_{t+1}], via one eye-broadcast fusion."""
    if mm == 1:
        return gk_t.astype(dt)
    tp, r_t, w_t = gk_t.shape
    eye = jnp.eye(mm, dtype=dt)
    bd = (eye[None, :, None, :, None]
          * gk_t.astype(dt)[:, None, :, None, :])
    return bd.reshape(tp, mm * r_t, mm * w_t)


def _extract_bd_grad(dgbd: jnp.ndarray, mm: int, r_t: int, w_t: int):
    """Sum the diagonal blocks of a block-diagonal-expanded gradient."""
    if mm == 1:
        return dgbd
    out = None
    for a in range(mm):
        blk = dgbd[:, a * r_t:(a + 1) * r_t, a * w_t:(a + 1) * w_t]
        out = blk if out is None else out + blk
    return out


# one-hot pooling costs O(tb * nnz * D) MXU FLOPs — ~20x cheaper than
# segment_sum at B=512 but quadratic-feeling at large batch; switch over
# when the one-hot would dominate (measured crossover ~tb 4k)
_POOL_ONEHOT_MAX_TB = 4096


def _pool_flat(rows64, plan, tb, dt):
    """Pool per-lookup rows (last sort space) into [tb, d]: one-hot MXU
    GEMM for small batches, segment_sum for large ones."""
    if tb <= _POOL_ONEHOT_MAX_TB:
        iota_b = jnp.arange(tb, dtype=jnp.int32)
        hit = plan.rowidx_last[None, :] == iota_b[:, None]
        if plan.w_last is not None:
            oh = jnp.where(hit, plan.w_last[None, :], 0.0).astype(dt)
        else:
            oh = hit.astype(dt)
        return jax.lax.dot_general(
            oh, rows64, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [tb, d] fp32
    rows_f = rows64.astype(jnp.float32)
    if plan.w_last is not None:
        rows_f = rows_f * plan.w_last[:, None]
    seg = jnp.where(plan.rowidx_last >= 0, plan.rowidx_last, tb)
    return jax.ops.segment_sum(rows_f, seg, num_segments=tb + 1)[:tb]


def _flat_setup(cores, p, q, r, dt):
    """(g0f with zero row, per-pass 2-D stacked bd tables, widths).

    Pass tables are stacked ``[(T*p_t + SPAN_BLOCK) * bw_in, bw_out]``
    (span ``j``'s slab at rows ``j*bw_in : (j+1)*bw_in``, zero-padded
    tail) so the kernels slice a whole span block with one contiguous
    dynamic slice."""
    from fbtt_embedding_tpu.ops.pallas.tt_kernel import kernel_core_layouts

    t = cores[0].shape[0]
    gk = kernel_core_layouts(cores, p, q, r)
    g0f = jnp.concatenate([
        gk[0].reshape(t * p[0], q[0] * r[1]),
        jnp.zeros((1, q[0] * r[1]), jnp.float32),
    ]).astype(dt)
    widths = _bd_widths(list(q), list(r))
    tables = []
    for ti in range(1, len(p)):
        mm, bw_in, bw_out = widths[ti - 1]
        bd = _bd_table(gk[ti], mm, dt)
        tables.append(jnp.concatenate([
            bd.reshape(bd.shape[0] * bw_in, bw_out),
            jnp.zeros((SPAN_BLOCK * bw_in, bw_out), dt),
        ]))
    return g0f, gk, tables, widths


def _pair_table(gk, p, q, r, t, dt):
    """Per-step pair-product table ``[T*p0*p1 + 1, q0*q1*r2]`` (zero
    sentinel row last): ``G01[(t, k, j)] = G0[t, k] @ G1[t, j]`` per q0
    lane-block, staged like the kernels (inputs in the compute dtype,
    fp32 accumulation, output in the compute dtype) so pair mode matches
    the kernel pass's rounding. One einsum + one HBM stream per step —
    ~1.4 GFLOP / 45 MB at the reference headline shape."""
    w1 = q[1] * r[2]
    g0 = gk[0].reshape(t, p[0], q[0], r[1]).astype(dt)
    g1 = gk[1].reshape(t, p[1], r[1], w1).astype(dt)
    g01 = jnp.einsum(
        "tkar,tjrw->tkjaw", g0, g1, preferred_element_type=jnp.float32)
    g01 = g01.reshape(t * p[0] * p[1], q[0] * w1).astype(dt)
    return jnp.concatenate([g01, jnp.zeros((1, q[0] * w1), dt)])


def quantize_rows_int8(tbl: jnp.ndarray):
    """Per-row symmetric int8 quantization: ``(q8, scale)`` with
    ``tbl ≈ q8.astype(f32) * scale[:, None]`` (scale = absmax/127;
    all-zero rows — e.g. the flat pipeline's sentinel row — get scale 0
    and dequantize to exact zeros)."""
    absmax = jnp.max(jnp.abs(tbl.astype(jnp.float32)), axis=1)
    scale = absmax / 127.0
    inv = jnp.where(scale > 0, 1.0 / jnp.where(scale > 0, scale, 1.0), 0.0)
    q8 = jnp.clip(
        jnp.round(tbl.astype(jnp.float32) * inv[:, None]), -127, 127
    ).astype(jnp.int8)
    return q8, scale


def _dequant_gather(qtbl, rows):
    """Gather rows from a ``(q8, scale)`` pair and dequantize — the
    multiply fuses into the gather consumer under XLA."""
    q8, scale = qtbl
    return q8[rows].astype(jnp.float32) * scale[rows][:, None]


def make_serving_fold(cores, tt_p_shapes, tt_q_shapes, tt_ranks,
                      compute_dtype=jnp.float32, pair: bool = True,
                      quantize=None):
    """Fold every weight-derived array the flat FORWARD needs into a
    reusable pytree ``(g0f, g01f_or_None, tables)`` — for frozen-weight
    serving, where the per-step rebuild cost of training vanishes.

    ``g01f`` is the G0xG1 pair-product table (see :func:`_pair_table`);
    built when ``pair`` and :func:`pair_structural_ok` — at serving time
    it is used at ANY batch size (training's nnz >= 16k amortization gate
    does not apply: the build happened once, here).

    ``quantize="int8"`` stores the pair table — the fold's dominant HBM
    resident (45 MB bf16 at the reference headline shape) — as a
    per-row-scaled ``(int8, f32 scale)`` pair (see
    :func:`quantize_rows_int8`): 2× (vs bf16) / 4× (vs fp32) smaller,
    dequantized after the serve-time row gather where XLA fuses the
    multiply. The g0f / block-diagonal pass tables stay in the compute
    dtype — they are small and feed the Pallas kernels directly."""
    p, q, r = tuple(tt_p_shapes), tuple(tt_q_shapes), tuple(tt_ranks)
    t = cores[0].shape[0]
    dt = jnp.dtype(compute_dtype)
    g0f, gk, tables, _ = _flat_setup(cores, p, q, r, dt)
    g01f = (
        _pair_table(gk, p, q, r, t, dt)
        if pair and pair_structural_ok(t, p, q, r, dt.itemsize) else None
    )
    if quantize == "int8" and g01f is not None:
        g01f = quantize_rows_int8(g01f)
    return g0f, g01f, tuple(tables)


def flat_lookup_forward(cores, tt_p_shapes, tt_q_shapes, tt_ranks,
                        batch_size, plan: FlatPlan, nza,
                        compute_dtype=jnp.float32, interpret=False,
                        seg=SEG, setup=None, num_tables=None):
    """Pooled forward on the flat pipeline -> ([T, B, D], staged states).

    The staged states (the input of every middle/last core pass, in that
    pass's sort space) are the backward's residuals — saved instead of
    recomputed.

    ``setup``: a prebuilt :func:`make_serving_fold` triple; when given,
    ``cores`` may be None (pass ``num_tables``) and no weight-derived
    arrays are rebuilt — the frozen-weight serving path."""
    p = tuple(tt_p_shapes)
    q = tuple(tt_q_shapes)
    r = tuple(tt_ranks)
    ndim = len(p)
    q0 = q[0]
    t = cores[0].shape[0] if cores is not None else num_tables
    tb = t * batch_size
    d = int(np.prod(q))
    nseg = nza // seg

    dt = jnp.dtype(compute_dtype)
    if setup is None:
        g0f, gk, tables, widths = _flat_setup(cores, p, q, r, dt)
        g01f = (_pair_table(gk, p, q, r, t, dt)
                if plan.pair_s2 is not None else None)
    else:
        g0f, g01f, tables = setup
        widths = _bd_widths(list(q), list(r))

    stages = []
    if plan.pair_s2 is not None:
        # pair fusion: gather Z1 directly in the s2 space from the
        # per-step (or serving-folded) pair table — no first-pass
        # kernel, no s1->s2 permute; the backward recomputes z0 (a free
        # gather) from plan.i0_s1. A quantized fold stores the table as
        # a (int8, scale) pair — dequantize after the gather.
        state = (_dequant_gather(g01f, plan.pair_s2).astype(dt)
                 if isinstance(g01f, tuple) else g01f[plan.pair_s2])
        stages.append(None)
        start_ti = 2
    else:
        i0c = jnp.where(plan.alive1, plan.i0_s1, t * p[0])
        state = g0f[i0c]  # [nza, q0*r1], lookup-major, s1 order
        start_ti = 1
    for ti in range(start_ti, ndim):
        mm, bw_in, bw_out = widths[ti - 1]
        stages.append(state)
        state = _seg_transform_call(
            nseg, q0, bw_in, bw_out, t * p[ti], dt.name, dt.name,
            interpret, trip=_trip_mode(), seg=seg,
            sb=_sb_for(nza, t * p[ti], seg))(
            plan.runs[ti - 1], plan.first[ti - 1], plan.cnt[ti - 1],
            state, tables[ti - 1])
        if ti < ndim - 1:
            state = _perm_rows(state, plan.perm_fwd[ti - 1])  # s_ti->s_{ti+1}

    out = _pool_flat(state, plan, tb, dt)
    return out.reshape(t, batch_size, d), tuple(stages)


def flat_lookup_backward(cores, tt_p_shapes, tt_q_shapes, tt_ranks,
                         batch_size, plan: FlatPlan, nza,
                         stages, d_output, compute_dtype=jnp.float32,
                         interpret=False, seg=SEG):
    """Backward on the flat pipeline -> core grads in module layout."""
    from fbtt_embedding_tpu.ops.pallas.tt_kernel import (
        grads_to_module_layout,
    )

    p = tuple(tt_p_shapes)
    q = tuple(tt_q_shapes)
    r = tuple(tt_ranks)
    ndim = len(p)
    q0 = q[0]
    t = cores[0].shape[0]
    tb = t * batch_size
    d = int(np.prod(q))
    nseg = nza // seg

    dt = jnp.dtype(compute_dtype)
    g0f, gk, tables, widths = _flat_setup(cores, p, q, r, dt)

    # per-lookup cotangents in the LAST sort space (one zero row appended
    # to dout so pad rows gather zeros instead of being masked)
    dflat = jnp.concatenate([
        d_output.reshape(tb, d).astype(dt),
        jnp.zeros((1, d), dt),
    ])
    rowc = jnp.where(plan.rowidx_last >= 0, plan.rowidx_last, tb)
    dz = dflat[rowc]
    if plan.w_last is not None:
        dz = dz * plan.w_last[:, None].astype(dt)

    dgs = [None] * ndim
    dg0_flat = None
    for ti in range(ndim - 1, 0, -1):
        mm, bw_in, bw_out = widths[ti - 1]
        z_dt = dt.name if ti > 1 else "float32"
        x_stage = stages[ti - 1]
        if x_stage is None:
            # pair-fusion forward skipped pass 1: recompute z0 (a free
            # gather — composes the s1 permutation at no extra cost)
            i0c = jnp.where(plan.alive1, plan.i0_s1, t * p[0])
            x_stage = g0f[i0c]
        if ti == 1 and _dg0_fused_gate(t * p[0], q0 * bw_in):
            # innermost pass: dG0 folds into the kernel (dz0 never
            # leaves VMEM; no materialized [nza, tp0] one-hot operand)
            i0c = jnp.where(plan.alive1, plan.i0_s1, t * p[0])
            dgbd, dg0_flat = _seg_accum_i1(
                nseg, q0, bw_in, bw_out, t * p[ti], t * p[0], dt.name,
                interpret, plan.runs[ti - 1], plan.first[ti - 1],
                plan.cnt[ti - 1], x_stage, dz, i0c, tables[ti - 1],
                seg=seg, sb=_sb_for(nza, t * p[ti], seg))
        else:
            dgbd, dz = _seg_accum(
                nseg, q0, bw_in, bw_out, t * p[ti], dt.name, z_dt,
                interpret,
                plan.runs[ti - 1], plan.first[ti - 1], plan.cnt[ti - 1],
                x_stage, dz, tables[ti - 1], seg=seg,
                sb=_sb_for(nza, t * p[ti], seg))
        dgs[ti] = _extract_bd_grad(
            dgbd, mm, r[ti], q[ti] * r[ti + 1])
        if ti > 1:
            dz = _perm_rows(dz, plan.perm_bwd[ti - 2])  # s_ti -> s_{ti-1}

    if dg0_flat is not None:
        dgs[0] = dg0_flat.reshape(t * p[0], q0, r[1])
    else:
        # dG0: one exact-fp32 one-hot GEMM over lookups (s1 order)
        i0c = jnp.where(plan.alive1, plan.i0_s1, -1)
        oh0 = (i0c[:, None]
               == jnp.arange(t * p[0], dtype=jnp.int32)[None, :]).astype(
                   jnp.float32)
        dg0f = jax.lax.dot_general(
            oh0, dz, (((0,), (0,)), ((), ())),
            precision=_ONEHOT_PRECISION,
            preferred_element_type=jnp.float32,
        )  # [tp0, q0*r1]
        dgs[0] = dg0f.reshape(t * p[0], q0, r[1])
    return grads_to_module_layout(tuple(dgs), p, q, r, t)


@functools.lru_cache(maxsize=None)
def make_flat_vjp(p, q, r, num_tables, batch_size, has_tableidx,
                  has_weights, has_live, interpret,
                  compute_dtype="float32", live_is_mask=False,
                  parts_mode=False):
    """custom_vjp pooled lookup over the flat pipeline.

    The plan (sorts, span tables, permutations) and the forward's staged
    states are computed once and shared: the backward reuses them instead
    of recomputing (the save is a few [nnz, width] arrays in the compute
    dtype, traded for whole kernel passes)."""
    pl_, ql_, rl_ = list(p), list(q), list(r)
    cdt = jnp.dtype(compute_dtype)

    def fwd_impl(cores, indices, rowidx, tableidx, weights, live):
        seg = _seg_for(rowidx.shape[0])
        nza_est = _cdiv(rowidx.shape[0], seg) * seg
        pair = _pair_gate(nza_est, num_tables, pl_, ql_, rl_,
                          cdt.itemsize)
        plan, nza = _build_plan(
            None if parts_mode else indices, rowidx,
            tableidx if has_tableidx else None,
            weights if has_weights else None,
            live if (has_live and not live_is_mask) else None,
            pl_, num_tables, batch_size,
            dead_mask=(live if (has_live and live_is_mask) else None),
            idx_parts=indices if parts_mode else None, seg=seg,
            pair=pair)
        out, stages = flat_lookup_forward(
            cores, pl_, ql_, rl_, batch_size, plan, nza,
            compute_dtype=cdt, interpret=interpret, seg=seg)
        return out, (plan, nza, stages)

    @jax.custom_vjp
    def fn(cores, indices, rowidx, tableidx, weights, live):
        return fwd_impl(cores, indices, rowidx, tableidx, weights, live)[0]

    def fn_fwd(cores, indices, rowidx, tableidx, weights, live):
        out, ctx = fwd_impl(cores, indices, rowidx, tableidx, weights, live)
        plan, nza, stages = ctx
        return out, (cores, plan, stages, rowidx.shape[0])

    def fn_bwd(res, d_output):
        cores, plan, stages, nnz = res
        nza = plan.i0_s1.shape[0]
        grads = flat_lookup_backward(
            cores, pl_, ql_, rl_, batch_size, plan, nza,
            stages, d_output, compute_dtype=cdt, interpret=interpret,
            seg=_seg_for(nnz))
        zi = np.zeros((nnz,), dtype=jax.dtypes.float0)
        zl = np.zeros((nnz,) if live_is_mask else (1,),
                      dtype=jax.dtypes.float0)
        zidx = tuple(zi for _ in pl_) if parts_mode else zi
        return (
            tuple(grads), zidx, zi,
            (zi if has_tableidx else None),
            (jnp.zeros((nnz,), jnp.float32) if has_weights else None),
            (zl if has_live else None),
        )

    fn.defvjp(fn_fwd, fn_bwd)
    return fn


def flat_train_apply(cores, tt_p_shapes, tt_q_shapes, tt_ranks, batch_size,
                     indices, rowidx, tableidx, weights, dead_mask,
                     d_output, compute_dtype=jnp.float32, interpret=False,
                     idx_parts=None):
    """Forward + backward of the TT lookup in one pass structure, for the
    fused train step where ``d_output`` is an input (reference backward
    API semantics): fwd and bwd share the plan and staged states, and the
    LAST core runs as ONE fused kernel (rows + dZ + dG together). Measured
    slower than the two-pass path at the headline config (larger loop
    carries); kept opt-in — see make_fused_train_step. Returns
    (pooled output [T, B, D], core grads in module layout)."""
    from fbtt_embedding_tpu.ops.pallas.tt_kernel import (
        grads_to_module_layout,
    )

    p = tuple(tt_p_shapes)
    q = tuple(tt_q_shapes)
    r = tuple(tt_ranks)
    ndim = len(p)
    q0 = q[0]
    t = cores[0].shape[0]
    tb = t * batch_size
    d = int(np.prod(q))

    seg = _seg_for(rowidx.shape[0])
    nza_est = _cdiv(rowidx.shape[0], seg) * seg
    dt = jnp.dtype(compute_dtype)
    pair = _pair_gate(nza_est, t, p, q, r, dt.itemsize)
    plan, nza = _build_plan(
        indices, rowidx, tableidx, weights, None, list(p), t, batch_size,
        dead_mask=dead_mask, idx_parts=idx_parts, seg=seg, pair=pair)
    nseg = nza // seg

    g0f, gk, tables, widths = _flat_setup(cores, p, q, r, dt)

    stages = []
    if pair:
        g01f = _pair_table(gk, p, q, r, t, dt)
        state = g01f[plan.pair_s2]
        stages.append(None)
        start_ti = 2
    else:
        i0c = jnp.where(plan.alive1, plan.i0_s1, t * p[0])
        state = g0f[i0c]
        start_ti = 1
    for ti in range(start_ti, ndim - 1):
        mm, bw_in, bw_out = widths[ti - 1]
        stages.append(state)
        state = _seg_transform_call(
            nseg, q0, bw_in, bw_out, t * p[ti], dt.name, dt.name,
            interpret, trip=_trip_mode(), seg=seg,
            sb=_sb_for(nza, t * p[ti], seg))(
            plan.runs[ti - 1], plan.first[ti - 1], plan.cnt[ti - 1],
            state, tables[ti - 1])
        state = _perm_rows(state, plan.perm_fwd[ti - 1])
    stages.append(state)

    # cotangents in the last sort space
    dflat = jnp.concatenate([
        d_output.reshape(tb, d).astype(dt),
        jnp.zeros((1, d), dt),
    ])
    rowc = jnp.where(plan.rowidx_last >= 0, plan.rowidx_last, tb)
    dz = dflat[rowc]
    if plan.w_last is not None:
        dz = dz * plan.w_last[:, None].astype(dt)

    li = ndim - 1
    mm, bw_in, bw_out = widths[li - 1]
    acc_t = _acc_transposed(bw_in, bw_out)
    dgbd, dz, rows64 = _seg_fused_i2_call(
        nseg, q0, bw_in, bw_out, t * p[li], dt.name, interpret,
        acc_t=acc_t, trip=_trip_mode(), seg=seg,
        sb=_sb_for(nza, t * p[li], seg))(
        plan.runs[li - 1], plan.first[li - 1], plan.cnt[li - 1],
        stages[li - 1], dz, tables[li - 1])
    dgbd = _acc_to_canonical(dgbd, t * p[li], bw_in, bw_out, acc_t)
    dgs = [None] * ndim
    dgs[li] = _extract_bd_grad(dgbd, mm, r[li], q[li] * r[li + 1])
    out = _pool_flat(rows64, plan, tb, dt).reshape(t, batch_size, d)

    dg0_flat = None
    for ti in range(ndim - 2, 0, -1):
        dz = _perm_rows(dz, plan.perm_bwd[ti - 1])
        mm, bw_in, bw_out = widths[ti - 1]
        z_dt = dt.name if ti > 1 else "float32"
        x_stage = stages[ti - 1]
        if x_stage is None:
            # pair-fusion forward skipped pass 1: recompute z0 here
            i0c = jnp.where(plan.alive1, plan.i0_s1, t * p[0])
            x_stage = g0f[i0c]
        if ti == 1 and _dg0_fused_gate(t * p[0], q0 * bw_in):
            i0c = jnp.where(plan.alive1, plan.i0_s1, t * p[0])
            dgbd, dg0_flat = _seg_accum_i1(
                nseg, q0, bw_in, bw_out, t * p[ti], t * p[0], dt.name,
                interpret, plan.runs[ti - 1], plan.first[ti - 1],
                plan.cnt[ti - 1], x_stage, dz, i0c, tables[ti - 1],
                seg=seg, sb=_sb_for(nza, t * p[ti], seg))
        else:
            dgbd, dz = _seg_accum(
                nseg, q0, bw_in, bw_out, t * p[ti], dt.name, z_dt,
                interpret,
                plan.runs[ti - 1], plan.first[ti - 1], plan.cnt[ti - 1],
                x_stage, dz, tables[ti - 1], seg=seg,
                sb=_sb_for(nza, t * p[ti], seg))
        dgs[ti] = _extract_bd_grad(dgbd, mm, r[ti], q[ti] * r[ti + 1])

    if dg0_flat is not None:
        dgs[0] = dg0_flat.reshape(t * p[0], q0, r[1])
    else:
        i0m = jnp.where(plan.alive1, plan.i0_s1, -1)
        oh0 = (i0m[:, None]
               == jnp.arange(t * p[0], dtype=jnp.int32)[None, :]).astype(
                   jnp.float32)
        dgs[0] = jax.lax.dot_general(
            oh0, dz.astype(jnp.float32), (((0,), (0,)), ((), ())),
            precision=_ONEHOT_PRECISION,
            preferred_element_type=jnp.float32,
        ).reshape(t * p[0], q0, r[1])
    grads = grads_to_module_layout(tuple(dgs), p, q, r, t)
    return out, grads
