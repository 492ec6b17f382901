"""Flat sorted-run TT lookup pipeline (tt_ndim == 3) — the fast train path.

Replaces per-lookup work entirely. The generic kernels
(:mod:`.tt_kernel`) pay ~5 ns of dynamic-access latency per per-lookup
VMEM operation — at the reference benchmark shape
(``/root/reference/README.md:18-20``) that is ~7 ops x 10240 lookups per
direction and dominates the step. Here every stage is either a wide XLA
gather, a one-hot MXU GEMM, or a *segment-grid run kernel* over
lookup-major arrays; nothing touches memory one lookup at a time.

Pipeline (D-order ``(a0, a1, a2)``; rows are lookups, lanes carry the
``q0`` digit as ``blocks`` of width ``w``):

  sort lookups by i1 and (separately) by i2      stable multi-op sorts
  span tables = searchsorted(keys, arange(P))    core row j <-> row span
  z0L   = G0f[idx_s1]                            XLA gather [nnz, q0*r1]
  Z1L   = SegTransform_i1(z0L, G1)               [nnz, q0*q1*r2]
  Z1L2  = Z1L[perm12]                            XLA gather (s1 -> s2)
  rows  = SegTransform_i2(Z1L2, G2bd)            [nnz, D]; G2bd is the
                                                 block-diagonal last core,
                                                 built by one eye-broadcast
  out   = onehot(rowidx_s2) @ rows               one-hot pooling GEMM

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
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SEG = 256           # lookups per grid segment
MAX_SPAN_ROWS = 4096  # cap on distinct core rows (span/accum table size)
_ONEHOT_PRECISION = jax.lax.Precision.HIGHEST


def _cdiv(a, b):
    return -(-a // b)


def flat_available(
    tt_p_shapes: Sequence[int],
    tt_q_shapes: Sequence[int],
    tt_ranks: Sequence[int],
    num_tables: int,
    batch_size: int,
) -> bool:
    """Gates for the flat pipeline (tt_ndim == 3): multiple-of-8 tiling
    gates as the generic kernels, plus the span-table cap."""
    if len(tt_p_shapes) != 3:
        return False
    q = list(tt_q_shapes)
    r = list(tt_ranks)
    if len(r) == 2:
        r = [1] + r + [1]
    if r[1] % 8 != 0 or r[2] % 8 != 0:
        return False
    if (q[1] * r[2]) % 8 != 0 or (q[1] * q[2]) % 8 != 0:
        return False
    if (q[0] * r[1]) % 8 != 0:
        return False
    if (num_tables * batch_size) % 8 != 0:
        return False
    for p_t in (tt_p_shapes[1], tt_p_shapes[2]):
        if num_tables * p_t + 1 > MAX_SPAN_ROWS:
            return False
    return True


# --------------------------------------------------------------- kernels


@functools.lru_cache(maxsize=None)
def _seg_transform_call(nseg, blocks, bw_in, bw_out, p_rows, dt, out_dt,
                        interpret):
    """Segment-grid transform: for each SEG-lookup segment, apply every
    intersecting core row's slab to its row range:
    ``y_b[rows of j] = x_b[rows of j] @ table[j]``."""
    in_w = blocks * bw_in
    out_w = blocks * bw_out
    dt = jnp.dtype(dt)
    out_dt = jnp.dtype(out_dt)

    def kernel(runs_ref, first_ref, cnt_ref, x_ref, t_ref, y_ref):
        si = pl.program_id(0)
        base = si * SEG
        rows = base + jax.lax.broadcasted_iota(
            jnp.int32, (SEG, bw_out), 0)
        xbs = [x_ref[:, b * bw_in:(b + 1) * bw_in] for b in range(blocks)]

        def run_body(k, outs):
            # sentinel spans fold into the row mask (empty) instead of a
            # branch — lax.cond inside the loop measured slower
            j = first_ref[si] + k
            real = j < p_rows
            jc = jnp.minimum(j, p_rows - 1)
            s = runs_ref[jc]
            e = runs_ref[jc + 1]
            slab = t_ref[jc]
            m = (rows >= s) & (rows < e) & real
            return tuple(
                jnp.where(
                    m,
                    jnp.dot(xbs[b], slab,
                            preferred_element_type=jnp.float32
                            ).astype(out_dt),
                    outs[b])
                for b in range(blocks)
            )

        outs0 = tuple(
            jnp.zeros((SEG, bw_out), out_dt) for _ in range(blocks))
        outs = jax.lax.fori_loop(0, cnt_ref[si], run_body, outs0)
        for b in range(blocks):
            y_ref[:, b * bw_out:(b + 1) * bw_out] = outs[b]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nseg,),
        in_specs=[
            pl.BlockSpec((SEG, in_w), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((SEG, out_w), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nseg * SEG, out_w), out_dt),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


@functools.lru_cache(maxsize=None)
def _seg_accum_call(nseg, blocks, bw_x, bw_y, p_rows, dt, z_dt, interpret):
    """Segment-grid accumulate + NT-transform: for each segment and each
    intersecting core row j,

      acc[j] += sum over blocks b of x_b[rows of j]^T @ y_b[rows of j]
      z_b[rows of j] = y_b[rows of j] @ table[j]^T   (NT dims)

    acc is a VMEM-resident fp32 accumulator shared by all grid steps
    (sequential on TPU, so the read-modify-write is race-free)."""
    x_w = blocks * bw_x
    y_w = blocks * bw_y
    dt = jnp.dtype(dt)
    z_dt = jnp.dtype(z_dt)

    def kernel(runs_ref, first_ref, cnt_ref, x_ref, y_ref, t_ref,
               acc_ref, z_ref):
        si = pl.program_id(0)

        @pl.when(si == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        base = si * SEG
        rows = base + jax.lax.broadcasted_iota(jnp.int32, (SEG, bw_y), 0)
        xbs = [x_ref[:, b * bw_x:(b + 1) * bw_x] for b in range(blocks)]
        ybs = [y_ref[:, b * bw_y:(b + 1) * bw_y] for b in range(blocks)]

        def run_body(k, zs):
            # sentinel spans contribute zero via the row mask; the
            # accumulator add is then harmless on the clamped row
            j = first_ref[si] + k
            real = j < p_rows
            jc = jnp.minimum(j, p_rows - 1)
            s = runs_ref[jc]
            e = runs_ref[jc + 1]
            slab = t_ref[jc]
            m = (rows >= s) & (rows < e) & real
            a = jnp.zeros((bw_x, bw_y), jnp.float32)
            new_zs = []
            for b in range(blocks):
                ybm = jnp.where(m, ybs[b], jnp.zeros((SEG, bw_y), dt))
                a = a + jax.lax.dot_general(
                    xbs[b], ybm, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                zb = jax.lax.dot_general(
                    ybm, slab, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                new_zs.append(zs[b] + zb.astype(z_dt))
            acc_ref[jc] += a
            return tuple(new_zs)

        zs0 = tuple(jnp.zeros((SEG, bw_x), z_dt) for _ in range(blocks))
        zs = jax.lax.fori_loop(0, cnt_ref[si], run_body, zs0)
        for b in range(blocks):
            z_ref[:, b * bw_x:(b + 1) * bw_x] = zs[b]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nseg,),
        in_specs=[
            pl.BlockSpec((SEG, x_w), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SEG, y_w), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((p_rows, bw_x, bw_y), lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SEG, x_w), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((p_rows, bw_x, bw_y), jnp.float32),
            jax.ShapeDtypeStruct((nseg * SEG, x_w), z_dt),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )




@functools.lru_cache(maxsize=None)
def _seg_fused_i2_call(nseg, blocks, bw_x, bw_y, p_rows, dt, interpret):
    """Fused last-core pass for the train step (d_output known up front):
    per segment and intersecting core row j,

      rows_b[rows of j] = x_b[rows of j] @ table[j]        (forward)
      z_b[rows of j]    = y_b[rows of j] @ table[j]^T      (dZ1, NT dims)
      acc[j]           += sum_b x_b^T @ y_b                (dG2)

    One grid pass instead of a transform + an accum pass — the segment's
    x/y loads and span logic are shared."""
    x_w = blocks * bw_x
    y_w = blocks * bw_y
    dt = jnp.dtype(dt)

    def kernel(runs_ref, first_ref, cnt_ref, x_ref, y_ref, t_ref,
               acc_ref, z_ref, rows_ref):
        si = pl.program_id(0)

        @pl.when(si == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        base = si * SEG
        rows_i = base + jax.lax.broadcasted_iota(
            jnp.int32, (SEG, max(bw_y, bw_x)), 0)
        m_y = rows_i[:, :bw_y]
        m_x = rows_i[:, :bw_x]
        xbs = [x_ref[:, b * bw_x:(b + 1) * bw_x] for b in range(blocks)]
        ybs = [y_ref[:, b * bw_y:(b + 1) * bw_y] for b in range(blocks)]

        def run_body(k, carry):
            zs, rs = carry
            j = first_ref[si] + k
            real = j < p_rows
            jc = jnp.minimum(j, p_rows - 1)
            s = runs_ref[jc]
            e = runs_ref[jc + 1]
            slab = t_ref[jc]
            my = (m_y >= s) & (m_y < e) & real
            mx = (m_x >= s) & (m_x < e) & real
            a = jnp.zeros((bw_x, bw_y), jnp.float32)
            new_zs, new_rs = [], []
            for b in range(blocks):
                ybm = jnp.where(my, ybs[b], jnp.zeros((SEG, bw_y), dt))
                a = a + jax.lax.dot_general(
                    xbs[b], ybm, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                zb = jax.lax.dot_general(
                    ybm, slab, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                new_zs.append(jnp.where(mx, zb.astype(dt), zs[b]))
                rb = jnp.dot(xbs[b], slab,
                             preferred_element_type=jnp.float32)
                new_rs.append(jnp.where(my, rb.astype(dt), rs[b]))
            acc_ref[jc] += a
            return tuple(new_zs), tuple(new_rs)

        zs0 = tuple(jnp.zeros((SEG, bw_x), dt) for _ in range(blocks))
        rs0 = tuple(jnp.zeros((SEG, bw_y), dt) for _ in range(blocks))
        zs, rs = jax.lax.fori_loop(0, cnt_ref[si], run_body, (zs0, rs0))
        for b in range(blocks):
            z_ref[:, b * bw_x:(b + 1) * bw_x] = zs[b]
            rows_ref[:, b * bw_y:(b + 1) * bw_y] = rs[b]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nseg,),
        in_specs=[
            pl.BlockSpec((SEG, x_w), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SEG, y_w), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((p_rows, bw_x, bw_y), lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SEG, x_w), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SEG, y_w), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((p_rows, bw_x, bw_y), jnp.float32),
            jax.ShapeDtypeStruct((nseg * SEG, x_w), dt),
            jax.ShapeDtypeStruct((nseg * SEG, y_w), dt),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


# ----------------------------------------------------------- host glue


class FlatPlan(NamedTuple):
    """Sorted orders, span tables, and per-segment run bounds shared by
    forward and backward. All per-lookup arrays have NZA entries (nnz
    padded to whole SEG-lookup segments; pad rows carry sentinel keys)."""

    idx_s1: jnp.ndarray       # [NZA] row ids in i1-sorted order
    i0_s1: jnp.ndarray        # [NZA] first-core rows (table-combined)
    alive1: jnp.ndarray       # [NZA] bool, real & live, s1 order
    runs1: jnp.ndarray        # [T*p1 + 2] span starts by core row
    first1: jnp.ndarray       # [nseg] first span per segment
    cnt1: jnp.ndarray         # [nseg] spans per segment
    rowidx_s2: jnp.ndarray    # [NZA] pooled-row ids (combined), -1 = pad
    w_s2: Optional[jnp.ndarray]
    runs2: jnp.ndarray
    first2: jnp.ndarray
    cnt2: jnp.ndarray
    perm12: jnp.ndarray       # [NZA] s2 position -> s1 position
    perm21: jnp.ndarray       # [NZA] s1 position -> s2 position


def _span_table(key_sorted: jnp.ndarray, p_rows: int, nseg: int):
    """(spans by core row, per-segment first span, per-segment span
    count) from the sorted keys — all via searchsorted, no scatters."""
    edges = jnp.arange(p_rows + 2, dtype=jnp.int32)
    runs = jnp.searchsorted(
        key_sorted.astype(jnp.int32), edges, side="left"
    ).astype(jnp.int32)
    seg_starts = jnp.arange(nseg, dtype=jnp.int32) * SEG
    first = (jnp.searchsorted(runs, seg_starts, side="right") - 1
             ).astype(jnp.int32)
    last = (jnp.searchsorted(runs, seg_starts + (SEG - 1), side="right") - 1
            ).astype(jnp.int32)
    return runs, first, (last - first + 1).astype(jnp.int32)


def _invert_perm(perm: jnp.ndarray) -> jnp.ndarray:
    """Inverse permutation by sorting (an [n] scatter costs ~10x more on
    TPU than carrying iota through a sort)."""
    n = perm.shape[0]
    _, inv = jax.lax.sort(
        [perm, jnp.arange(n, dtype=jnp.int32)], num_keys=1, is_stable=True)
    return inv


def _build_plan(indices, rowidx, tableidx, weights, live_count,
                tt_p_shapes, num_tables, batch_size, dead_mask=None,
                idx_parts=None):
    from fbtt_embedding_tpu.ops.indexing import tt_strides

    p0, p1, p2 = tt_p_shapes
    nnz = rowidx.shape[0]
    nza = _cdiv(nnz, SEG) * SEG
    nseg = nza // SEG

    if idx_parts is not None:
        # precomputed per-core indices (the int64 row-id path decomposes
        # on the host; everything on device stays int32)
        i0 = idx_parts[0].astype(jnp.int32)
        i1 = idx_parts[1].astype(jnp.int32)
        i2 = idx_parts[2].astype(jnp.int32)
    else:
        strides = tt_strides(tt_p_shapes)
        idx32 = indices.astype(jnp.int32)
        i1 = (idx32 // int(strides[1])) % p1
        i2 = idx32 % p2
        i0 = idx32 // int(strides[0])
    if tableidx is not None and num_tables > 1:
        t32 = tableidx.astype(jnp.int32)
        i0 = i0 + t32 * p0
        i1 = i1 + t32 * p1
        i2 = i2 + t32 * p2
        rowc = rowidx.astype(jnp.int32) + t32 * batch_size
    else:
        rowc = rowidx.astype(jnp.int32)

    sent1 = int(num_tables * p1)
    sent2 = int(num_tables * p2)
    if dead_mask is not None:
        dead = dead_mask
    elif live_count is not None:
        pos = jnp.arange(nnz, dtype=jnp.int32)
        dead = pos >= live_count.astype(jnp.int32).reshape(())
    else:
        dead = None
    if dead is not None:
        key1 = jnp.where(dead, jnp.int32(sent1), i1)
        key2 = jnp.where(dead, jnp.int32(sent2), i2)
    else:
        key1, key2 = i1, i2

    padn = nza - nnz
    key1 = jnp.pad(key1, (0, padn), constant_values=sent1)
    key2 = jnp.pad(key2, (0, padn), constant_values=sent2)
    i0p = jnp.pad(i0, (0, padn))
    rowp = jnp.pad(rowc, (0, padn), constant_values=-1)
    posp = jnp.arange(nza, dtype=jnp.int32)
    wp = (jnp.pad(weights.astype(jnp.float32), (0, padn))
          if weights is not None else None)

    k1s, i0_s1, pos_s1 = jax.lax.sort(
        [key1, i0p, posp], num_keys=1, is_stable=True)
    idx_s1 = i0_s1  # shape carrier; flat row ids are never needed sorted
    # orig position -> s1 slot, carried through the s2 sort so perm12
    # needs no gather afterwards
    inv1 = _invert_perm(pos_s1)
    ops2 = [key2, rowp, inv1] + ([wp] if wp is not None else [])
    s2 = jax.lax.sort(ops2, num_keys=1, is_stable=True)
    k2s, row_s2, perm12 = s2[:3]
    w_s2 = s2[3] if wp is not None else None
    perm21 = _invert_perm(perm12)

    runs1, first1, cnt1 = _span_table(k1s, sent1, nseg)
    runs2, first2, cnt2 = _span_table(k2s, sent2, nseg)

    alive1 = k1s < sent1
    return FlatPlan(
        idx_s1=idx_s1, i0_s1=i0_s1, alive1=alive1,
        runs1=runs1, first1=first1, cnt1=cnt1,
        rowidx_s2=row_s2, w_s2=w_s2,
        runs2=runs2, first2=first2, cnt2=cnt2,
        perm12=perm12, perm21=perm21,
    ), nza


def _g2_blockdiag(g2k: jnp.ndarray, q1: int, r2: int, q2: int, dt):
    """[tp2, r2, q2] last core -> [tp2, q1*r2, q1*q2] block-diagonal via
    one eye-broadcast fusion."""
    eye = jnp.eye(q1, dtype=dt)
    bd = (eye[None, :, None, :, None]
          * g2k.astype(dt)[:, None, :, None, :])
    return bd.reshape(g2k.shape[0], q1 * r2, q1 * q2)


def _extract_g2_grad(dg2bd: jnp.ndarray, q1: int, r2: int, q2: int):
    """Sum the diagonal blocks of the block-diagonal gradient."""
    out = None
    for a in range(q1):
        blk = dg2bd[:, a * r2:(a + 1) * r2, a * q2:(a + 1) * q2]
        out = blk if out is None else out + blk
    return out


# one-hot pooling costs O(tb * nnz * D) MXU FLOPs — ~20x cheaper than
# segment_sum at B=512 but quadratic-feeling at large batch; switch over
# when the one-hot would dominate (measured crossover ~tb 4k)
_POOL_ONEHOT_MAX_TB = 4096


def _pool_flat(rows64, plan, tb, dt):
    """Pool per-lookup rows (s2 order) into [tb, d]: one-hot MXU GEMM for
    small batches, segment_sum for large ones."""
    if tb <= _POOL_ONEHOT_MAX_TB:
        iota_b = jnp.arange(tb, dtype=jnp.int32)
        hit = plan.rowidx_s2[None, :] == iota_b[:, None]
        if plan.w_s2 is not None:
            oh = jnp.where(hit, plan.w_s2[None, :], 0.0).astype(dt)
        else:
            oh = hit.astype(dt)
        return jax.lax.dot_general(
            oh, rows64, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [tb, d] fp32
    rows_f = rows64.astype(jnp.float32)
    if plan.w_s2 is not None:
        rows_f = rows_f * plan.w_s2[:, None]
    seg = jnp.where(plan.rowidx_s2 >= 0, plan.rowidx_s2, tb)
    return jax.ops.segment_sum(rows_f, seg, num_segments=tb + 1)[:tb]


def flat_lookup_forward(cores, tt_p_shapes, tt_q_shapes, tt_ranks,
                        batch_size, plan: FlatPlan, nza,
                        compute_dtype=jnp.float32, interpret=False):
    """Pooled forward on the flat pipeline -> ([T, B, D], residual flats)."""
    from fbtt_embedding_tpu.ops.pallas.tt_kernel import kernel_core_layouts

    p = tuple(tt_p_shapes)
    q = tuple(tt_q_shapes)
    r = tuple(tt_ranks)
    q0, q1, q2 = q
    r1, r2 = r[1], r[2]
    t = cores[0].shape[0]
    tb = t * batch_size
    d = q0 * q1 * q2
    nseg = nza // SEG

    dt = jnp.dtype(compute_dtype)
    g0k, g1k, g2k = kernel_core_layouts(cores, p, q, r)
    # one zero row appended: dead/pad lookups gather row tp0 instead of
    # being masked with a multiply afterwards. Cores are cast to the
    # compute dtype here (fp32 master weights stay in the module).
    g0f = jnp.concatenate([
        g0k.reshape(t * p[0], q0 * r1),
        jnp.zeros((1, q0 * r1), jnp.float32),
    ]).astype(dt)
    g2bd = _g2_blockdiag(g2k, q1, r2, q2, dt)

    i0c = jnp.where(plan.alive1, plan.i0_s1, t * p[0])
    z0L = g0f[i0c]  # [nza, q0*r1], lookup-major

    z1 = _seg_transform_call(nseg, q0, r1, q1 * r2, t * p[1], dt.name,
                             dt.name, interpret)(
        plan.runs1, plan.first1, plan.cnt1, z0L, g1k.astype(dt))

    z1L2 = z1[plan.perm12]  # lookup-grain permute s1 -> s2

    rows64 = _seg_transform_call(nseg, q0, q1 * r2, q1 * q2, t * p[2],
                                 dt.name, dt.name, interpret)(
        plan.runs2, plan.first2, plan.cnt2, z1L2, g2bd)

    out = _pool_flat(rows64, plan, tb, dt)
    return out.reshape(t, batch_size, d), (z0L, z1L2)


def flat_lookup_backward(cores, tt_p_shapes, tt_q_shapes, tt_ranks,
                         batch_size, plan: FlatPlan, nza,
                         z0L, z1L2, d_output, compute_dtype=jnp.float32,
                         interpret=False):
    """Backward on the flat pipeline -> core grads in module layout."""
    from fbtt_embedding_tpu.ops.pallas.tt_kernel import (
        grads_to_module_layout,
        kernel_core_layouts,
    )

    p = tuple(tt_p_shapes)
    q = tuple(tt_q_shapes)
    r = tuple(tt_ranks)
    q0, q1, q2 = q
    r1, r2 = r[1], r[2]
    t = cores[0].shape[0]
    d = q0 * q1 * q2
    nseg = nza // SEG

    dt = jnp.dtype(compute_dtype)
    g0k, g1k, g2k = kernel_core_layouts(cores, p, q, r)
    g2bd = _g2_blockdiag(g2k, q1, r2, q2, dt)

    # per-lookup cotangents in s2 order (one zero row appended to dout so
    # pad rows gather zeros instead of being masked)
    dflat = jnp.concatenate([
        d_output.reshape(t * batch_size, d).astype(dt),
        jnp.zeros((1, d), dt),
    ])
    rowc = jnp.where(plan.rowidx_s2 >= 0, plan.rowidx_s2, t * batch_size)
    drsL = dflat[rowc]
    if plan.w_s2 is not None:
        drsL = drsL * plan.w_s2[:, None].astype(dt)

    dg2bd, dz1L2 = _seg_accum_call(nseg, q0, q1 * r2, q1 * q2, t * p[2],
                                   dt.name, dt.name, interpret)(
        plan.runs2, plan.first2, plan.cnt2, z1L2, drsL, g2bd)
    dg2 = _extract_g2_grad(dg2bd, q1, r2, q2)  # [tp2, r2, q2]

    dz1L = dz1L2[plan.perm21]  # lookup-grain permute s2 -> s1

    dg1, dz0L = _seg_accum_call(nseg, q0, r1, q1 * r2, t * p[1],
                                dt.name, "float32", interpret)(
        plan.runs1, plan.first1, plan.cnt1, z0L, dz1L, g1k.astype(dt))

    # dG0: one exact-fp32 one-hot GEMM over lookups (s1 order)
    i0c = jnp.where(plan.alive1, plan.i0_s1, -1)
    oh0 = (i0c[:, None]
           == jnp.arange(t * p[0], dtype=jnp.int32)[None, :]).astype(
               jnp.float32)
    dg0f = jax.lax.dot_general(
        oh0, dz0L, (((0,), (0,)), ((), ())),
        precision=_ONEHOT_PRECISION,
        preferred_element_type=jnp.float32,
    )  # [tp0, q0*r1]
    dg0 = dg0f.reshape(t * p[0], q0, r1)
    return grads_to_module_layout((dg0, dg1, dg2), p, q, r, t)


@functools.lru_cache(maxsize=None)
def make_flat_vjp(p, q, r, num_tables, batch_size, has_tableidx,
                  has_weights, has_live, interpret,
                  compute_dtype="float32", live_is_mask=False,
                  parts_mode=False):
    """custom_vjp pooled lookup over the flat pipeline.

    The plan (sorts, span tables, permutations) and the forward's flat
    intermediates are computed once and shared: the backward reuses
    ``Z1L2`` (saved, s2 order) instead of recomputing it — the save is
    ~nnz*q0*q1*r2 in the compute dtype, traded for a whole kernel.
    """
    pl_, ql_, rl_ = list(p), list(q), list(r)
    cdt = jnp.dtype(compute_dtype)

    def fwd_impl(cores, indices, rowidx, tableidx, weights, live):
        plan, nza = _build_plan(
            None if parts_mode else indices, rowidx,
            tableidx if has_tableidx else None,
            weights if has_weights else None,
            live if (has_live and not live_is_mask) else None,
            pl_, num_tables, batch_size,
            dead_mask=(live if (has_live and live_is_mask) else None),
            idx_parts=indices if parts_mode else None)
        out, flats = flat_lookup_forward(
            cores, pl_, ql_, rl_, batch_size, plan, nza,
            compute_dtype=cdt, interpret=interpret)
        return out, (plan, nza, flats)

    @jax.custom_vjp
    def fn(cores, indices, rowidx, tableidx, weights, live):
        return fwd_impl(cores, indices, rowidx, tableidx, weights, live)[0]

    def fn_fwd(cores, indices, rowidx, tableidx, weights, live):
        out, ctx = fwd_impl(cores, indices, rowidx, tableidx, weights, live)
        plan, nza, flats = ctx
        return out, (cores, plan, flats, rowidx.shape[0])

    def fn_bwd(res, d_output):
        cores, plan, (z0L, z1L2), nnz = res
        nza = plan.idx_s1.shape[0]
        grads = flat_lookup_backward(
            cores, pl_, ql_, rl_, batch_size, plan, nza,
            z0L, z1L2, d_output, compute_dtype=cdt, interpret=interpret)
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
    API semantics): fwd and bwd share the plan, z0L, Z1L, and ONE fused
    last-core kernel (rows + dZ1 + dG2 together). Returns
    (pooled output [T, B, D], core grads in module layout)."""
    from fbtt_embedding_tpu.ops.pallas.tt_kernel import (
        grads_to_module_layout,
        kernel_core_layouts,
    )

    p = tuple(tt_p_shapes)
    q = tuple(tt_q_shapes)
    r = tuple(tt_ranks)
    q0, q1, q2 = q
    r1, r2 = r[1], r[2]
    t = cores[0].shape[0]
    tb = t * batch_size
    d = q0 * q1 * q2

    plan, nza = _build_plan(
        indices, rowidx, tableidx, weights, None, list(p), t, batch_size,
        dead_mask=dead_mask, idx_parts=idx_parts)
    nseg = nza // SEG

    dt = jnp.dtype(compute_dtype)
    g0k, g1k, g2k = kernel_core_layouts(cores, p, q, r)
    g0f = jnp.concatenate([
        g0k.reshape(t * p[0], q0 * r1),
        jnp.zeros((1, q0 * r1), jnp.float32),
    ]).astype(dt)
    g1c = g1k.astype(dt)
    g2bd = _g2_blockdiag(g2k, q1, r2, q2, dt)

    i0c = jnp.where(plan.alive1, plan.i0_s1, t * p[0])
    z0L = g0f[i0c]
    z1 = _seg_transform_call(nseg, q0, r1, q1 * r2, t * p[1], dt.name,
                             dt.name, interpret)(
        plan.runs1, plan.first1, plan.cnt1, z0L, g1c)
    z1L2 = z1[plan.perm12]

    # cotangents in s2 order
    dflat = jnp.concatenate([
        d_output.reshape(tb, d).astype(dt),
        jnp.zeros((1, d), dt),
    ])
    rowc = jnp.where(plan.rowidx_s2 >= 0, plan.rowidx_s2, tb)
    drsL = dflat[rowc]
    if plan.w_s2 is not None:
        drsL = drsL * plan.w_s2[:, None].astype(dt)

    dg2bd, dz1L2, rows64 = _seg_fused_i2_call(
        nseg, q0, q1 * r2, q1 * q2, t * p[2], dt.name, interpret)(
        plan.runs2, plan.first2, plan.cnt2, z1L2, drsL, g2bd)
    dg2 = _extract_g2_grad(dg2bd, q1, r2, q2)

    out = _pool_flat(rows64, plan, tb, dt).reshape(t, batch_size, d)

    dz1L = dz1L2[plan.perm21]
    dg1, dz0L = _seg_accum_call(nseg, q0, r1, q1 * r2, t * p[1],
                                dt.name, "float32", interpret)(
        plan.runs1, plan.first1, plan.cnt1, z0L, dz1L, g1c)

    i0m = jnp.where(plan.alive1, plan.i0_s1, -1)
    oh0 = (i0m[:, None]
           == jnp.arange(t * p[0], dtype=jnp.int32)[None, :]).astype(
               jnp.float32)
    dg0 = jax.lax.dot_general(
        oh0, dz0L, (((0,), (0,)), ((), ())),
        precision=_ONEHOT_PRECISION,
        preferred_element_type=jnp.float32,
    ).reshape(t * p[0], q0, r1)
    grads = grads_to_module_layout((dg0, dg1, dg2), p, q, r, t)
    return out, grads
