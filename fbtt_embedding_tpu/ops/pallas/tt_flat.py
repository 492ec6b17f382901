"""Flat sorted-run TT lookup pipeline (tt_ndim == 3) — the fast train path.

Replaces per-lookup work entirely. The generic kernels
(:mod:`.tt_kernel`) pay ~5 ns of dynamic-access latency per per-lookup
VMEM operation — at the reference benchmark shape
(``/root/reference/README.md:18-20``) that is ~7 ops x 10240 lookups per
direction and dominates the step. Here every stage is either a wide XLA
gather, a one-hot MXU GEMM, or a *keyed run-GEMM* Pallas kernel over
arrays of flat rows; nothing touches memory one lookup at a time.

Pipeline (D-order ``(a0, a1, a2)``; "flat rows" are ``(lookup, a0)`` pairs):

  sort lookups by i1 and (separately) by i2      2 stable multi-op sorts
  run tables = searchsorted(keys, arange(P))     key j <-> grid program j
  z0F   = G0f[idx_s1]                            XLA gather [nnz, q0*r1]
  Z1F   = RunTransform_i1(z0F, G1)               [NF, q1*r2]
  Z1F2  = Z1F[perm12 at flat-row grain]          XLA gather (s1 -> s2)
  rows  = RunTransform_i2(Z1F2, G2bd)            [NF, q1*q2]; G2bd is the
                                                 block-diagonal last core,
                                                 built by one eye-broadcast
  out   = onehot(rowidx_s2) @ rows64             one-hot pooling GEMM

  backward:
  drsF  = (dout[rowidx_s2] * w).reshape          XLA gather [NF, q1*q2]
  dZ1F2, dG2bd = RunAccum_i2(Z1F2, drsF, G2bd)   one kernel: NT-transform
                                                 + per-run accumulation
  dZ1F  = dZ1F2[perm21]                          XLA gather (s2 -> s1)
  dz0F, dG1 = RunAccum_i1(z0F, dZ1F, G1)         one kernel
  dG0   = onehot(i0_s1)^T @ dz0F-as-[nnz,q0*r1]  exact-fp32 one-hot GEMM
  dG2   = sum of diagonal blocks of dG2bd

Run kernels: sortedness means the rows for core index ``j`` are exactly
``[searchsorted(keys, j), searchsorted(keys, j+1))`` — grid program ``j``
owns that span, reads its core slab ONCE, and sweeps it in ``SEG``-row
segments with plain MXU GEMMs. Boundary rows are handled by an iota mask;
a run's overhang into the next run is rewritten by that run (grid steps
execute in order on TPU); empty runs cost one skipped program. Total slab
reads are O(p_t), not O(nnz); total row traffic is O(nnz).

Device-trace-driven design notes (all measured on v5e):
  * run tables via two scatter-min/max were 92 us each; searchsorted over
    the sorted keys is ~free and makes the grid static (j == program id).
  * "transposed" operand forms use NT dimension numbers in-kernel; a host
    ``transpose`` of the middle core cost ~200 us/step.
  * the block-diagonal last core is ONE broadcast-multiply (eye x core);
    building it with ``.at[].set`` cost 3 dynamic-update-slices x 107 us.
  * permutes gather at flat-row granularity: reshaping [nnz, q0*w] <->
    [nnz*q0, w] is a physical re-tile (~30 us per 21 MB) that the
    flat-grain gather avoids.

Cache-served lookups (live-first packed by the caller, ``live_count``)
and padding get a sentinel sort key: they cluster into the final run,
which the kernels zero-fill instead of compute — the reference's
cub-partition compute saving (``tt_embeddings_cuda.cu:1436-1488``) with
static shapes.

Reference anchors replaced: the whole CUDA hot path —
``tt_embeddings_cuda.cu:964-1075`` (forward chain), ``:920-962``
(pooling), ``:419-652`` (backward recompute + grad GEMMs + atomicAdd).
Numerics: fp32 storage and accumulation, MXU multiplies in bf16 (DEFAULT
TPU precision); dG0 reduction at HIGHEST (exact fp32). Interpreter mode
(CPU tests) is exact fp32.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SEG = 512           # flat rows per GEMM segment
MAX_RUN_PROGRAMS = 4096  # cap on grid size (= distinct core rows + 1)
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
    """Gates for the flat pipeline (tt_ndim == 3).

    Multiple-of-8 tiling gates as the generic kernels, plus a grid cap:
    one grid program per distinct core row, so huge p1/p2 fall back to
    the generic kernels.
    """
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
    if SEG % q[0] != 0:
        return False
    if (num_tables * batch_size) % 8 != 0:
        return False
    for p_t in (tt_p_shapes[1], tt_p_shapes[2]):
        if num_tables * p_t + 1 > MAX_RUN_PROGRAMS:
            return False
    return True


# --------------------------------------------------------------- kernels


@functools.lru_cache(maxsize=None)
def _run_transform_call(n_rows, in_w, out_w, p_rows, interpret):
    """y[s_j:e_j] = x[s_j:e_j] @ table[j] for every core row j; the final
    (sentinel) program zero-fills its span instead."""

    def kernel(runs_ref, x_ref, t_ref, y_ref):
        j = pl.program_id(0)
        s = runs_ref[j]
        e = runs_ref[j + 1]
        nseg = _cdiv(e - s, SEG)

        @pl.when(j < p_rows)
        def _():
            slab = t_ref[j]

            def seg(si, _):
                st = s + si * SEG
                out = jnp.dot(x_ref[pl.ds(st, SEG), :], slab,
                              preferred_element_type=jnp.float32)
                rows = st + jax.lax.broadcasted_iota(
                    jnp.int32, (SEG, out_w), 0)
                y_ref[pl.ds(st, SEG), :] = jnp.where(rows < e, out, 0.0)
                return 0

            jax.lax.fori_loop(0, nseg, seg, 0)

        @pl.when(j >= p_rows)
        def _():
            # sentinel span: cache-served / padding rows -> zeros
            def seg(si, _):
                st = s + si * SEG
                y_ref[pl.ds(st, SEG), :] = jnp.zeros(
                    (SEG, out_w), jnp.float32)
                return 0

            jax.lax.fori_loop(0, nseg, seg, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(p_rows + 1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_rows, out_w), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
    )


@functools.lru_cache(maxsize=None)
def _run_accum_call(n_rows, x_w, y_w, p_rows, interpret):
    """For every core row j over its span [s_j, e_j):

      acc[j] = x^T @ y                       (fp32 accumulation)
      z      = y @ table[j]^T                (NT dimension numbers)

    The sentinel program zero-fills z; program 0 zeroes acc (Pallas
    outputs are uninitialized, and untouched core rows must read 0)."""

    def kernel(runs_ref, x_ref, y_ref, t_ref, acc_ref, z_ref):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        s = runs_ref[j]
        e = runs_ref[j + 1]
        nseg = _cdiv(e - s, SEG)

        @pl.when(j < p_rows)
        def _():
            slab = t_ref[j]  # [x_w, y_w]

            def seg(si, a):
                st = s + si * SEG
                rows_y = st + jax.lax.broadcasted_iota(
                    jnp.int32, (SEG, y_w), 0)
                yseg = jnp.where(
                    rows_y < e, y_ref[pl.ds(st, SEG), :], 0.0)
                xseg = x_ref[pl.ds(st, SEG), :]
                a = a + jax.lax.dot_general(
                    xseg, yseg, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                z_ref[pl.ds(st, SEG), :] = jax.lax.dot_general(
                    yseg, slab, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return a

            a = jax.lax.fori_loop(
                0, nseg, seg, jnp.zeros((x_w, y_w), jnp.float32))
            acc_ref[j] = a

        @pl.when(j >= p_rows)
        def _():
            def seg(si, _):
                st = s + si * SEG
                z_ref[pl.ds(st, SEG), :] = jnp.zeros(
                    (SEG, x_w), jnp.float32)
                return 0

            jax.lax.fori_loop(0, nseg, seg, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(p_rows + 1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    )
    return pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((p_rows, x_w, y_w), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, x_w), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
    )


# ----------------------------------------------------------- host glue


class FlatPlan(NamedTuple):
    """Sorted orders + run tables shared by forward and backward.

    All per-lookup arrays have NZA entries (nnz padded to whole
    SEG/q0-lookup chunks plus one sentinel chunk) so the kernels' flat-row
    arrays are exactly ``NZA * q0`` rows with every row covered by a run —
    no host-side pad/slice of wide data arrays anywhere.
    """

    idx_s1: jnp.ndarray       # [NZA] row ids in i1-sorted order
    i0_s1: jnp.ndarray        # [NZA] first-core rows (table-combined)
    alive1: jnp.ndarray       # [NZA] bool, real & live, s1 order
    runs1: jnp.ndarray        # [T*p1 + 2] flat-row span starts by key
    rowidx_s2: jnp.ndarray    # [NZA] pooled-row ids (combined), -1 = pad
    w_s2: Optional[jnp.ndarray]
    runs2: jnp.ndarray        # [T*p2 + 2]
    perm12f: jnp.ndarray      # [NZA*q0] flat-row gather map (s1 -> s2 use)
    perm21f: jnp.ndarray      # [NZA*q0]


def _span_table(key_sorted: jnp.ndarray, q0: int, p_rows: int):
    """Flat-row span starts per key: spans[j] = q0 * first position with
    key >= j. Key j's rows are [spans[j], spans[j+1]); key p_rows is the
    sentinel span."""
    edges = jnp.arange(p_rows + 2, dtype=jnp.int32)
    pos = jnp.searchsorted(key_sorted.astype(jnp.int32), edges, side="left")
    return (pos * q0).astype(jnp.int32)


def _flat_perm(perm_lk: jnp.ndarray, q0: int) -> jnp.ndarray:
    """Lookup-level permutation -> flat-row permutation (free fusion)."""
    return (perm_lk[:, None] * q0
            + jnp.arange(q0, dtype=jnp.int32)[None, :]).reshape(-1)


def _build_plan(indices, rowidx, tableidx, weights, live_count,
                tt_p_shapes, q0, num_tables, batch_size):
    from fbtt_embedding_tpu.ops.indexing import tt_strides

    p0, p1, p2 = tt_p_shapes
    strides = tt_strides(tt_p_shapes)
    nnz = indices.shape[0]
    lk_chunk = SEG // q0
    nza = _cdiv(nnz, lk_chunk) * lk_chunk + lk_chunk

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
    pos = jnp.arange(nnz, dtype=jnp.int32)
    if live_count is not None:
        live = live_count.astype(jnp.int32).reshape(())
        dead = pos >= live
        key1 = jnp.where(dead, jnp.int32(sent1), i1)
        key2 = jnp.where(dead, jnp.int32(sent2), i2)
    else:
        key1, key2 = i1, i2

    padn = nza - nnz
    key1 = jnp.pad(key1, (0, padn), constant_values=sent1)
    key2 = jnp.pad(key2, (0, padn), constant_values=sent2)
    idx32p = jnp.pad(idx32, (0, padn))
    i0p = jnp.pad(i0, (0, padn))
    rowp = jnp.pad(rowc, (0, padn), constant_values=-1)
    posp = jnp.arange(nza, dtype=jnp.int32)
    wp = (jnp.pad(weights.astype(jnp.float32), (0, padn))
          if weights is not None else None)

    k1s, idx_s1, i0_s1, pos_s1 = jax.lax.sort(
        [key1, idx32p, i0p, posp], num_keys=1, is_stable=True)
    ops2 = [key2, rowp, posp] + ([wp] if wp is not None else [])
    s2 = jax.lax.sort(ops2, num_keys=1, is_stable=True)
    k2s, row_s2, pos_s2 = s2[:3]
    w_s2 = s2[3] if wp is not None else None

    runs1 = _span_table(k1s, q0, sent1)
    runs2 = _span_table(k2s, q0, sent2)

    # perm12[k2] = s1-position of the lookup at s2-position k2
    inv1 = jnp.zeros((nza,), jnp.int32).at[pos_s1].set(posp)
    perm12 = inv1[pos_s2]
    inv2 = jnp.zeros((nza,), jnp.int32).at[pos_s2].set(posp)
    perm21 = inv2[pos_s1]

    alive1 = k1s < sent1
    return FlatPlan(
        idx_s1=idx_s1, i0_s1=i0_s1, alive1=alive1, runs1=runs1,
        rowidx_s2=row_s2, w_s2=w_s2, runs2=runs2,
        perm12f=_flat_perm(perm12, q0), perm21f=_flat_perm(perm21, q0),
    ), nza


def _g2_blockdiag(g2k: jnp.ndarray, q1: int, r2: int, q2: int):
    """[tp2, r2, q2] last core -> [tp2, q1*r2, q1*q2] block-diagonal via
    one eye-broadcast fusion (NOT .at[].set — dynamic-update-slices cost
    ~107 us each on the device trace)."""
    eye = jnp.eye(q1, dtype=jnp.float32)
    bd = (eye[None, :, None, :, None]
          * g2k[:, None, :, None, :])  # [tp2, q1, r2, q1, q2]
    return bd.reshape(g2k.shape[0], q1 * r2, q1 * q2)


def _extract_g2_grad(dg2bd: jnp.ndarray, q1: int, r2: int, q2: int):
    """Sum the diagonal blocks of the block-diagonal gradient."""
    out = None
    for a in range(q1):
        blk = dg2bd[:, a * r2:(a + 1) * r2, a * q2:(a + 1) * q2]
        out = blk if out is None else out + blk
    return out


def flat_lookup_forward(cores, tt_p_shapes, tt_q_shapes, tt_ranks,
                        batch_size, plan: FlatPlan, nza,
                        interpret=False):
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
    n_rows = nza * q0

    g0k, g1k, g2k = kernel_core_layouts(cores, p, q, r)
    # one zero row appended: dead/pad lookups gather row tp0 instead of
    # being masked with a multiply afterwards
    g0f = jnp.concatenate([
        g0k.reshape(t * p[0], q0 * r1),
        jnp.zeros((1, q0 * r1), jnp.float32),
    ])
    g2bd = _g2_blockdiag(g2k, q1, r2, q2)

    i0c = jnp.where(plan.alive1, plan.i0_s1, t * p[0])
    z0F = g0f[i0c].reshape(n_rows, r1)

    z1 = _run_transform_call(n_rows, r1, q1 * r2, t * p[1], interpret)(
        plan.runs1, z0F, g1k)

    z1F2 = z1[plan.perm12f]  # flat-row permute s1 -> s2, no re-tiling

    rows = _run_transform_call(n_rows, q1 * r2, q1 * q2, t * p[2],
                               interpret)(
        plan.runs2, z1F2, g2bd)
    rows64 = rows.reshape(nza, d)

    # pooling: one-hot GEMM (per-sample weights folded into the one-hot)
    iota_b = jnp.arange(tb, dtype=jnp.int32)
    hit = plan.rowidx_s2[None, :] == iota_b[:, None]
    if plan.w_s2 is not None:
        oh = jnp.where(hit, plan.w_s2[None, :], 0.0)
    else:
        oh = hit.astype(jnp.float32)
    out = jax.lax.dot_general(
        oh, rows64, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [tb, d]
    return out.reshape(t, batch_size, d), (z0F, z1F2)


def flat_lookup_backward(cores, tt_p_shapes, tt_q_shapes, tt_ranks,
                         batch_size, plan: FlatPlan, nza,
                         z0F, z1F2, d_output, interpret=False):
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
    n_rows = nza * q0

    g0k, g1k, g2k = kernel_core_layouts(cores, p, q, r)
    g2bd = _g2_blockdiag(g2k, q1, r2, q2)

    # per-lookup cotangents in s2 order (one zero row appended to dout so
    # pad rows gather zeros instead of being masked)
    dflat = jnp.concatenate([
        d_output.astype(jnp.float32).reshape(t * batch_size, d),
        jnp.zeros((1, d), jnp.float32),
    ])
    rowc = jnp.where(plan.rowidx_s2 >= 0, plan.rowidx_s2, t * batch_size)
    drs = dflat[rowc]
    if plan.w_s2 is not None:
        drs = drs * plan.w_s2[:, None]
    drsF = drs.reshape(n_rows, q1 * q2)

    dg2bd, dz1F2 = _run_accum_call(n_rows, q1 * r2, q1 * q2, t * p[2],
                                   interpret)(
        plan.runs2, z1F2, drsF, g2bd)
    dg2 = _extract_g2_grad(dg2bd, q1, r2, q2)  # [tp2, r2, q2]

    dz1F = dz1F2[plan.perm21f]  # flat-row permute s2 -> s1

    dg1, dz0F = _run_accum_call(n_rows, r1, q1 * r2, t * p[1], interpret)(
        plan.runs1, z0F, dz1F, g1k)

    # dG0: one exact-fp32 one-hot GEMM over lookups (s1 order)
    dz0lk = dz0F.reshape(nza, q0 * r1)
    i0c = jnp.where(plan.alive1, plan.i0_s1, -1)
    oh0 = (i0c[:, None]
           == jnp.arange(t * p[0], dtype=jnp.int32)[None, :]).astype(
               jnp.float32)
    dg0f = jax.lax.dot_general(
        oh0, dz0lk, (((0,), (0,)), ((), ())),
        precision=_ONEHOT_PRECISION,
        preferred_element_type=jnp.float32,
    )  # [tp0, q0*r1]
    dg0 = dg0f.reshape(t * p[0], q0, r1)
    return grads_to_module_layout((dg0, dg1, dg2), p, q, r, t)


@functools.lru_cache(maxsize=None)
def make_flat_vjp(p, q, r, num_tables, batch_size, has_tableidx,
                  has_weights, has_live, interpret):
    """custom_vjp pooled lookup over the flat pipeline.

    The plan (sorts, span tables, permutations) and the forward's flat
    intermediates are computed once and shared: the backward reuses
    ``Z1F`` (saved, s2 order) instead of recomputing it — the save is
    ~nnz*q0*q1*r2 fp32, traded for a whole transform kernel.
    """
    pl_, ql_, rl_ = list(p), list(q), list(r)
    q0 = ql_[0]

    def fwd_impl(cores, indices, rowidx, tableidx, weights, live):
        plan, nza = _build_plan(
            indices, rowidx, tableidx if has_tableidx else None,
            weights if has_weights else None,
            live if has_live else None,
            pl_, q0, num_tables, batch_size)
        out, flats = flat_lookup_forward(
            cores, pl_, ql_, rl_, batch_size, plan, nza,
            interpret=interpret)
        return out, (plan, nza, flats)

    @jax.custom_vjp
    def fn(cores, indices, rowidx, tableidx, weights, live):
        return fwd_impl(cores, indices, rowidx, tableidx, weights, live)[0]

    def fn_fwd(cores, indices, rowidx, tableidx, weights, live):
        out, ctx = fwd_impl(cores, indices, rowidx, tableidx, weights, live)
        plan, nza, flats = ctx
        return out, (cores, plan, flats, indices.shape[0])

    def fn_bwd(res, d_output):
        cores, plan, (z0F, z1F2), nnz = res
        nza = plan.idx_s1.shape[0]
        grads = flat_lookup_backward(
            cores, pl_, ql_, rl_, batch_size, plan, nza,
            z0F, z1F2, d_output, interpret=interpret)
        zi = np.zeros((nnz,), dtype=jax.dtypes.float0)
        z1_ = np.zeros((1,), dtype=jax.dtypes.float0)
        return (
            tuple(grads), zi, zi,
            (zi if has_tableidx else None),
            (jnp.zeros((nnz,), jnp.float32) if has_weights else None),
            (z1_ if has_live else None),
        )

    fn.defvjp(fn_fwd, fn_bwd)
    return fn
