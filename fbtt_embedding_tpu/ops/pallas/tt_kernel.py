"""Fused Pallas TPU kernels for TT-embedding lookup and backward.

TPU-native replacement for the reference's entire CUDA hot path — the
pointer-array batched-GEMM chain (``tt_embeddings_cuda.cu:964-1075``), the
segment-sum pooling kernel (``:920-962``), the backward recompute + grad
GEMMs + ``atomicAdd`` scatters (``:419-652``) — as ONE kernel per direction
that keeps every intermediate in VMEM:

  * TT cores live wholly in VMEM (they are tiny — that is the point of TT
    compression), so the per-lookup "gather" is a dynamic VMEM row read
    instead of an HBM gather: the XLA path materializes a
    ``[nnz, r*q*r']`` gather product in HBM (~170 MB/step at the benchmark
    config); here it never leaves VMEM.
  * The (T-1)-step contraction chain runs as batched MXU dots over
    nnz-blocks.
  * Pooling is fused: a one-hot ``[B, BN]`` matrix (built by an iota
    compare) contracts the block's rows straight into the pooled output —
    the per-lookup weight is folded into the one-hot, which also gives the
    cached-row masking (weight 0) for free.
  * The backward recomputes forward partials in VMEM (the reference's
    recompute strategy), computes per-lookup cotangents by the transposed
    chain, and accumulates core gradients with one-hot MXU contractions
    (deterministic; the reference races ``atomicAdd``).

Numerics: fp32 storage and accumulation; MXU multiplications in bf16
(TPU-idiomatic, ~1e-3 relative — the XLA path at DEFAULT precision rounds
identically). The CPU test suite runs these kernels in interpreter mode
where everything is exact fp32.

Supported: ``tt_ndim`` 2 or 3 (4 falls back to XLA), any ``num_tables``
(tables are flattened into the per-core row dimension), optional
per-lookup weights. Availability is checked by :func:`kernel_available`.

Layouts (all pure reshapes of the module storage
``[num_tables, p_t, r_t*q_t*r_{t+1}]``):

  g0: [T*p0, q0, r1]        row (t,i0) -> z0 [q0, r1]
  g1: [T*p1, r1, q1*r2]     lanes q1-major
  g2: [T*p2, r2, q2]
  out: [q0, T*B, q1*q2]     host-transposed to [T, B, D]; the d-index
                            order (a0, a1, a2) matches tt_matrix_to_full.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VALS_REDUCE_PRECISION = jax.lax.Precision.HIGHEST

# Gather-loop unroll factors. A/B'd in-context on v5e at the headline
# config: 8 wins for both kernels inside the fused train step (larger
# unrolls looked better in isolated kernel timing but regress end-to-end).
_FWD_GATHER_UNROLL = 8
_BWD_GATHER_UNROLL = 8

DEFAULT_BLOCK_N = 256
# Static-buffer budget; the Mosaic scoped-vmem limit is raised to 100 MB in
# the pallas_call (v5e has 128 MB VMEM), temporaries live on top of this.
VMEM_BUDGET_BYTES = 48 * 1024 * 1024


def _pad128(x):
    return max(128, -(-x // 128) * 128)


def _grad_layouts(p, q, r):
    """Per-core (out_sublane, out_lane, transposed, method) of the grad
    outputs.

    Two scatter methods:
      * ``"dot"`` — one-hot MXU contraction; rhs needs lane dim 128-aligned
        and sublane >= 8. Used for the middle core, whose per-lookup grad
        slab is large (r1 x q1*r2) and lane-aligned, so the dot is
        MXU-efficient.
      * ``"vals"`` — the kernel streams the per-lookup grad slabs out as a
        blocked ``[n_blocks, bn, s, l]`` array and the (traced) host wrapper
        reduces them with ONE one-hot contraction over the whole nnz at
        HIGHEST precision. Used for the first/last cores whose slabs are
        tiny (r1 x q0 / q2 x r2): an in-kernel one-hot dot would waste
        p_t x the useful FLOPs on lane padding, and per-lookup RMW
        serializes ~2*nnz tiny memory ops.
    Core-0 and last-core grads are produced TRANSPOSED (``trans=True``)
    because the transpose-free contraction chain emits them that way.
    """
    ndim = len(p)

    def pad8(x):
        return max(8, -(-x // 8) * 8)

    out = []
    for i in range(ndim):
        if i == 0:
            # dz0T [r1, q0]
            out.append((r[1], pad8(q[0]), True, "vals"))
        elif i == ndim - 1 and ndim == 3:
            # dgLastT [q_i, r_i]
            out.append((pad8(q[i]), r[i], True, "vals"))
        elif i == ndim - 1:
            # ndim == 2: dg1 [r1, q1] comes out untransposed
            out.append((r[i], pad8(q[i]), False, "vals"))
        else:
            # dg1 [r1, q1*r2]
            out.append((max(8, r[i]), _pad128(q[i] * r[i + 1]), False, "dot"))
    return out


def _sizes(p, q, r, num_tables, batch_size, block_n, backward):
    t = num_tables
    core_bytes = 4 * sum(
        t * p[i] * r[i] * q[i] * r[i + 1] for i in range(len(p))
    )
    scratch = 4 * block_n * sum(r[i] * q[i] * r[i + 1] for i in range(len(p)))
    d = int(np.prod(q))
    out_bytes = 4 * t * batch_size * d
    total = core_bytes + scratch + out_bytes
    if backward:
        total += 4 * sum(
            t * p[i] * s * l
            for i, (s, l, _, _) in enumerate(_grad_layouts(p, q, r))
        )
        # transposed core copies (g0T, gLastT), gather scratches, the two
        # d_output copies, drs/drsT scratches, grad-value scratches
        total += 4 * t * (p[0] * r[0] * q[0] * r[1]
                          + p[-1] * r[-2] * q[-1] * r[-1])
        total += 4 * block_n * (r[1] * q[0] + r[-2] * q[-1])
        total += 8 * t * batch_size * d
        total += 8 * block_n * d
        total += 4 * block_n * sum(
            s * l for (s, l, _, _) in _grad_layouts(p, q, r))
        total += 4 * block_n * (r[1] * q[1] * r[2] if len(p) >= 3 else 0) * 2
    return total


def kernel_available(
    tt_p_shapes: Sequence[int],
    tt_q_shapes: Sequence[int],
    tt_ranks: Sequence[int],
    num_tables: int,
    batch_size: int,
    block_n: int = DEFAULT_BLOCK_N,
    backward: bool = True,
) -> bool:
    """True if the fused kernel supports this configuration on TPU."""
    ndim = len(tt_p_shapes)
    if ndim not in (2, 3):
        return False
    q = list(tt_q_shapes)
    r = list(tt_ranks)
    if len(r) == ndim - 1:
        r = [1] + r + [1]
    # Tiling constraints: contraction/lane dims must respect (8, 128) tiles
    # closely enough for Mosaic. Conservative gates; XLA path otherwise.
    if r[1] % 8 != 0:
        return False
    if ndim == 3 and (r[2] % 8 != 0 or (q[1] * r[2]) % 8 != 0):
        return False
    if (num_tables * batch_size) % 8 != 0:
        return False
    d_out_last = int(np.prod(q[1:])) if ndim == 3 else q[1]
    if d_out_last % 8 != 0:
        return False
    return choose_block_n(
        tt_p_shapes, q, r, num_tables, batch_size, backward) is not None


def choose_block_n(
    tt_p_shapes, tt_q_shapes, tt_ranks, num_tables, batch_size,
    backward: bool = True,
) -> Optional[int]:
    """Largest block size (128/64/32/16) that fits the VMEM budget."""
    r = list(tt_ranks)
    if len(r) == len(tt_p_shapes) - 1:
        r = [1] + r + [1]
    for bn in (DEFAULT_BLOCK_N, 128, 64, 32, 16):
        if _sizes(tt_p_shapes, tt_q_shapes, r, num_tables, batch_size, bn,
                  backward) <= VMEM_BUDGET_BYTES:
            return bn
    return None


def kernel_core_layouts(tt_cores, tt_p_shapes, tt_q_shapes, tt_ranks):
    """Module storage ``[T, p, r*q*r']`` -> kernel layouts (pure reshapes)."""
    ndim = len(tt_p_shapes)
    t = tt_cores[0].shape[0]
    out = []
    for i in range(ndim):
        p, qq = tt_p_shapes[i], tt_q_shapes[i]
        ra, rb = tt_ranks[i], tt_ranks[i + 1]
        if i == 0:
            # [T, p0, q0*r1] -> [T*p0, q0, r1]
            out.append(tt_cores[0].reshape(t * p, qq, rb))
        elif i == ndim - 1:
            # [T, p, r*q] -> [T*p, r, q]
            out.append(tt_cores[i].reshape(t * p, ra, qq))
        else:
            # [T, p, r*q*r'] -> [T*p, r, q*r']
            out.append(tt_cores[i].reshape(t * p, ra, qq * rb))
    return tuple(out)


def grads_to_module_layout(dgs, tt_p_shapes, tt_q_shapes, tt_ranks,
                           num_tables):
    """Kernel-layout gradients -> module storage shapes (pure reshapes)."""
    ndim = len(tt_p_shapes)
    out = []
    for i in range(ndim):
        p = tt_p_shapes[i]
        w = tt_ranks[i] * tt_q_shapes[i] * tt_ranks[i + 1]
        out.append(dgs[i].reshape(num_tables, p, w))
    return tuple(out)


def _block_inputs(idx_parts, rowidx, tableidx, weights, tt_p_shapes,
                  num_tables, batch_size, block_n):
    """Pad/reshape per-lookup arrays for the kernel.

    Returns (idx arrays [nnz_pad] for SMEM prefetch,
             idx arrays [n_blocks, bn] for VMEM iota compares,
             rowv [n_blocks, bn] with -1 padding,
             wv [n_blocks, bn] float weights, n_blocks).
    Table batching: core-row index becomes ``t*p + i``; pooled row becomes
    ``t*B + b``.
    """
    nnz = rowidx.shape[0]
    bn = block_n
    nnz_pad = ((nnz + bn - 1) // bn) * bn
    pad = nnz_pad - nnz
    n_blocks = nnz_pad // bn

    if tableidx is not None and num_tables > 1:
        idx_parts = [
            ip.astype(jnp.int32) + tableidx.astype(jnp.int32) * p
            for ip, p in zip(idx_parts, tt_p_shapes)
        ]
        rowv = rowidx.astype(jnp.int32) + tableidx.astype(jnp.int32) * batch_size
    else:
        idx_parts = [ip.astype(jnp.int32) for ip in idx_parts]
        rowv = rowidx.astype(jnp.int32)

    idx_pad = [jnp.pad(ip, (0, pad)) for ip in idx_parts]
    rowv = jnp.pad(rowv, (0, pad), constant_values=-1)
    if weights is None:
        wv = None
    else:
        wv = jnp.pad(weights.astype(jnp.float32), (0, pad)).reshape(
            n_blocks, bn)
    return (
        idx_pad,
        [ip.reshape(n_blocks, bn) for ip in idx_pad],
        rowv.reshape(n_blocks, bn),
        wv,
        n_blocks,
    )


@functools.lru_cache(maxsize=None)
def _make_fwd_call(p, q, r, num_tables, batch_size, block_n, has_weights,
                   interpret, has_live=False):
    """pallas_call for the forward: pooled [q0, T*B, prod(q[1:])].

    ``has_live``: an extra scalar-prefetch ``live[1]`` holds the number of
    non-cache-served lookups; the caller packs live lookups first, and any
    block past the live count skips its gathers and contractions entirely —
    the TPU equivalent of the reference's cub-partition compute saving
    (``tt_embeddings_cuda.cu:1436-1488``) with static shapes.
    """
    ndim = len(p)
    q0 = q[0]
    r1 = r[1]
    tb = num_tables * batch_size
    bn = block_n
    if ndim == 3:
        q1, q2, r2 = q[1], q[2], r[2]
        d_rest = q1 * q2
        g1_last = q1 * r2
    else:
        q1, q2, r2 = q[1], 1, 1
        d_rest = q1
        g1_last = q1

    def kernel(*refs):
        # prefetch: idx0..idx{ndim-1}, [live]; inputs: rowv, [wv],
        # g0..g{ndim-1}; out; scratch: z0s, g1s, [g2s]
        idx_refs = refs[:ndim]
        pos = ndim
        live_ref = None
        if has_live:
            live_ref = refs[pos]; pos += 1
        rowv_ref = refs[pos]; pos += 1
        wv_ref = None
        if has_weights:
            wv_ref = refs[pos]; pos += 1
        g_refs = refs[pos:pos + ndim]; pos += ndim
        out_ref = refs[pos]; pos += 1
        scr = refs[pos:]
        z0s, g1s = scr[0], scr[1]
        g2s = scr[2] if ndim == 3 else None

        blk = pl.program_id(0)

        @pl.when(blk == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        base = blk * bn
        if has_live:
            block_live = base < live_ref[0]
        else:
            block_live = None

        def gbody(i, _):
            for u in range(min(_FWD_GATHER_UNROLL, bn)):
                n = i * 8 + u
                g = base + n
                z0s[n] = g_refs[0][idx_refs[0][g]]
                g1s[n] = g_refs[1][idx_refs[1][g]]
                if ndim == 3:
                    g2s[n] = g_refs[2][idx_refs[2][g]]
            return 0

        def compute_block():
            jax.lax.fori_loop(0, bn // min(_FWD_GATHER_UNROLL, bn), gbody, 0,
                          unroll=True)

            z1 = jax.lax.dot_general(
                z0s[:], g1s[:], (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [bn, q0, g1_last]

            if ndim == 3:
                pieces = []
                for a1 in range(q1):
                    z1a = z1[:, :, a1 * r2:(a1 + 1) * r2]
                    pieces.append(jax.lax.dot_general(
                        z1a, g2s[:], (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    ))
                row = jnp.concatenate(pieces, axis=2)  # [bn, q0, q1*q2]
            else:
                row = z1

            rowv = rowv_ref[blk]
            iota_b = jax.lax.broadcasted_iota(jnp.int32, (tb, bn), 0)
            hit = iota_b == rowv[None, :]
            if has_weights:
                oht = jnp.where(hit, wv_ref[blk][None, :], 0.0)
            else:
                oht = hit.astype(jnp.float32)
            for a0 in range(q0):
                out_ref[a0] += jax.lax.dot_general(
                    oht, row[:, a0, :], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

        if has_live:
            pl.when(block_live)(compute_block)
        else:
            compute_block()

    n_in = 1 + (1 if has_weights else 0) + ndim
    scratch = [
        pltpu.VMEM((bn, q0, r1), jnp.float32),
        pltpu.VMEM((bn, r1, g1_last), jnp.float32),
    ]
    if ndim == 3:
        scratch.append(pltpu.VMEM((bn, r2, q2), jnp.float32))

    def call(n_blocks):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=ndim + (1 if has_live else 0),
            grid=(n_blocks,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
            out_specs=pl.BlockSpec(
                (q0, tb, d_rest), lambda i, *_: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=scratch,
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((q0, tb, d_rest), jnp.float32),
            grid_spec=grid_spec,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )

    return call


@functools.lru_cache(maxsize=None)
def _make_bwd_call(p, q, r, num_tables, batch_size, block_n, has_weights,
                   interpret, has_live=False):
    """pallas_call for the backward.

    Inputs (after ndim+1 scalar-prefetch arrays idx0..idx_{ndim-1}, rows):
    rowv [n_blocks, bn], (ndim==3) idxv_mid [n_blocks, bn], [wv],
    g0, g1, (g2), g0T, (g2T), dout_q [T*B, q0, rest], doutT [T*B, rest, q0].
    Outputs: per-core grads in the layouts given by :func:`_grad_layouts`.
    """
    ndim = len(p)
    q0 = q[0]
    r1 = r[1]
    t = num_tables
    tb = t * batch_size
    bn = block_n
    if ndim == 3:
        q1, q2, r2 = q[1], q[2], r[2]
        d_rest = q1 * q2
        g1_last = q1 * r2
    else:
        q1, q2, r2 = q[1], 1, 1
        d_rest = q1
        g1_last = q1
    tp = [t * pp for pp in p]
    glayouts = _grad_layouts(p, q, r)

    def kernel(*refs):
        idx_refs = refs[:ndim]
        rows_ref = refs[ndim]
        pos = ndim + 1
        wv_ref = None
        if has_weights:
            wv_ref = refs[pos]; pos += 1
        live_ref = None
        if has_live:
            live_ref = refs[pos]; pos += 1
        idxv_mid = None
        if ndim == 3:
            idxv_mid = refs[pos]; pos += 1
        g_refs = refs[pos:pos + ndim]; pos += ndim
        g0T_ref = refs[pos]; pos += 1
        g2T_ref = None
        if ndim == 3:
            g2T_ref = refs[pos]; pos += 1
        dout_ref = refs[pos]; pos += 1
        doutT_ref = refs[pos]; pos += 1
        dg_refs = refs[pos:pos + ndim]; pos += ndim
        scr = list(refs[pos:])
        z0s = scr.pop(0)
        z0sT = scr.pop(0)
        g1s = scr.pop(0)
        if ndim == 3:
            g2s = scr.pop(0)
            g2sT = scr.pop(0)
        else:
            g2s = g2sT = None
        drs = scr.pop(0)
        drsT = scr.pop(0)
        val_scr = scr  # one per core (holds the padded grad slabs)

        blk = pl.program_id(0)

        @pl.when(blk == 0)
        def _():
            for i, (_, _, _, method) in enumerate(glayouts):
                if method == "dot":
                    dg_refs[i][:] = jnp.zeros_like(dg_refs[i])
            for vs in val_scr:
                vs[:] = jnp.zeros_like(vs)

        base = blk * bn
        if has_live:
            block_live = base < live_ref[0]

        def gbody(i, _):
            for u in range(min(_BWD_GATHER_UNROLL, bn)):
                n = i * 8 + u
                g = base + n
                i0 = idx_refs[0][g]
                z0s[n] = g_refs[0][i0]
                z0sT[n] = g0T_ref[i0]
                g1s[n] = g_refs[1][idx_refs[1][g]]
                if ndim == 3:
                    i2 = idx_refs[2][g]
                    g2s[n] = g_refs[2][i2]
                    g2sT[n] = g2T_ref[i2]
                rw0 = rows_ref[g]
                rw = jnp.maximum(rw0, 0)
                # per-lookup cotangent scale: 0 for padding rows, times the
                # optional per-sample weight — applied as a scalar on the
                # gathered slab (Mosaic has no [bn]->[bn,1,1] broadcast).
                s = jnp.where(rw0 >= 0, jnp.float32(1.0), jnp.float32(0.0))
                if has_weights:
                    s = s * wv_ref[g]
                drs[n] = dout_ref[rw] * s
                drsT[n] = doutT_ref[rw] * s
            return 0

        def compute_block():
            _compute(blk)

        def _compute(blk):
            jax.lax.fori_loop(0, bn // min(_BWD_GATHER_UNROLL, bn), gbody, 0,
                          unroll=True)
            _compute_rest(blk)

        def _compute_rest(blk):
            d_row = drs[:]    # [bn, q0, d_rest]
            d_rowT = drsT[:]  # [bn, d_rest, q0]

            if ndim == 3:
                z1 = jax.lax.dot_general(
                    z0s[:], g1s[:], (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )  # [bn, q0, q1*r2]
                dg2T = jnp.zeros((bn, q2, r2), jnp.float32)
                dz1_parts = []
                dz1T_parts = []
                for a1 in range(q1):
                    z1a = z1[:, :, a1 * r2:(a1 + 1) * r2]        # [bn, q0, r2]
                    d_pa = d_row[:, :, a1 * q2:(a1 + 1) * q2]    # [bn, q0, q2]
                    d_paT = d_rowT[:, a1 * q2:(a1 + 1) * q2, :]  # [bn, q2, q0]
                    dg2T = dg2T + jax.lax.dot_general(
                        d_paT, z1a, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    )                                             # [bn, q2, r2]
                    dz1_parts.append(jax.lax.dot_general(
                        d_pa, g2sT[:], (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    ))                                            # [bn, q0, r2]
                    dz1T_parts.append(jax.lax.dot_general(
                        g2s[:], d_paT, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    ))                                            # [bn, r2, q0]
                d_z1 = jnp.concatenate(dz1_parts, axis=2)    # [bn, q0, q1*r2]
                d_z1T = jnp.concatenate(dz1T_parts, axis=1)  # [bn, q1*r2, q0]
                last_val = dg2T
            else:
                d_z1 = d_row
                d_z1T = d_rowT
                last_val = None

            dg1val = jax.lax.dot_general(
                z0sT[:], d_z1, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                                                 # [bn, r1, g1l]
            dz0T = jax.lax.dot_general(
                g1s[:], d_z1T, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                                                 # [bn, r1, q0]

            vals = [dz0T, dg1val] + ([last_val] if ndim == 3 else [])
            vi = 0
            for i, (s_to, l_to, _, method) in enumerate(glayouts):
                v = vals[i]
                _, s, l = v.shape
                if method == "vals":
                    # stream per-lookup slabs out; padding lanes are garbage,
                    # the wrapper slices them off before reducing.
                    dg_refs[i][0, :, 0:s, 0:l] = v
                    continue
                # "dot": one-hot MXU scatter (large lane-aligned slabs)
                if (s, l) != (s_to, l_to):
                    val_scr[vi][:, 0:s, 0:l] = v
                    v = val_scr[vi][:]
                    vi += 1
                idxv = idxv_mid[blk]
                iota_p = jax.lax.broadcasted_iota(jnp.int32, (tp[i], bn), 0)
                ohT = (iota_p == idxv[None, :]).astype(jnp.float32)
                dg_refs[i][:] += jax.lax.dot_general(
                    ohT, v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

        if has_live:
            pl.when(block_live)(compute_block)
        else:
            compute_block()

    n_in = ((1 if ndim == 3 else 0)
            + ndim + (2 if ndim == 3 else 1) + 2)
    scratch = [
        pltpu.VMEM((bn, q0, r1), jnp.float32),
        pltpu.VMEM((bn, r1, q0), jnp.float32),
        pltpu.VMEM((bn, r1, g1_last), jnp.float32),
    ]
    if ndim == 3:
        scratch.append(pltpu.VMEM((bn, r2, q2), jnp.float32))
        scratch.append(pltpu.VMEM((bn, q2, r2), jnp.float32))
    scratch.append(pltpu.VMEM((bn, q0, d_rest), jnp.float32))
    scratch.append(pltpu.VMEM((bn, d_rest, q0), jnp.float32))
    val_dims = ([(r1, q0), (r1, g1_last), (q2, r2)] if ndim == 3
                else [(r1, q0), (r1, g1_last)])
    for (s0, l0), (s, l, _, m) in zip(val_dims, glayouts):
        if m == "dot" and (s0, l0) != (s, l):
            scratch.append(pltpu.VMEM((bn, s, l), jnp.float32))

    def call(n_blocks):
        out_shapes = []
        out_specs = []
        for i, (s, l, _, m) in enumerate(glayouts):
            if m == "vals":
                out_shapes.append(jax.ShapeDtypeStruct(
                    (n_blocks, bn, s, l), jnp.float32))
                out_specs.append(pl.BlockSpec(
                    (1, bn, s, l), lambda i, *_: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM))
            else:
                out_shapes.append(jax.ShapeDtypeStruct(
                    (tp[i], s, l), jnp.float32))
                out_specs.append(pl.BlockSpec(
                    (tp[i], s, l), lambda i, *_: (0, 0, 0),
                    memory_space=pltpu.VMEM))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=(ndim + 1 + (1 if has_weights else 0)
                                 + (1 if has_live else 0)),
            grid=(n_blocks,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
            out_specs=out_specs,
            scratch_shapes=scratch,
        )
        return pl.pallas_call(
            kernel,
            out_shape=out_shapes,
            grid_spec=grid_spec,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )

    return call


def tt_forward_pallas(
    tt_cores: Sequence[jnp.ndarray],
    tt_p_shapes: Sequence[int],
    tt_q_shapes: Sequence[int],
    tt_ranks: Sequence[int],
    batch_size: int,
    idx_parts: Sequence[jnp.ndarray],
    rowidx: jnp.ndarray,
    tableidx: Optional[jnp.ndarray] = None,
    weights: Optional[jnp.ndarray] = None,
    block_n: Optional[int] = None,
    interpret: bool = False,
    live_count: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Fused pooled forward -> ``[num_tables, B, D]``.

    ``live_count`` (traced int32 scalar-array, shape [1]): number of
    non-cache-served lookups when the caller has packed live lookups
    first — blocks past it are skipped entirely.
    """
    p, q = tuple(tt_p_shapes), tuple(tt_q_shapes)
    r = tuple(tt_ranks)
    ndim = len(p)
    t = tt_cores[0].shape[0]
    if block_n is None:
        block_n = choose_block_n(p, q, r, t, batch_size, backward=False)
    gk = kernel_core_layouts(tt_cores, p, q, r)
    idx_pad, _, rowv, wv, n_blocks = _block_inputs(
        idx_parts, rowidx, tableidx, weights, p, t, batch_size, block_n)
    call = _make_fwd_call(p, q, r, t, batch_size, block_n,
                          weights is not None, interpret,
                          live_count is not None)(n_blocks)
    args = list(idx_pad)
    if live_count is not None:
        args.append(live_count.astype(jnp.int32).reshape(1))
    args.append(rowv)
    if wv is not None:
        args.append(wv)
    args += list(gk)
    out = call(*args)  # [q0, T*B, rest]
    d = int(np.prod(q))
    out = out.transpose(1, 0, 2).reshape(t, batch_size, d)
    return out


def tt_backward_pallas(
    tt_cores: Sequence[jnp.ndarray],
    tt_p_shapes: Sequence[int],
    tt_q_shapes: Sequence[int],
    tt_ranks: Sequence[int],
    batch_size: int,
    idx_parts: Sequence[jnp.ndarray],
    rowidx: jnp.ndarray,
    d_output: jnp.ndarray,
    tableidx: Optional[jnp.ndarray] = None,
    weights: Optional[jnp.ndarray] = None,
    block_n: Optional[int] = None,
    interpret: bool = False,
    live_count: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, ...]:
    """Fused backward: d_output ``[T, B, D]`` -> core grads (module layout)."""
    p, q = tuple(tt_p_shapes), tuple(tt_q_shapes)
    r = tuple(tt_ranks)
    t = tt_cores[0].shape[0]
    if block_n is None:
        block_n = choose_block_n(p, q, r, t, batch_size, backward=True)
    q0 = q[0]
    d = int(np.prod(q))
    gk = kernel_core_layouts(tt_cores, p, q, r)
    idx_pad, idxv, rowv, wv, n_blocks = _block_inputs(
        idx_parts, rowidx, tableidx, weights, p, t, batch_size, block_n)
    dout_q = d_output.reshape(t * batch_size, q0, d // q0).astype(jnp.float32)
    doutT = dout_q.transpose(0, 2, 1)
    call = _make_bwd_call(p, q, r, t, batch_size, block_n,
                          weights is not None, interpret,
                          live_count is not None)(n_blocks)
    rows_flat = rowv.reshape(-1)
    args = list(idx_pad) + [rows_flat]
    if wv is not None:
        args.append(wv.reshape(-1))
    if live_count is not None:
        args.append(live_count.astype(jnp.int32).reshape(1))
    if len(p) == 3:
        args.append(idxv[1])
    args += list(gk)
    args.append(gk[0].transpose(0, 2, 1))        # g0T [tp0, r1, q0]
    if len(p) == 3:
        args.append(gk[2].transpose(0, 2, 1))    # g2T [tp2, q2, r2]
    args.append(dout_q)
    args.append(doutT)
    dgs = list(call(*args))
    nnz_pad = n_blocks * block_n
    for i, (_, _, trans, method) in enumerate(_grad_layouts(p, q, r)):
        s1, s2 = gk[i].shape[1], gk[i].shape[2]
        si, li = (s2, s1) if trans else (s1, s2)
        if method == "vals":
            # [n_blocks, bn, s, l] per-lookup slabs -> one-hot reduction
            # over the whole nnz at HIGHEST precision (exact fp32).
            v = dgs[i].reshape(nnz_pad, *dgs[i].shape[2:])[:, :si, :li]
            oh = (idx_pad[i][:, None]
                  == jnp.arange(gk[i].shape[0], dtype=jnp.int32)[None, :])
            if live_count is not None:
                # skipped blocks stream garbage slabs; mask them out
                alive = (jnp.arange(nnz_pad, dtype=jnp.int32)
                         < live_count.astype(jnp.int32).reshape(())[None])
                oh = oh & alive[:, None]
            dgs[i] = jax.lax.dot_general(
                oh.astype(jnp.float32), v,
                (((0,), (0,)), ((), ())),
                precision=_VALS_REDUCE_PRECISION,
                preferred_element_type=jnp.float32,
            )
        else:
            dgs[i] = dgs[i][:, :si, :li]
        if trans:
            dgs[i] = dgs[i].transpose(0, 2, 1)
    return grads_to_module_layout(tuple(dgs), p, q, r, t)


# NOTE: a fully fused fwd+bwd train-step kernel (sharing gathers and the z1
# partial between directions) was prototyped and measured SLOWER than the
# separate forward and backward kernels (1.33 ms vs 1.17 ms at the headline
# config): TPU Pallas grid steps execute compute sequentially, so fusing
# lengthens the per-block critical path without enabling any overlap, and
# the larger VMEM footprint hurts scheduling. The two-kernel split is the
# measured optimum on v5e.
