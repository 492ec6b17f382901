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

Supported: ``tt_ndim`` 2–4 (the chain is evaluated recursively), any
``num_tables`` (tables are flattened into the per-core row dimension),
optional per-lookup weights. Availability is checked by
:func:`kernel_available`.

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
# Gather core slabs in bf16 (halving the byte-bound gather loop's traffic).
# Measured a NET REGRESSION on v5e at the headline config (1.37 -> 1.63
# ms/step) with both explicit-cast and mixed-dtype dot variants — bf16
# scratch tiling (16,128) and operand handling cost more than the bytes
# saved. Kept available for other configs/generations.
_BF16_GATHERS = False
_GATHER_DTYPE = jnp.bfloat16

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
        and sublane >= 8. Used for core 1, whose per-lookup grad slab is
        large (r1 x q1*r2) and lane-aligned, so the dot is MXU-efficient.
      * ``"vals"`` — the kernel streams the per-lookup grad slabs out as a
        blocked ``[n_blocks, bn, s, l]`` array and the (traced) host wrapper
        reduces them with ONE one-hot contraction over the whole nnz at
        HIGHEST precision (exact fp32). Used for all other cores, whose
        slabs are small: an in-kernel one-hot dot would waste p_t x the
        useful FLOPs on lane padding, and per-lookup RMW serializes ~nnz
        tiny memory ops.
    ``trans=True`` cores are produced TRANSPOSED because the transpose-free
    contraction chain emits them that way (in-kernel relayouts cost more
    than all the backward's dots — see docs/PERF.md).
    """
    ndim = len(p)

    def pad8(x):
        return max(8, -(-x // 8) * 8)

    out = []
    for i in range(ndim):
        if i == 0:
            # dz0T [r1, q0]
            out.append((r[1], pad8(q[0]), True, "vals"))
        elif i == 1 and ndim > 2:
            # dg1 [r1, q1*r2], untransposed, in-kernel one-hot dot
            out.append((max(8, r[i]), _pad128(q[i] * r[i + 1]), False, "dot"))
        elif i == ndim - 1 and ndim == 2:
            # ndim == 2: dg1 [r1, q1] comes out untransposed
            out.append((r[i], pad8(q[i]), False, "vals"))
        else:
            # middle (i >= 2) and last cores: dgT [q_i*r_{i+1}, r_i]
            out.append((pad8(q[i] * r[i + 1]), r[i], True, "vals"))
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
    if ndim not in (2, 3, 4):
        return False
    q = list(tt_q_shapes)
    r = list(tt_ranks)
    if len(r) == ndim - 1:
        r = [1] + r + [1]
    # Tiling constraints: contraction/lane dims must respect (8, 128) tiles
    # closely enough for Mosaic. Conservative gates; XLA path otherwise.
    for t in range(1, ndim):
        if r[t] % 8 != 0:
            return False
    for t in range(1, ndim - 1):
        if (q[t] * r[t + 1]) % 8 != 0:
            return False
    if (num_tables * batch_size) % 8 != 0:
        return False
    d_out_last = int(np.prod(q[1:]))
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

    The (T-1)-step chain is evaluated recursively: at level t, the running
    operand ``z_rt [bn, q0, r_t]`` (a lane slice selecting one digit of
    every already-contracted q-dim) contracts with the gathered core slabs
    ``g_ts[t] [bn, r_t, q_t*r_{t+1}]``; leaves are ``[bn, q0, q_t]`` row
    pieces concatenated in canonical (a1, a2, ...) digit order. Handles
    tt_ndim 2..4 uniformly (ndim == 3 reduces to the hand-written form).

    ``has_live``: an extra scalar-prefetch ``live[1]`` holds the number of
    non-cache-served lookups; the caller packs live lookups first, and any
    block past the live count skips its gathers and contractions entirely —
    the TPU equivalent of the reference's cub-partition compute saving
    (``tt_embeddings_cuda.cu:1436-1488``) with static shapes.
    """
    ndim = len(p)
    q0 = q[0]
    tb = num_tables * batch_size
    bn = block_n
    d_rest = int(np.prod(q[1:]))
    unroll = min(_FWD_GATHER_UNROLL, bn)

    def kernel(*refs):
        # prefetch: idx0..idx{ndim-1}, [live]; inputs: rowv, [wv],
        # g0..g{ndim-1}; out; scratch: z0s, g1s..g{ndim-1}s
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
        g_scr = refs[pos:]  # z0s, then per-core slabs for t = 1..ndim-1

        blk = pl.program_id(0)

        @pl.when(blk == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        base = blk * bn

        def gbody(i, _):
            for u in range(unroll):
                n = i * unroll + u
                g = base + n
                for ci in range(ndim):
                    g_scr[ci][n] = g_refs[ci][idx_refs[ci][g]]
            return 0

        def chain(t, z_rt):
            # z_rt: [bn, q0, r_t] -> list of [bn, q0, q_t] leaf pieces
            zt = jax.lax.dot_general(
                z_rt, g_scr[t][:], (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [bn, q0, q_t * r_{t+1}]
            if t == ndim - 1:
                return [zt]
            pieces = []
            for a in range(q[t]):
                pieces += chain(
                    t + 1, zt[:, :, a * r[t + 1]:(a + 1) * r[t + 1]])
            return pieces

        def compute_block():
            jax.lax.fori_loop(0, bn // unroll, gbody, 0, unroll=True)
            pieces = chain(1, g_scr[0][:])
            row = (jnp.concatenate(pieces, axis=2) if len(pieces) > 1
                   else pieces[0])  # [bn, q0, d_rest]

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
            pl.when(base < live_ref[0])(compute_block)
        else:
            compute_block()

    gdt = _GATHER_DTYPE if _BF16_GATHERS else jnp.float32
    n_in = 1 + (1 if has_weights else 0) + ndim
    scratch = [pltpu.VMEM((bn, q0, r[1]), gdt)]
    for t in range(1, ndim):
        scratch.append(
            pltpu.VMEM((bn, r[t], q[t] * r[t + 1]), gdt))

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
    """pallas_call for the backward (transpose-free recursive chain dual).

    Scalar-prefetch: idx0..idx_{ndim-1}, rows, [w]. VMEM inputs: [live? as
    prefetch], idxv_core1 (ndim>2), g0..g{ndim-1}, g0T, g2T..g{ndim-1}T,
    dout_q [T*B, q0, rest], doutT [T*B, rest, q0].
    Outputs: per-core grads in the layouts of :func:`_grad_layouts`.

    At each level t the recursion receives the running operand
    ``z_rt [bn, q0, r_t]`` and the output-cotangent slice in BOTH
    orientations, recomputes the level's partial (the reference's
    activation-recompute strategy), and returns the cotangent wrt its
    input in both orientations — every operand orientation is either
    gathered from a pre-transposed core copy or produced directly by a
    standard-form batched dot, so the kernel contains no relayouts.
    """
    ndim = len(p)
    q0 = q[0]
    r1 = r[1]
    t_ = num_tables
    tb = t_ * batch_size
    bn = block_n
    d_rest = int(np.prod(q[1:]))
    g1_last = q[1] * r[2] if ndim > 2 else q[1]
    tp = [t_ * pp for pp in p]
    glayouts = _grad_layouts(p, q, r)
    rest_of = [int(np.prod(q[t:])) for t in range(ndim)] + [1]
    unroll = min(_BWD_GATHER_UNROLL, bn)

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
        if ndim > 2:
            idxv_mid = refs[pos]; pos += 1
        g_refs = refs[pos:pos + ndim]; pos += ndim
        g0T_ref = refs[pos]; pos += 1
        gT_refs = {0: g0T_ref}
        for t in range(2, ndim):
            gT_refs[t] = refs[pos]; pos += 1
        dout_ref = refs[pos]; pos += 1
        doutT_ref = refs[pos]; pos += 1
        dg_refs = refs[pos:pos + ndim]; pos += ndim
        scr = list(refs[pos:])
        g_scr = [scr.pop(0) for _ in range(ndim)]  # z0s, g1s..g{ndim-1}s
        z0sT = scr.pop(0)
        gT_scr = {}
        for t in range(2, ndim):
            gT_scr[t] = scr.pop(0)
        drs = scr.pop(0)
        drsT = scr.pop(0)
        val_scr = scr  # pad scratch for "dot" cores needing padding

        blk = pl.program_id(0)

        @pl.when(blk == 0)
        def _():
            for i, (_, _, _, method) in enumerate(glayouts):
                if method == "dot":
                    dg_refs[i][:] = jnp.zeros_like(dg_refs[i])
            for vs in val_scr:
                vs[:] = jnp.zeros_like(vs)

        base = blk * bn

        def gbody(i, _):
            for u in range(unroll):
                n = i * unroll + u
                g = base + n
                i0 = idx_refs[0][g]
                g_scr[0][n] = g_refs[0][i0]
                z0sT[n] = g0T_ref[i0]
                g_scr[1][n] = g_refs[1][idx_refs[1][g]]
                for t in range(2, ndim):
                    it = idx_refs[t][g]
                    g_scr[t][n] = g_refs[t][it]
                    gT_scr[t][n] = gT_refs[t][it]
                rw0 = rows_ref[g]
                rw = jnp.maximum(rw0, 0)
                # per-lookup cotangent scale: 0 for padding rows, times the
                # optional per-sample weight — applied as a scalar on the
                # gathered slab (Mosaic has no [bn]->[bn,1,1] broadcast).
                s = jnp.where(rw0 >= 0, jnp.float32(1.0), jnp.float32(0.0))
                if has_weights:
                    s = s * wv_ref[g]
                sd = s.astype(dout_ref.dtype)
                drs[n] = dout_ref[rw] * sd
                drsT[n] = doutT_ref[rw] * sd
            return 0

        def bdot(a, b):
            return jax.lax.dot_general(
                a, b, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )

        # grad-value accumulators, filled by the recursion
        gvals = {}

        def bwd_chain(t, z_rt, ds, dsT):
            """z_rt [bn,q0,r_t]; ds [bn,q0,rest_t]; dsT [bn,rest_t,q0] ->
            (dz_rt [bn,q0,r_t], dz_rtT [bn,r_t,q0])."""
            if t == ndim - 1:
                # leaf: zt IS the row piece; dG_tT = dsT^T-free form
                gv = bdot(dsT, z_rt)  # [bn, q_t, r_t]
                gvals[t] = gv if t not in gvals else gvals[t] + gv
                dz = bdot(ds, gT_scr[t][:]) if t >= 2 else bdot(
                    ds, gT_scr[t][:])
                dzT = bdot(g_scr[t][:], dsT)
                return dz, dzT
            zt = bdot(z_rt, g_scr[t][:])  # [bn, q0, q_t*r_{t+1}]
            rnext = r[t + 1]
            rest_next = rest_of[t + 1]
            dz_parts = []
            dzT_parts = []
            for a in range(q[t]):
                za = zt[:, :, a * rnext:(a + 1) * rnext]
                dsa = ds[:, :, a * rest_next:(a + 1) * rest_next]
                dsaT = dsT[:, a * rest_next:(a + 1) * rest_next, :]
                dza, dzaT = bwd_chain(t + 1, za, dsa, dsaT)
                dz_parts.append(dza)
                dzT_parts.append(dzaT)
            d_zt = jnp.concatenate(dz_parts, axis=2)    # [bn,q0,q_t*r_{t+1}]
            d_ztT = jnp.concatenate(dzT_parts, axis=1)  # [bn,q_t*r_{t+1},q0]
            if t == 1:
                # core 1: untransposed grad for the in-kernel one-hot dot
                gv = jax.lax.dot_general(
                    z0sT[:], d_zt, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )  # [bn, r1, q1*r2]
            else:
                # middle core (t >= 2): transposed grad, transpose-free
                gv = jax.lax.dot_general(
                    d_ztT, z_rt, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )  # [bn, q_t*r_{t+1}, r_t]
            gvals[t] = gv if t not in gvals else gvals[t] + gv
            dz = bdot(d_zt, gT_scr[t][:]) if t >= 2 else None
            dzT = bdot(g_scr[t][:], d_ztT)
            return dz, dzT

        def compute_block():
            jax.lax.fori_loop(0, bn // unroll, gbody, 0, unroll=True)
            d_row = drs[:]
            d_rowT = drsT[:]
            if ndim == 2:
                # single contraction level: core1 grad directly
                gv = jax.lax.dot_general(
                    z0sT[:], d_row, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )  # [bn, r1, q1]
                gvals[1] = gv
                dz0T = bdot(g_scr[1][:], d_rowT)  # [bn, r1, q0]
            else:
                _, dz0T = bwd_chain(1, g_scr[0][:], d_row, d_rowT)
            gvals[0] = dz0T  # [bn, r1, q0]

            vi = 0
            for i, (s_to, l_to, _, method) in enumerate(glayouts):
                v = gvals[i]
                _, s, l = v.shape
                if method == "vals":
                    # stream per-lookup slabs out; padding lanes are
                    # garbage, the wrapper slices them off.
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
            pl.when(base < live_ref[0])(compute_block)

            # Pallas does not zero-initialize outputs: a skipped block's
            # per-block "vals" slabs would otherwise hold uninitialized
            # VMEM/HBM garbage, and the host-side one-hot reduction's
            # 0-weight masking cannot neutralize NaN/Inf bit patterns
            # (0 * NaN = NaN). One cheap VMEM store per skipped block.
            @pl.when(base >= live_ref[0])
            def _():
                for i, (_, _, _, method) in enumerate(glayouts):
                    if method == "vals":
                        dg_refs[i][:] = jnp.zeros_like(dg_refs[i])
        else:
            compute_block()

    gdt = _GATHER_DTYPE if _BF16_GATHERS else jnp.float32
    n_in = ((1 if ndim > 2 else 0)          # idxv_core1
            + ndim                           # cores
            + 1 + max(0, ndim - 2)           # g0T + g2T..
            + 2)                             # dout_q, doutT
    scratch = [pltpu.VMEM((bn, q0, r1), gdt)]
    for t in range(1, ndim):
        scratch.append(pltpu.VMEM((bn, r[t], q[t] * r[t + 1]), gdt))
    scratch.append(pltpu.VMEM((bn, r1, q0), gdt))               # z0sT
    for t in range(2, ndim):
        scratch.append(
            pltpu.VMEM((bn, q[t] * r[t + 1], r[t]), gdt))       # gT_scr
    scratch.append(pltpu.VMEM((bn, q0, d_rest), gdt))           # drs
    scratch.append(pltpu.VMEM((bn, d_rest, q0), gdt))           # drsT
    # pad scratch for "dot" cores whose natural slab needs padding
    nat_dims = {1: (r1, g1_last)}
    for (s0, l0), (i, (s, l, _, m)) in [
        (nat_dims.get(i, (None, None)), (i, gl))
        for i, gl in enumerate(glayouts)
    ]:
        if m == "dot" and s0 is not None and (s0, l0) != (s, l):
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
    if _BF16_GATHERS:
        gk = tuple(g.astype(_GATHER_DTYPE) for g in gk)
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
    if len(p) > 2:
        args.append(idxv[1])
    if _BF16_GATHERS:
        gk = tuple(g.astype(_GATHER_DTYPE) for g in gk)
        dout_q = dout_q.astype(_GATHER_DTYPE)
        doutT = doutT.astype(_GATHER_DTYPE)
    args += list(gk)
    args.append(gk[0].transpose(0, 2, 1))        # g0T [tp0, r1, q0]
    for ci in range(2, len(p)):
        args.append(gk[ci].transpose(0, 2, 1))   # gT [tp_c, q_c*r_{c+1}, r_c]
    args.append(dout_q)
    args.append(doutT)
    dgs = list(call(*args))
    nnz_pad = n_blocks * block_n
    for i, (_, _, trans, method) in enumerate(_grad_layouts(p, q, r)):
        s1, s2 = gk[i].shape[1], gk[i].shape[2]
        si, li = (s2, s1) if trans else (s1, s2)
        if method == "vals":
            # [n_blocks, bn, s, l] per-lookup slabs -> ONE one-hot GEMM over
            # the whole nnz at HIGHEST precision (exact fp32). The slab is
            # flattened to 2D first (a bitcast) so the contraction is a
            # plain GEMM — contracting a 3D operand makes XLA materialize
            # an n-minor relayout copy (~0.25 ms/step each, from the
            # device trace); padding lanes are reduced too and sliced off
            # the small output instead.
            nb, bnk, sp, lp = dgs[i].shape
            oh = (idx_pad[i][:, None]
                  == jnp.arange(gk[i].shape[0], dtype=jnp.int32)[None, :])
            if live_count is not None:
                # skipped blocks stream garbage slabs; mask them out
                alive = (jnp.arange(nnz_pad, dtype=jnp.int32)
                         < live_count.astype(jnp.int32).reshape(())[None])
                oh = oh & alive[:, None]
            oh3 = oh.astype(jnp.float32).reshape(nb, bnk, -1)
            red = jax.lax.dot_general(
                oh3, dgs[i],
                (((0, 1), (0, 1)), ((), ())),
                precision=_VALS_REDUCE_PRECISION,
                preferred_element_type=jnp.float32,
            )  # [tp_i, sp, lp]
            dgs[i] = red[:, :si, :li]
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
