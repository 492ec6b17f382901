#!/usr/bin/env python3
"""Prototype v2: Pallas TT forward with Mosaic-safe ops only.

Layouts (kernel storage):
  g0: [p0, q0, r1]          row i0 -> z0 [q0, r1]
  g1: [p1, r1, q1*r2]       row i1 -> [r1, q1*r2] (lanes q1-major)
  g2: [p2, r2, q2]          row i2 -> [r2, q2]
Output: [B, q0, q1*q2] (canonical (a0, a1, a2) order), host-reshaped [B, D].

Pipeline per nnz-block (BN lookups):
  gather loop (scalar-prefetched indices, dynamic row reads into scratch)
  c1: z1[n, a0, (a1 r2)]  — batched MXU dot or VPU r1-unroll
  c2: row[n, a0, (a1 a2)] — per-a1 lane-slice + batched dot, lane concat
  pool: ohT[b, n] = (iota_b == rowidx_n); out[:, a0, :] += ohT @ row[:, a0, :]
Padding: idx arrays padded to BN multiple; padded rowidx = -1 matches no b.
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_fwd(p, q, r, batch_size, nnz_padded, block_n=128, c1="mxu",
             c2="mxu", interpret=False):
    q0, q1, q2 = q
    r1, r2 = r[1], r[2]
    n_blocks = nnz_padded // block_n
    assert nnz_padded % block_n == 0
    bn = block_n

    def kernel(idx0_ref, idx1_ref, idx2_ref, rowv_ref, g0_ref, g1_ref,
               g2_ref, out_ref, z0s, g1s, g2s):
        blk = pl.program_id(0)

        @pl.when(blk == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        base = blk * bn

        def gbody(i, _):
            for u in range(8):
                n = i * 8 + u
                g = base + n
                z0s[n] = g0_ref[idx0_ref[g]]
                g1s[n] = g1_ref[idx1_ref[g]]
                g2s[n] = g2_ref[idx2_ref[g]]
            return 0

        jax.lax.fori_loop(0, bn // 8, gbody, 0, unroll=True)

        # ---- contraction 1: z1[n, a0, (a1 r2)]
        if c1 == "mxu":
            z1 = jax.lax.dot_general(
                z0s[:], g1s[:], (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        else:  # vpu r1-unroll
            z1 = jnp.zeros((bn, q0, q1 * r2), jnp.float32)
            for k in range(r1):
                z1 = z1 + z0s[:, :, k:k + 1] * g1s[:, k:k + 1, :]

        # ---- contraction 2 per a1 + lane concat: row[n, a0, (a1 a2)]
        pieces = []
        for a1 in range(q1):
            z1a = z1[:, :, a1 * r2:(a1 + 1) * r2]       # [BN, q0, r2]
            if c2 == "mxu":
                pa = jax.lax.dot_general(
                    z1a, g2s[:], (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )                                        # [BN, q0, q2]
            else:
                pa = jnp.zeros((bn, q0, q2), jnp.float32)
                for k in range(r2):
                    pa = pa + z1a[:, :, k:k + 1] * g2s[:, k:k + 1, :]
            pieces.append(pa)
        row = jnp.concatenate(pieces, axis=2)            # [BN, q0, q1*q2]

        # ---- pooling
        rowv = rowv_ref[blk]                             # [BN] int32
        iota_b = jax.lax.broadcasted_iota(jnp.int32, (batch_size, bn), 0)
        oht = (iota_b == rowv[None, :]).astype(jnp.float32)
        for a0 in range(q0):
            out_ref[a0] += jax.lax.dot_general(
                oht, row[:, a0, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (q0, batch_size, q1 * q2), lambda i, *_: (0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((bn, q0, r1), jnp.float32),
            pltpu.VMEM((bn, r1, q1 * r2), jnp.float32),
            pltpu.VMEM((bn, r2, q2), jnp.float32),
        ],
    )

    fwd = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((q0, batch_size, q1 * q2), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )

    def run(g0k, g1k, g2k, idx0, idx1, idx2, rowidx):
        out = fwd(idx0, idx1, idx2, rowidx.reshape(n_blocks, bn),
                  g0k, g1k, g2k)
        # [q0, B, q1*q2] -> [B, q0, q1*q2] -> [B, D]
        return out.transpose(1, 0, 2).reshape(batch_size, q0 * q1 * q2)

    return run


def kernel_layouts(cores, p, q, r):
    """Module storage [1, p_t, r*q*r'] -> kernel layouts."""
    q0, q1, q2 = q
    r1, r2 = r[1], r[2]
    # module core0: [p0, 1*q0*r1] -> [p0, q0, r1]
    g0k = cores[0][0].reshape(p[0], q0, r1)
    # module core1: [p1, r1*q1*r2] -> [p1, r1, q1*r2]
    g1k = cores[1][0].reshape(p[1], r1, q1 * r2)
    # module core2: [p2, r2*q2*1] -> [p2, r2, q2]
    g2k = cores[2][0].reshape(p[2], r2, q2)
    return g0k, g1k, g2k


def main():
    from fbtt_embedding_tpu.ops.contraction import tt_rows
    from fbtt_embedding_tpu.ops.indexing import decompose_indices
    from fbtt_embedding_tpu.ops.lookup import pool_rows
    from fbtt_embedding_tpu.utils.init import init_tt_cores

    small = "--small" in sys.argv
    interpret = "--interpret" in sys.argv
    if small:
        p, q, ranks = [8, 9, 10], [4, 4, 4], [8, 8]
        b, L = 16, 4
        bn = 32
    else:
        p, q, ranks = [200, 220, 250], [4, 4, 4], [32, 32]
        b, L = 512, 20
        bn = 128
    rfull = [1] + ranks + [1]
    E, D = int(np.prod(p)), int(np.prod(q))
    nnz = b * L
    nnz_padded = ((nnz + bn - 1) // bn) * bn

    rng = np.random.default_rng(0)
    cores = tuple(
        jnp.asarray(c)
        for c in init_tt_cores(rng, "uniform", 1, E, D, p, q, rfull)
    )
    indices = jnp.asarray(rng.integers(0, E, size=nnz).astype(np.int32))
    rowidx_np = np.repeat(np.arange(b), L).astype(np.int32)
    rowidx = jnp.asarray(rowidx_np)

    i_parts = [np.asarray(v) for v in decompose_indices(indices, p)]
    pad = nnz_padded - nnz
    ip = [jnp.asarray(np.pad(v, (0, pad))) for v in i_parts]
    rowp = jnp.asarray(np.pad(rowidx_np, (0, pad), constant_values=-1))

    g0k, g1k, g2k = kernel_layouts(cores, p, q, rfull)

    @jax.jit
    def ref(cores, indices, rowidx):
        rows = tt_rows(cores, tuple(p), tuple(q), tuple(rfull), indices, None)
        return pool_rows(rows, rowidx, None, 1, b)[0]

    out_ref = np.asarray(ref(cores, indices, rowidx))

    results = {}
    for c1 in ("mxu", "vpu"):
        for c2 in ("mxu", "vpu"):
            try:
                run = make_fwd(p, q, rfull, b, nnz_padded, bn, c1, c2,
                               interpret)
                jrun = jax.jit(run)
                out = np.asarray(jrun(g0k, g1k, g2k, *ip, rowp))
                err = np.max(np.abs(out - out_ref))
                scale = np.max(np.abs(out_ref)) + 1e-30
                print(f"c1={c1} c2={c2}: max abs err {err:.3e} "
                      f"(rel {err/scale:.3e})")
                results[(c1, c2)] = jrun
            except Exception as e:
                print(f"c1={c1} c2={c2}: FAIL {str(e).splitlines()[0][:110]}")

    if small or interpret:
        return

    # timing
    def slope(loop_fn, k1=10, k2=60):
        float(loop_fn(3))
        t0 = time.perf_counter()
        float(loop_fn(k1))
        t1 = time.perf_counter()
        float(loop_fn(k2))
        t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / (k2 - k1)

    for (c1, c2), jrun in results.items():
        @jax.jit
        def loop(k, jrun=jrun):
            def body(_, c):
                o = jrun(g0k, g1k, g2k, (ip[0] + c) % p[0], ip[1], ip[2],
                         rowp)
                return o[0, 0].astype(jnp.int32) & 1
            return jax.lax.fori_loop(0, k, body, jnp.int32(0))
        t = slope(loop)
        print(f"c1={c1} c2={c2}: {t*1e3:.3f} ms")

    @jax.jit
    def loop_ref(k):
        def body(_, c):
            o = ref(cores, (indices + c) % E, rowidx)
            return o[0, 0].astype(jnp.int32) & 1
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))
    print(f"xla reference: {slope(loop_ref)*1e3:.3f} ms")


if __name__ == "__main__":
    main()
