#!/usr/bin/env python3
"""Prototype: Pallas fused TT-embedding forward (gather+chain+pool in VMEM).

Validates numerics vs the XLA path and times it on the real TPU.
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


def make_fwd_kernel(p, q, r, batch_size, nnz, block_n=256, unroll=8):
    """ndim=3, num_tables=1 TT lookup+pool kernel.

    Cores (VMEM, full):
      g0: [p0, q0*r1]     (row i0 -> [q0, r1])
      g1: [p1, r1*q1*r2]  (row i1 -> [r1, q1*r2])
      g2: [p2, r2*q2]     (row i2 -> [r2, q2])
    Scalar-prefetch: idx0, idx1, idx2, rowidx (int32[nnz]).
    Output: [batch_size, q0*q1*q2] accumulated across sequential grid steps.
    """
    q0, q1, q2 = q
    r1, r2 = r[1], r[2]
    d = q0 * q1 * q2
    n_blocks = pl.cdiv(nnz, block_n)

    def kernel(idx0_ref, idx1_ref, idx2_ref, row_ref, g0_ref, g1_ref, g2_ref,
               out_ref, acc_ref):
        blk = pl.program_id(0)

        @pl.when(blk == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        base = blk * block_n

        def body(i, _):
            # unrolled group of `unroll` lookups
            for u in range(unroll):
                n = base + i * unroll + u

                @pl.when(n < nnz)
                def _():
                    i0 = idx0_ref[n]
                    i1 = idx1_ref[n]
                    i2 = idx2_ref[n]
                    rw = row_ref[n]
                    z0 = g0_ref[i0, :].reshape(q0, r1)
                    g1 = g1_ref[i1, :].reshape(r1, q1 * r2)
                    z1 = jax.lax.dot_general(
                        z0, g1, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).reshape(q0 * q1, r2)
                    g2 = g2_ref[i2, :].reshape(r2, q2)
                    row = jax.lax.dot_general(
                        z1, g2, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).reshape(1, d)
                    out_ref[pl.ds(rw, 1), :] += row

            return 0

        jax.lax.fori_loop(0, pl.cdiv(block_n, unroll), body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (batch_size, d), lambda i, *_: (0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
    )

    fwd = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((batch_size, d), jnp.float32),
        grid_spec=grid_spec,
    )

    @jax.jit
    def run(cores, idx0, idx1, idx2, rowidx):
        g0 = cores[0][0]                       # [p0, q0*r1]
        g1 = cores[1][0]                       # [p1, r1*q1*r2]
        g2 = cores[2][0]                       # [p2, r2*q2]
        return fwd(idx0, idx1, idx2, rowidx, g0, g1, g2)

    return run


def main():
    from fbtt_embedding_tpu.ops.contraction import tt_rows
    from fbtt_embedding_tpu.ops.indexing import decompose_indices
    from fbtt_embedding_tpu.ops.lookup import pool_rows
    from fbtt_embedding_tpu.utils.init import init_tt_cores

    small = "--small" in sys.argv
    if small:
        p, q, ranks = [8, 9, 10], [4, 4, 4], [8, 8]
        b, L = 16, 4
    else:
        p, q, ranks = [200, 220, 250], [4, 4, 4], [32, 32]
        b, L = 512, 20
    rfull = [1] + ranks + [1]
    E, D = int(np.prod(p)), int(np.prod(q))
    nnz = b * L

    rng = np.random.default_rng(0)
    cores = tuple(
        jnp.asarray(c)
        for c in init_tt_cores(rng, "uniform", 1, E, D, p, q, rfull)
    )
    indices = jnp.asarray(rng.integers(0, E, size=nnz).astype(np.int32))
    rowidx = jnp.asarray(np.repeat(np.arange(b), L).astype(np.int32))

    i0, i1, i2 = [np.asarray(v) for v in decompose_indices(indices, p)]
    i0, i1, i2 = (jnp.asarray(i0), jnp.asarray(i1), jnp.asarray(i2))

    run = make_fwd_kernel(p, q, rfull, b, nnz)
    out_pallas = run(cores, i0, i1, i2, rowidx)

    @jax.jit
    def ref(cores, indices, rowidx):
        rows = tt_rows(cores, tuple(p), tuple(q), tuple(rfull), indices, None)
        return pool_rows(rows, rowidx, None, 1, b)[0]

    out_ref = ref(cores, indices, rowidx)
    err = float(jnp.max(jnp.abs(out_pallas - out_ref)))
    rel = err / (float(jnp.max(jnp.abs(out_ref))) + 1e-30)
    print(f"max abs err: {err:.3e}  (rel {rel:.3e})")

    if small:
        return

    # --- timing (slope method, loop-carried dependency)
    def slope(loop_fn, k1=10, k2=60):
        float(loop_fn(3))
        t0 = time.perf_counter()
        float(loop_fn(k1))
        t1 = time.perf_counter()
        float(loop_fn(k2))
        t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / (k2 - k1)

    @jax.jit
    def loop_pallas(k):
        def body(_, c):
            o = run(cores, (i0 + c) % p[0], i1, i2, rowidx)
            return o[0, 0].astype(jnp.int32) & 1
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    @jax.jit
    def loop_ref(k):
        def body(_, c):
            o = ref(cores, (indices + c) % E, rowidx)
            return o[0, 0].astype(jnp.int32) & 1
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    t_p = slope(loop_pallas)
    t_r = slope(loop_ref)
    print(f"pallas fwd: {t_p*1e3:.3f} ms   xla fwd: {t_r*1e3:.3f} ms   "
          f"speedup {t_r/t_p:.2f}x")


if __name__ == "__main__":
    main()
