#!/usr/bin/env python3
"""Validate + time the production Pallas kernels vs the XLA path on TPU."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from fbtt_embedding_tpu.ops.contraction import tt_rows
from fbtt_embedding_tpu.ops.indexing import decompose_indices
from fbtt_embedding_tpu.ops.lookup import pool_rows, tt_grads_from_row_cotangents
from fbtt_embedding_tpu.ops.pallas.tt_kernel import (
    kernel_available,
    tt_backward_pallas,
    tt_forward_pallas,
)
from fbtt_embedding_tpu.utils.init import init_tt_cores


def check(tag, a, b, tol):
    err = float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
    scale = float(np.max(np.abs(np.asarray(b)))) + 1e-30
    ok = err / scale < tol
    print(f"{'OK   ' if ok else 'BAD  '} {tag}: rel err {err/scale:.3e}")
    return ok


def run_case(p, q, ranks, b, L, T=1, weights=False, seed=0):
    rfull = [1] + ranks + [1]
    E, D = int(np.prod(p)), int(np.prod(q))
    nnz = b * L
    rng = np.random.default_rng(seed)
    cores = tuple(
        jnp.asarray(c)
        for c in init_tt_cores(rng, "uniform", T, E, D, p, q, rfull)
    )
    indices = jnp.asarray(rng.integers(0, E, size=nnz).astype(np.int32))
    rowidx = jnp.asarray(np.tile(np.repeat(np.arange(b), L // T), T)
                         .astype(np.int32)[:nnz])
    tableidx = (jnp.asarray((np.arange(nnz) // (nnz // T)).astype(np.int32))
                if T > 1 else None)
    w = (jnp.asarray(rng.random(nnz).astype(np.float32))
         if weights else None)
    d_out = jnp.asarray(rng.normal(size=(T, b, D)).astype(np.float32))
    idx_parts = decompose_indices(indices, p)

    # availability checked by caller

    fwd_pallas = jax.jit(lambda c: tt_forward_pallas(
        c, p, q, rfull, b, idx_parts, rowidx, tableidx, w))
    out_p = fwd_pallas(cores)

    @jax.jit
    def fwd_xla(c):
        rows = tt_rows(c, tuple(p), tuple(q), tuple(rfull), indices, tableidx)
        if w is not None:
            rows = rows * w[:, None]
        return pool_rows(rows, rowidx, tableidx, T, b)

    out_x = fwd_xla(cores)
    ok1 = check(f"fwd  T={T} w={weights}", out_p, out_x, 5e-3)

    bwd_pallas = jax.jit(lambda c: tt_backward_pallas(
        c, p, q, rfull, b, idx_parts, rowidx, d_out, tableidx, w))
    dg_p = bwd_pallas(cores)

    @jax.jit
    def bwd_xla(c):
        if tableidx is None:
            d_rows = d_out[0][rowidx]
        else:
            d_rows = d_out.reshape(T * b, D)[tableidx * b + rowidx]
        if w is not None:
            d_rows = d_rows * w[:, None]
        return tt_grads_from_row_cotangents(
            c, tuple(p), tuple(q), tuple(rfull), indices, tableidx, d_rows)

    dg_x = bwd_xla(cores)
    ok2 = all(
        check(f"bwd{i} T={T} w={weights}", a, b_, 5e-3)
        for i, (a, b_) in enumerate(zip(dg_p, dg_x))
    )
    return ok1 and ok2, (cores, idx_parts, rowidx, tableidx, w, d_out,
                         fwd_pallas, bwd_pallas, fwd_xla, bwd_xla)


def slope(loop_fn, k1=10, k2=60):
    float(loop_fn(3))
    t0 = time.perf_counter()
    float(loop_fn(k1))
    t1 = time.perf_counter()
    float(loop_fn(k2))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (k2 - k1)


def main():
    # benchmark config
    p, q, ranks = [200, 220, 250], [4, 4, 4], [32, 32]
    ok, ctx = run_case(p, q, ranks, 512, 20)
    # ndim=2
    ok2, _ = run_case([110, 100], [8, 8], [32], 256, 8)
    # table batched
    ok3, _ = run_case([40, 50, 50], [4, 4, 4], [16, 16], 128, 8, T=4)
    # weighted
    ok4, _ = run_case(p, q, ranks, 256, 8, weights=True)

    if not (ok and ok2 and ok3 and ok4):
        print("NUMERIC FAILURES")
        return

    # ---- timing at benchmark config
    (cores, idx_parts, rowidx, tableidx, w, d_out,
     fwd_p, bwd_p, fwd_x, bwd_x) = ctx
    rfull = [1] + ranks + [1]
    b = 512
    p0 = p[0]

    def fwd_p2(c, ip0):
        return tt_forward_pallas(
            c, p, q, rfull, b, [ip0, idx_parts[1], idx_parts[2]], rowidx,
            None, None)

    def bwd_p2(c, ip0):
        return tt_backward_pallas(
            c, p, q, rfull, b, [ip0, idx_parts[1], idx_parts[2]], rowidx,
            d_out, None, None)

    from fbtt_embedding_tpu.ops.contraction import tt_rows as _tt_rows

    def fwd_x2(c, ip0):
        idx = (ip0.astype(jnp.int32) * 55000
               + idx_parts[1].astype(jnp.int32) * 250
               + idx_parts[2].astype(jnp.int32))
        rows = _tt_rows(c, tuple(p), tuple(q), tuple(rfull), idx, None)
        return pool_rows(rows, rowidx, None, 1, b)

    def bwd_x2(c, ip0):
        idx = (ip0.astype(jnp.int32) * 55000
               + idx_parts[1].astype(jnp.int32) * 250
               + idx_parts[2].astype(jnp.int32))
        d_rows = d_out[0][rowidx]
        return tt_grads_from_row_cotangents(
            c, tuple(p), tuple(q), tuple(rfull), idx, None, d_rows)

    ip0 = idx_parts[0]

    @jax.jit
    def loop_fp(k):
        def body(_, c):
            o = fwd_p2(cores, (ip0 + c) % p0)
            return o[0, 0, 0].astype(jnp.int32) & 1
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    @jax.jit
    def loop_fx(k):
        def body(_, c):
            o = fwd_x2(cores, (ip0 + c) % p0)
            return o[0, 0, 0].astype(jnp.int32) & 1
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    @jax.jit
    def loop_bp(k):
        def body(_, c):
            g = bwd_p2(cores, (ip0 + c) % p0)
            return g[0][0, 0, 0].astype(jnp.int32) & 1
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    @jax.jit
    def loop_bx(k):
        def body(_, c):
            g = bwd_x2(cores, (ip0 + c) % p0)
            return g[0][0, 0, 0].astype(jnp.int32) & 1
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    print(f"fwd pallas: {slope(loop_fp)*1e3:.3f} ms   "
          f"fwd xla: {slope(loop_fx)*1e3:.3f} ms")
    print(f"bwd pallas: {slope(loop_bp)*1e3:.3f} ms   "
          f"bwd xla: {slope(loop_bx)*1e3:.3f} ms")


if __name__ == "__main__":
    main()
