#!/usr/bin/env python3
"""Round-3 perf lab: isolated A/Bs for the B>=2048 linear costs.

Sections (--only to pick):
  gather  - [nnz, 512] bf16 row-gather (the sort-order permute) vs the
            u32 bitcast-packed variant (2 lane-tiles/row instead of 4)
            vs fp32. Gather cost on TPU is lane-tile-, not byte-, bound.
  lfu     - scatter-add of nnz ids into s32[11M]: plain vs chunked
            (k slabs, each <= ~16 MB so the RMW stays cheap) vs sorted.
  z0      - z0 = g0f[i0] gather from a [201, 128] table vs one-hot MXU.
  seg     - full fused step at several batch sizes (run separately with
            FBTT_SEG=... env; this section just prints the active SEG).

All comparisons are within-run (co-tenancy epochs make cross-run deltas
meaningless); slope timing with >=250 ms windows, median of 3.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def slope(fn, reps=3):
    float(fn(3))
    t0 = time.perf_counter()
    float(fn(8))
    est = max((time.perf_counter() - t0) / 8, 1e-6)
    k2 = min(max(20, int(0.25 / est)), 2000)
    k1 = max(k2 // 5, 2)
    vals = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(k1))
        t1 = time.perf_counter()
        float(fn(k2))
        t2 = time.perf_counter()
        vals.append(((t2 - t1) - (t1 - t0)) / (k2 - k1))
    return sorted(vals)[len(vals) // 2]


def rep(name, t, nnz=None):
    extra = f"  ({t / nnz * 1e9:7.2f} ns/row)" if nnz else ""
    print(f"{name:56s} {t * 1e3:9.4f} ms{extra}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="gather,lfu,z0")
    ap.add_argument("--nnz", type=int, default=163840)
    ap.add_argument("--batch", type=int, default=8192)
    args = ap.parse_args()
    only = set(args.only.split(","))

    import jax
    import jax.numpy as jnp
    from jax import lax

    print(f"device={jax.devices()[0].device_kind}", flush=True)
    rng = np.random.default_rng(0)
    nnz = args.nnz

    if "gather" in only:
        w = 512
        x16 = jnp.asarray(
            rng.standard_normal((nnz, w)).astype(np.float32)
        ).astype(jnp.bfloat16)
        perm_np = rng.permutation(nnz).astype(np.int32)
        perm = jnp.asarray(perm_np)
        # block-contiguous permutation: runs of 4 consecutive rows (what
        # a (i1,i2)/(i2,i1) composite double-sort would produce at B=8k)
        runs4 = jnp.asarray(
            (rng.permutation(nnz // 4)[:, None] * 4
             + np.arange(4)[None, :]).reshape(-1).astype(np.int32))

        # carry-dependent index offset so the gather cannot be hoisted
        # out of the loop (always 0 at runtime, unprovable at compile)
        def dep0(c):
            return lax.select(c[0] < jnp.float32(1e30),
                              jnp.int32(0), jnp.int32(1))

        def run_any(k, x, pm):
            def body(i, c):
                y = x[pm + dep0(c)]
                return c + y[0].astype(jnp.float32)
            return lax.fori_loop(
                0, k, body, jnp.zeros((w,), jnp.float32))[0]

        def run_packed(k, x, pm):
            xu = lax.bitcast_convert_type(
                x.reshape(nnz, w // 2, 2), jnp.uint32)

            def body(i, c):
                y = xu[pm + dep0(c)]
                yb = lax.bitcast_convert_type(
                    y, jnp.bfloat16).reshape(nnz, w)
                return c + yb[0].astype(jnp.float32)
            return lax.fori_loop(
                0, k, body, jnp.zeros((w,), jnp.float32))[0]

        jr = jax.jit(run_any)
        jp = jax.jit(run_packed)
        rep("bf16 [nnz,512] row-gather",
            slope(lambda k: jr(k, x16, perm)), nnz)
        rep("u32-packed [nnz,256] row-gather",
            slope(lambda k: jp(k, x16, perm)), nnz)
        rep("bf16 row-gather, runs-of-4 perm",
            slope(lambda k: jr(k, x16, runs4)), nnz)
        rep("u32-packed row-gather, runs-of-4 perm",
            slope(lambda k: jp(k, x16, runs4)), nnz)
        x32 = x16.astype(jnp.float32)
        rep("fp32 [nnz,512] row-gather",
            slope(lambda k: jr(k, x32, perm)), nnz)

    if "g64" in only:
        # u64 packing: 4 bf16 lanes per element -> a 512-bf16 row is 128
        # u64 lanes = ONE lane-tile if XLA stores u64 natively.
        # Run with JAX_ENABLE_X64=1.
        assert jax.config.jax_enable_x64, "run with JAX_ENABLE_X64=1"
        w = 512
        x16 = jnp.asarray(
            rng.standard_normal((nnz, w)).astype(np.float32)
        ).astype(jnp.bfloat16)
        perm = jnp.asarray(rng.permutation(nnz).astype(np.int32))

        def dep0(c):
            return lax.select(c[0] < jnp.float32(1e30),
                              jnp.int32(0), jnp.int32(1))

        def run_p64(k, x, pm):
            xu = lax.bitcast_convert_type(
                x.reshape(nnz, w // 4, 4), jnp.uint64)

            def body(i, c):
                y = xu[pm + dep0(c)]
                yb = lax.bitcast_convert_type(
                    y, jnp.bfloat16).reshape(nnz, w)
                return c + yb[0].astype(jnp.float32)
            return lax.fori_loop(
                0, k, body, jnp.zeros((w,), jnp.float32))[0]

        try:
            j64 = jax.jit(run_p64)
            rep("u64-packed [nnz,128] row-gather",
                slope(lambda k: j64(k, x16, perm)), nnz)
            a = np.asarray(x16[perm])
            b = np.asarray(lax.bitcast_convert_type(
                lax.bitcast_convert_type(
                    x16.reshape(nnz, w // 4, 4), jnp.uint64)[perm],
                jnp.bfloat16).reshape(nnz, w))
            print(f"u64 packed bit-exact: {(a == b).all()}", flush=True)
        except Exception as e:  # u64 may be unsupported on TPU
            print(f"u64 packing unavailable: {type(e).__name__}: {e}",
                  flush=True)
        # exactness
        a = np.asarray(x16[perm])
        b = np.asarray(lax.bitcast_convert_type(
            lax.bitcast_convert_type(
                x16.reshape(nnz, w // 2, 2), jnp.uint32)[perm],
            jnp.bfloat16).reshape(nnz, w))
        assert (a == b).all(), "packed gather not bit-exact"
        print("packed gather bit-exact: ok", flush=True)

    if "lfu" in only:
        E = 11_000_000
        for n_idx in (10240, nnz):
            idx = jnp.asarray(
                rng.integers(0, E, size=n_idx).astype(np.int32))
            freq0 = jnp.zeros((E,), jnp.int32)

            def run_plain(k, freq0=freq0, idx=idx):
                def body(i, f):
                    return f.at[idx + (i - i)].add(
                        1, mode="promise_in_bounds")
                f = lax.fori_loop(0, k, body, freq0)
                return f[0].astype(jnp.float32)

            def depi(f):
                return lax.select(f[0] < jnp.int32(2**30),
                                  jnp.int32(0), jnp.int32(1))

            def run_sorted(k, freq0=freq0, idx=idx):
                def body(i, f):
                    s = jax.lax.sort(idx + depi(f))
                    return f.at[s].add(1, mode="promise_in_bounds")
                f = lax.fori_loop(0, k, body, freq0)
                return f[0].astype(jnp.float32)

            def make_chunked(nchunk, idx=idx):
                C = -(-E // nchunk)

                def run(k, freq0=freq0):
                    def body(i, f):
                        s = jax.lax.sort(idx + depi(f))
                        for c in range(nchunk):
                            sl = lax.dynamic_slice(f, (c * C,), (C,))
                            loc = s - c * C
                            ok = (loc >= 0) & (loc < C)
                            loc = jnp.clip(loc, 0, C - 1)
                            sl = sl.at[loc].add(
                                ok.astype(jnp.int32),
                                mode="promise_in_bounds")
                            f = lax.dynamic_update_slice(f, sl, (c * C,))
                        return f
                    f = lax.fori_loop(0, k, body, freq0)
                    return f[0].astype(jnp.float32)
                return run

            print(f"-- lfu n_idx={n_idx}", flush=True)
            rep("plain scatter-add into s32[11M]",
                slope(jax.jit(run_plain)), n_idx)
            rep("sorted scatter-add", slope(jax.jit(run_sorted)), n_idx)
            for nc in (4, 8):
                rep(f"sorted chunked x{nc} slab scatter",
                    slope(jax.jit(make_chunked(nc))), n_idx)

    if "z0" in only:
        tbl = jnp.asarray(
            rng.standard_normal((201, 128)).astype(np.float32)
        ).astype(jnp.bfloat16)
        i0 = jnp.asarray(rng.integers(0, 200, size=nnz).astype(np.int32))

        def dep0(c):
            return lax.select(c[0] < jnp.float32(1e30),
                              jnp.int32(0), jnp.int32(1))

        def run_gather(k):
            def body(i, c):
                y = tbl[i0 + dep0(c)]
                return c + y[0].astype(jnp.float32)
            return lax.fori_loop(
                0, k, body, jnp.zeros((128,), jnp.float32))[0]

        def run_onehot(k):
            def body(i, c):
                oh = (i0[:, None] + dep0(c)
                      == jnp.arange(201, dtype=jnp.int32)[None, :]
                      ).astype(jnp.bfloat16)
                y = jnp.dot(oh, tbl,
                            preferred_element_type=jnp.float32)
                return c + y[0]
            return lax.fori_loop(
                0, k, body, jnp.zeros((128,), jnp.float32))[0]

        rep("z0: gather from [201,128] table", slope(jax.jit(run_gather)),
            nnz)
        rep("z0: one-hot MXU [nnz,201]@[201,128]",
            slope(jax.jit(run_onehot)), nnz)

        # the backward's dout gather: [nnz] rows from a [8192, 64] table
        dout = jnp.asarray(
            rng.standard_normal((8192, 64)).astype(np.float32)
        ).astype(jnp.bfloat16)
        ridx = jnp.asarray(
            np.sort(rng.integers(0, 8192, size=nnz)).astype(np.int32))

        def run_dout(k):
            def body(i, c):
                y = dout[ridx + dep0(c)]
                return c + y[0].astype(jnp.float32)
            return lax.fori_loop(
                0, k, body, jnp.zeros((64,), jnp.float32))[0]

        rep("dout: gather [nnz] rows from [8192,64]",
            slope(jax.jit(run_dout)), nnz)

    if "step" in only:
        # one fused train step at --batch under the current env knobs
        import jax.numpy as jnp

        from fbtt_embedding_tpu import OptimType, TTEmbeddingParams
        from fbtt_embedding_tpu.models.tt_embedding import (
            make_fused_train_step,
        )
        from fbtt_embedding_tpu.ops.pallas import tt_flat
        from fbtt_embedding_tpu.utils.init import init_tt_cores

        b = args.batch
        p_, q_, ranks = [200, 220, 250], [4, 4, 4], [32, 32]
        rfull = [1] + ranks + [1]
        E = int(np.prod(p_))
        L = 20
        n = b * L
        cores = tuple(
            jnp.asarray(c) for c in
            init_tt_cores(rng, "uniform", 1, E, 64, p_, q_, rfull))
        idx = jnp.asarray(rng.integers(0, E, size=n).astype(np.int32))
        offsets = jnp.asarray(np.arange(0, n + 1, L, dtype=np.int32))
        d_out = jnp.asarray(
            (rng.random((1, b, 64)) * 1e-3).astype(np.float32))
        lr_eps = (jnp.float32(0.01), jnp.float32(1e-10))
        step = make_fused_train_step(p_, q_, rfull, 1, b, OptimType.SGD)
        prm = TTEmbeddingParams(
            tuple(jnp.copy(c) for c in cores),
            tuple(jnp.zeros((0,), jnp.float32) for _ in cores), None)

        import functools as _ft

        @_ft.partial(jax.jit, donate_argnums=(1,))
        def loop(k, prm0):
            def body(_, pr):
                _, p2 = step(pr, idx, offsets, d_out, lr_eps)
                return p2
            pr = jax.lax.fori_loop(0, k, body, prm0)
            return pr.tt_cores[0][0, 0, 0], pr

        holder = {"prm": prm}

        def fn(k):
            out, holder["prm"] = loop(k, holder["prm"])
            return out

        knobs = {k: v for k, v in os.environ.items()
                 if k.startswith("FBTT_")}
        rep(f"fused step B={b} seg={tt_flat._seg_for(n)} {knobs}",
            slope(fn), n)


if __name__ == "__main__":
    main()
