#!/usr/bin/env python3
"""Kernel-level perf experiments for the flat pipeline (run on TPU).

Times each segment-grid pass standalone (slope method: k reps inside one
jitted fori_loop with a carried data dependency), sweeps SEG, and A/Bs
kernel variants — the measurement loop behind docs/PERF.md.

Usage: python scripts/perf_lab.py [--batch-size 512] [--exp all]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def slope_time(make_loop, k1=10, k2=40):
    float(make_loop(3))
    t0 = time.perf_counter()
    float(make_loop(k1))
    t1 = time.perf_counter()
    float(make_loop(k2))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (k2 - k1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--pooling-factor", type=int, default=20)
    ap.add_argument("--exp", default="passes",
                    choices=["passes", "seg", "lfu", "step"])
    ap.add_argument("--seg", type=int, default=None)
    ap.add_argument("--only", default=None,
                    help="substring filter on experiment names")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fbtt_embedding_tpu.ops.pallas import tt_flat
    from fbtt_embedding_tpu.ops.pallas.tt_flat import (
        _build_plan, _seg_accum_call, _seg_transform_call, _seg_fused_i2_call,
        _bd_widths, _flat_setup, SEG,
    )
    from fbtt_embedding_tpu.utils.init import init_tt_cores

    if args.seg:
        tt_flat.SEG = args.seg

    p, q, ranks = [200, 220, 250], [4, 4, 4], [32, 32]
    rfull = [1] + ranks + [1]
    b, L = args.batch_size, args.pooling_factor
    E, D = int(np.prod(p)), int(np.prod(q))
    nnz = b * L

    rng = np.random.default_rng(0)
    cores = tuple(
        jnp.asarray(c)
        for c in init_tt_cores(rng, "uniform", 1, E, D, p, q, rfull))
    indices = jnp.asarray(rng.integers(0, E, size=(nnz,)).astype(np.int32))
    rowidx = jnp.asarray(np.repeat(np.arange(b), L).astype(np.int32))
    d_out = jnp.asarray((rng.random((1, b, D)) * 1e-3).astype(np.float32))

    seg = tt_flat.SEG
    print(f"device={jax.devices()[0].device_kind} nnz={nnz} SEG={seg}")

    dt = jnp.bfloat16
    plan = jax.jit(
        lambda idx: _build_plan(idx, rowidx, None, None, None, p, 1, b)[0]
    )(indices)
    nza = -(-nnz // seg) * seg
    nseg = nza // seg
    g0f, gk, tables, widths = _flat_setup(cores, tuple(p), tuple(q),
                                          tuple(rfull), dt)
    # staged states
    i0c = jnp.where(plan.alive1, plan.i0_s1, p[0])
    z0 = g0f[i0c]
    mm1, bi1, bo1 = widths[0]
    mm2, bi2, bo2 = widths[1]
    z1 = _seg_transform_call(nseg, q[0], bi1, bo1, p[1], "bfloat16",
                             "bfloat16", False)(
        plan.runs[0], plan.first[0], plan.cnt[0], z0, tables[0])
    z1p = z1[plan.perm_fwd[0]]
    dflat = jnp.concatenate(
        [d_out.reshape(b, D).astype(dt), jnp.zeros((1, D), dt)])
    rowc = jnp.where(plan.rowidx_last >= 0, plan.rowidx_last, b)
    dz2 = dflat[rowc]
    for x in (z0, z1, z1p, dz2):
        x.block_until_ready()

    def report(name, fn):
        if args.only and args.only not in name:
            return
        t = slope_time(fn)
        print(f"{name:42s} {t*1e3:8.3f} ms", flush=True)

    def perturb(x, c):
        return x + (c % 2).astype(x.dtype) * 1e-6

    if args.exp in ("passes", "seg"):
        @jax.jit
        def loop_t1(k):
            def body(_, c):
                out = _seg_transform_call(
                    nseg, q[0], bi1, bo1, p[1], "bfloat16", "bfloat16",
                    False)(
                    plan.runs[0], plan.first[0], plan.cnt[0],
                    perturb(z0, c), tables[0])
                return out[0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))

        report("i1 transform", loop_t1)

        @jax.jit
        def loop_t2(k):
            def body(_, c):
                out = _seg_transform_call(
                    nseg, q[0], bi2, bo2, p[2], "bfloat16", "bfloat16",
                    False)(
                    plan.runs[1], plan.first[1], plan.cnt[1],
                    perturb(z1p, c), tables[1])
                return out[0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))

        report("i2 transform", loop_t2)

        @jax.jit
        def loop_a2(k):
            def body(_, c):
                acc, dz = _seg_accum_call(
                    nseg, q[0], bi2, bo2, p[2], "bfloat16", "bfloat16",
                    False)(
                    plan.runs[1], plan.first[1], plan.cnt[1],
                    perturb(z1p, c), dz2, tables[1])
                return acc[0, 0, 0] + dz[0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))

        report("i2 accum (dG2 + dZ1)", loop_a2)

        @jax.jit
        def loop_a1(k):
            def body(_, c):
                acc, dz = _seg_accum_call(
                    nseg, q[0], bi1, bo1, p[1], "bfloat16", "float32",
                    False)(
                    plan.runs[0], plan.first[0], plan.cnt[0],
                    perturb(z0, c), z1, tables[0])
                return acc[0, 0, 0] + dz[0, 0]
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))

        report("i1 accum (dG1 + dz0)", loop_a1)

        @jax.jit
        def loop_f2(k):
            def body(_, c):
                acc, dz, rows = _seg_fused_i2_call(
                    nseg, q[0], bi2, bo2, p[2], "bfloat16", False)(
                    plan.runs[1], plan.first[1], plan.cnt[1],
                    perturb(z1p, c), dz2, tables[1])
                return (acc[0, 0, 0] + dz[0, 0].astype(jnp.float32)
                        + rows[0, 0].astype(jnp.float32))
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))

        report("fused i2 (rows + dZ1 + dG2)", loop_f2)

        @jax.jit
        def loop_a2t(k):
            def body(_, c):
                acc, dz = _seg_accum_call(
                    nseg, q[0], bi2, bo2, p[2], "bfloat16", "bfloat16",
                    False, acc_t=True)(
                    plan.runs[1], plan.first[1], plan.cnt[1],
                    perturb(z1p, c), dz2, tables[1])
                return acc[0, 0, 0] + dz[0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))

        report("i2 accum TRANSPOSED acc", loop_a2t)

        @jax.jit
        def loop_a1t(k):
            def body(_, c):
                acc, dz = _seg_accum_call(
                    nseg, q[0], bi1, bo1, p[1], "bfloat16", "float32",
                    False, acc_t=True)(
                    plan.runs[0], plan.first[0], plan.cnt[0],
                    perturb(z0, c), z1, tables[0])
                return acc[0, 0, 0] + dz[0, 0]
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))

        report("i1 accum TRANSPOSED acc", loop_a1t)

        @jax.jit
        def loop_plan(k):
            def body(_, c):
                pl_, _ = _build_plan(
                    (indices + c.astype(jnp.int32)) % E, rowidx, None,
                    None, None, p, 1, b)
                return pl_.i0_s1[0].astype(jnp.float32)
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))

        report("plan (sorts + spans + inv perms)", loop_plan)

        @jax.jit
        def loop_perm(k):
            def body(_, c):
                out = perturb(z1, c)[plan.perm_fwd[0]]
                return out[0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))

        report("one [nnz, 512]bf16 permute gather", loop_perm)

    if args.exp == "lfu":
        from fbtt_embedding_tpu.ops import cache as cache_ops
        from fbtt_embedding_tpu.ops.cache import make_cache_state

        cache = make_cache_state(E, int(0.1 * E), D, "none",
                                 num_embeddings=E)
        zipf = jnp.asarray(
            (rng.zipf(1.05, size=nnz) % E).astype(np.int32))

        for name, idx0 in [("uniform", indices), ("zipf1.05", zipf)]:
            @jax.jit
            def loop_lfu(k, idx0=idx0):
                def body(_, carry):
                    fr, c = carry
                    idx = (idx0 + c) % E
                    st = cache_ops.update_cache_state(
                        cache.replace(freq=fr), idx)
                    return st.freq, c + 1
                fr, _ = jax.lax.fori_loop(
                    0, k, body, (cache.freq, jnp.int32(0)))
                return fr[0]

            report(f"LFU direct scatter ({name})", loop_lfu)

    if args.exp == "step":
        from fbtt_embedding_tpu import OptimType, TTEmbeddingParams
        from fbtt_embedding_tpu.models.tt_embedding import (
            make_fused_train_step,
        )
        from fbtt_embedding_tpu.ops.cache import make_cache_state

        offsets = jnp.asarray(np.arange(0, nnz + 1, L, dtype=np.int32))
        lr_eps = (jnp.float32(0.01), jnp.float32(1e-10))
        for cache_on in (False, True):
            step = make_fused_train_step(
                p, q, rfull, 1, b, OptimType.SGD, use_cache=cache_on)
            cch = (make_cache_state(E, int(0.1 * E), D, "none",
                                    num_embeddings=E)
                   if cache_on else None)
            prm = TTEmbeddingParams(
                cores, tuple(jnp.zeros((0,), jnp.float32) for _ in cores),
                cch)

            @jax.jit
            def loop_full(k, prm0=prm, step=step):
                def body(_, pr):
                    _, p2 = step(pr, indices, offsets, d_out, lr_eps)
                    return p2
                pr = jax.lax.fori_loop(0, k, body, prm0)
                return pr.tt_cores[0][0, 0, 0]

            report(f"full fused step (cache={cache_on})", loop_full)


if __name__ == "__main__":
    main()
