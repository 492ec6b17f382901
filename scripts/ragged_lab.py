#!/usr/bin/env python3
"""Can lax.ragged_dot beat the span-blocked kernels at small batch?

The flat pipeline's per-pass operation IS a ragged grouped GEMM: rows
sorted by core index form contiguous groups (spans), and span j needs
``y[rows_j] = x[rows_j] @ G[j]``. The span-blocked Pallas kernels pay a
masked full-segment concat per span (VPU work ~ p_rows * seg * bw), the
dominant waste at B=512 where spans are short. XLA's ragged_dot lowers
to the MoE grouped-GEMM path — this lab measures it head-to-head at the
headline pass shapes, including the block-diagonal rhs inflation it
needs (the kernels' stacked tables are dense; ragged_dot's [g, k, n]
rhs stores each group's block-diagonal expansion).

Run on TPU: python scripts/ragged_lab.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")


def slope(fn, k1=10, k2=60, reps=3):
    float(fn(3))
    vals = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(k1))
        t1 = time.perf_counter()
        float(fn(k2))
        t2 = time.perf_counter()
        vals.append(((t2 - t1) - (t1 - t0)) / (k2 - k1))
    return sorted(vals)[len(vals) // 2]


def main():
    import functools

    import jax
    import jax.numpy as jnp

    print(f"device={jax.devices()[0].device_kind}", flush=True)
    rng = np.random.default_rng(0)

    # headline-config pass shapes (B=512: nza=10240; B=8192: 163840)
    # i1 pass: groups=220, in 128 (q0*r1 block-diag of r1=32->q1*r2=128
    #          per q0=4 block), out 512
    # i2 pass: groups=250, in 512, out 64
    for nza in (10240, 163840):
        for (g, k, n, tag) in ((220, 128, 512, "i1"), (250, 512, 64, "i2")):
            x = jnp.asarray(
                rng.normal(size=(nza, k)).astype(np.float32)
            ).astype(jnp.bfloat16)
            tbl = jnp.asarray(
                rng.normal(size=(g, k, n)).astype(np.float32)
            ).astype(jnp.bfloat16)
            # roughly uniform spans
            sizes = np.full((g,), nza // g, np.int32)
            sizes[: nza - sizes.sum()] += 1
            gs = jnp.asarray(sizes)

            @functools.partial(jax.jit, static_argnums=(0,))
            def loop(kk, x0, tbl, gs):
                def body(i, carry):
                    xc, acc = carry
                    y = jax.lax.ragged_dot(
                        xc, tbl, gs,
                        preferred_element_type=jnp.float32)
                    return xc + 1e-6, acc + y[0, 0]
                _, acc = jax.lax.fori_loop(
                    0, kk, body, (x0, jnp.float32(0)))
                return acc

            def fn(kk):
                return float(loop(kk, x, tbl, gs))

            try:
                t = slope(fn)
                gb = (nza * (k + n) * 2 + g * k * n * 2) / 1e9
                print(f"ragged_dot {tag} nza={nza:6d} g={g} k={k} n={n}: "
                      f"{t*1e6:9.2f} us  ({gb/t:.0f} GB/s incl table)",
                      flush=True)
            except Exception as e:  # lowering may be unsupported
                print(f"ragged_dot {tag} nza={nza}: FAILED {e}",
                      flush=True)

    # the same op via one dense dot as an upper-speed reference
    for nza in (10240,):
        k, n = 512, 64
        x = jnp.asarray(rng.normal(size=(nza, k)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32)
                        ).astype(jnp.bfloat16)

        @functools.partial(jax.jit, static_argnums=(0,))
        def dloop(kk, x0, w):
            def body(i, carry):
                xc, acc = carry
                y = jnp.dot(xc, w, preferred_element_type=jnp.float32)
                return xc + 1e-6, acc + y[0, 0]
            _, acc = jax.lax.fori_loop(0, kk, body, (x0, jnp.float32(0)))
            return acc

        def fn(kk):
            return float(dloop(kk, x, w))

        t = slope(fn)
        print(f"dense dot      nza={nza:6d} k={k} n={n}: {t*1e6:9.2f} us",
              flush=True)


if __name__ == "__main__":
    main()
