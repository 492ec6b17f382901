#!/usr/bin/env python3
"""Pair-interleaved TT vs uncompressed A/B at the headline batch.

The tunneled v5e chip is co-tenanted: identical compiled programs
measure in EPOCHS (docs/PERF.md "Measurement on a tunneled chip"), so a
TT number from one epoch divided by a baseline number from another is
noise. This battery robustifies the ratio the round-4 verdict flagged:
every ROUND measures all variants back-to-back (TT counting-on, TT
counting-off, uncompressed baseline — each one slope window, seconds
apart), so each round's ratios are within-epoch by construction, and
the median over rounds survives epoch drift that a single battery run
cannot.

Usage: python scripts/paired_ab.py [--batch-size 512] [--rounds 8]
Prints per-round times + ratios and the median/min/max summary.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--pooling-factor", type=int, default=20)
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--window", type=float, default=0.3,
                    help="target seconds of device work per slope window")
    args = ap.parse_args()

    import functools

    import jax
    import jax.numpy as jnp

    from fbtt_embedding_tpu import OptimType, TTEmbeddingParams
    from fbtt_embedding_tpu.models.tt_embedding import make_fused_train_step
    from fbtt_embedding_tpu.ops.cache import make_cache_state
    from fbtt_embedding_tpu.ops.indexing import rowidx_from_offsets
    from fbtt_embedding_tpu.utils.init import init_tt_cores

    p, q, ranks = [200, 220, 250], [4, 4, 4], [32, 32]
    rfull = [1] + ranks + [1]
    E, D = int(np.prod(p)), int(np.prod(q))
    b, L = args.batch_size, args.pooling_factor
    nnz = b * L
    rng = np.random.default_rng(0)
    cores = tuple(
        jnp.asarray(c)
        for c in init_tt_cores(rng, "uniform", 1, E, D, p, q, rfull))
    indices = jnp.asarray(rng.integers(0, E, size=nnz).astype(np.int32))
    offsets = jnp.asarray(np.arange(0, nnz + 1, L, dtype=np.int32))
    d_out = jnp.asarray((rng.random((1, b, D)) * 1e-3).astype(np.float32))
    lr_eps = (jnp.float32(0.01), jnp.float32(1e-10))
    print(f"device={jax.devices()[0].device_kind} B={b} nnz={nnz}",
          flush=True)

    def make_tt(counting: bool):
        step = make_fused_train_step(p, q, rfull, 1, b, OptimType.SGD,
                                     use_cache=counting)
        cch = (make_cache_state(E, int(0.1 * E), D, "none",
                                num_embeddings=E) if counting else None)
        prm = TTEmbeddingParams(
            tuple(jnp.copy(c) for c in cores),
            tuple(jnp.zeros((0,), jnp.float32) for _ in cores), cch)

        @functools.partial(jax.jit, donate_argnums=(1,))
        def loop(k, prm0):
            def body(_, pr):
                _, p2 = step(pr, indices, offsets, d_out, lr_eps)
                return p2
            pr = jax.lax.fori_loop(0, k, body, prm0)
            return pr.tt_cores[0][0, 0, 0], pr

        holder = {"prm": prm}

        def fn(k):
            out, holder["prm"] = loop(k, holder["prm"])
            return out

        return fn

    def make_baseline():
        # gather + segment-sum + fused scatter-add SGD on the dense
        # [E, D] table — same harness as perf_battery/benchmark
        weight = jnp.asarray(rng.standard_normal((E, D)).astype(np.float32))

        @functools.partial(jax.jit, donate_argnums=(1,))
        def loop(k, w0):
            rowidx, _ = rowidx_from_offsets(offsets, nnz, 1, b)

            def body(_, carry):
                wc, acc = carry
                rows = wc[indices]
                out = jax.ops.segment_sum(rows, rowidx, num_segments=b)
                d_rows = d_out[0][rowidx]
                wc = wc.at[indices].add(-0.01 * d_rows)
                return wc, acc + out[0, 0]
            wc, acc = jax.lax.fori_loop(
                0, k, body, (w0, jnp.zeros((D,), jnp.float32)))
            return wc[0, 0] + acc[0], wc

        holder = {"w": weight}

        def fn(k):
            out, holder["w"] = loop(k, holder["w"])
            return out

        return fn

    variants = [
        ("tt_count_on", make_tt(True)),
        ("tt_count_off", make_tt(False)),
        ("uncompressed", make_baseline()),
    ]

    # compile + warm + per-variant window sizing
    ks = {}
    for name, fn in variants:
        t0 = time.perf_counter()
        float(fn(3))
        print(f"  compiled {name} in {time.perf_counter()-t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        float(fn(8))
        est = max((time.perf_counter() - t0) / 8, 1e-5)
        k2 = min(max(20, int(args.window / est)), 700)
        ks[name] = (max(k2 // 5, 2), k2)
    print(f"windows: { {n: ks[n] for n, _ in variants} }", flush=True)

    results = {n: [] for n, _ in variants}
    for r in range(args.rounds):
        row = {}
        for name, fn in variants:
            k1, k2 = ks[name]
            t0 = time.perf_counter()
            float(fn(k1))
            t1 = time.perf_counter()
            float(fn(k2))
            t2 = time.perf_counter()
            per = ((t2 - t1) - (t1 - t0)) / (k2 - k1)
            results[name].append(per)
            row[name] = per
        print(
            f"round {r}: on={row['tt_count_on']*1e3:7.3f} ms  "
            f"off={row['tt_count_off']*1e3:7.3f} ms  "
            f"base={row['uncompressed']*1e3:7.3f} ms  "
            f"ratio_on={row['uncompressed']/row['tt_count_on']:5.2f}x  "
            f"ratio_off={row['uncompressed']/row['tt_count_off']:5.2f}x",
            flush=True)

    on = np.array(results["tt_count_on"])
    off = np.array(results["tt_count_off"])
    base = np.array(results["uncompressed"])
    r_on = base / on
    r_off = base / off
    print("\nsummary (paired per-round ratios):")
    print(f"  tt_on   median {np.median(on)*1e3:7.3f} ms "
          f"({np.median(on)/nnz*1e6:.4f} us/nnz)")
    print(f"  tt_off  median {np.median(off)*1e3:7.3f} ms "
          f"({np.median(off)/nnz*1e6:.4f} us/nnz)")
    print(f"  base    median {np.median(base)*1e3:7.3f} ms")
    print(f"  ratio counting-on  median {np.median(r_on):.2f}x "
          f"[{r_on.min():.2f}, {r_on.max():.2f}]")
    print(f"  ratio counting-off median {np.median(r_off):.2f}x "
          f"[{r_off.min():.2f}, {r_off.max():.2f}]")


if __name__ == "__main__":
    main()
