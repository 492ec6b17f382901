#!/usr/bin/env python3
"""Serving latency (p50/p90/p99) through the bucketed front-end.

The round-4 verdict: the "production serving" story had throughput
numbers but no latency distribution through the path production would
actually run — `make_bucketed_serving_fn` (host-side pad + bucket
dispatch + folded flat serve). This measures it: a stream of mixed-size
requests, each timed END-TO-END on the host (pad loop + device dispatch
+ readback via block_until_ready — per-request sync is the right
measurement for latency, unlike the slope method used for throughput).

On the tunneled chip every request pays an RPC round trip that is
~100-1000x the device time (measured: 37-514 ms wall for a ~0.3-0.6 ms
device program), so per-request wall timing measures the TUNNEL, not
the serving stack. This harness therefore measures the two components a
locally-attached server would actually pay — the per-bucket DEVICE time
(slope method over repeated dispatches, which cancels transport) and
the per-request HOST pad/bucket cost — and reports the derived
attached-chip latency distribution est(request) = pad(request) +
device(bucket(request)), plus the raw tunneled wall numbers for
reference.

Usage:
  python scripts/serving_latency.py [--quantized] [--requests 400]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def pct(a, p):
    return float(np.percentile(np.asarray(a) * 1e3, p))  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quantized", action="store_true")
    ap.add_argument("--requests", type=int, default=400)
    ap.add_argument("--zipf", type=float, default=1.2)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fbtt_embedding_tpu import OptimType, TTEmbeddingBag
    from fbtt_embedding_tpu.models.tt_embedding import (
        make_bucketed_serving_fn,
    )

    p, q, ranks = [200, 220, 250], [4, 4, 4], [32, 32]
    E, D = int(np.prod(p)), int(np.prod(q))
    rng = np.random.default_rng(args.seed)
    print(f"device={jax.devices()[0].device_kind} E={E} D={D} "
          f"quantized={args.quantized}", flush=True)

    emb = TTEmbeddingBag(
        num_embeddings=E, embedding_dim=D, tt_p_shapes=p, tt_q_shapes=q,
        tt_ranks=ranks, optimizer=OptimType.SGD, learning_rate=0.002,
        use_cache=True, cache_size=int(0.1 * E), hashtbl_size=E,
        weight_dist="approx-normal")
    # warm the LFU with Zipf traffic and populate, so serving exercises
    # the cache path production would
    warm = (rng.zipf(args.zipf, size=200_000) % E).astype(np.int64)
    emb.update_cache(jnp.asarray(warm.astype(np.int32)))
    emb.cache_populate()

    batch_buckets = [64, 256, 512]
    nnz_buckets = [1024, 4096, 10240]
    fold, serve = make_bucketed_serving_fn(
        p, q, ranks, 1, batch_buckets, nnz_buckets,
        quantize="int8" if args.quantized else None)
    folded = fold(emb.params)

    # request mix: batch log-uniform in [8, 512], bag length in [4, 20]
    reqs = []
    for _ in range(args.requests):
        b = int(np.exp(rng.uniform(np.log(8), np.log(512))))
        L = int(rng.integers(4, 21))
        idx = (rng.zipf(args.zipf, size=b * L) % E).astype(np.int64)
        offs = np.arange(0, b * L + 1, L, dtype=np.int64)
        reqs.append((b, L, idx, offs))

    # --- per-bucket DEVICE time (slope method; cancels the tunnel) ----
    def slope(fn, k1=8, k2=40, reps=3):
        fn(3)
        vals = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(k1)
            t1 = time.perf_counter()
            fn(k2)
            t2 = time.perf_counter()
            vals.append(((t2 - t1) - (t1 - t0)) / (k2 - k1))
        return sorted(vals)[len(vals) // 2]

    dev = {}
    for bb in batch_buckets:
        for nb in nnz_buckets:
            L = max(1, nb // bb)
            idx = (rng.zipf(args.zipf, size=bb * L) % E).astype(np.int64)
            offs = np.arange(0, bb * L + 1, L, dtype=np.int64)

            def run(k, idx=idx, offs=offs):
                out = None
                for _ in range(k):
                    out = serve(folded, idx, offs)
                out.block_until_ready()

            dev[(bb, nb)] = slope(run)

    # --- per-request HOST cost (pad + bucket + re-layout, real path) --
    pad_t, est = [], []
    by_bucket = {}
    for b, L, idx, offs in reqs:
        nnz = idx.shape[0]
        bkey = (min(bb for bb in batch_buckets if b <= bb),
                min(nb for nb in nnz_buckets if nnz <= nb))
        t0 = time.perf_counter()
        bs, nz = bkey
        idx_p = np.zeros((nz,), idx.dtype)
        idx_p[:nnz] = idx
        w_p = np.zeros((nz,), np.float32)
        w_p[:nnz] = 1.0
        off_p = np.empty((bs + 1,), offs.dtype)
        off_p[0] = 0
        off_p[1:b + 1] = offs[1:]
        off_p[b + 1:] = offs[-1]
        off_p[bs] = nz
        pad = time.perf_counter() - t0
        pad_t.append(pad)
        e = pad + dev[bkey]
        est.append(e)
        by_bucket.setdefault(bkey, []).append(e)

    # --- raw tunneled wall time on a sample (reference only) ----------
    wall = []
    for b, L, idx, offs in reqs[:40]:
        t0 = time.perf_counter()
        serve(folded, idx, offs).block_until_ready()
        wall.append(time.perf_counter() - t0)

    print(f"\n{args.requests} mixed requests, zipf={args.zipf}, "
          f"cache {int(0.1*E)} rows:")
    print("  attached-chip latency estimate (host pad + device bucket "
          "time):")
    print(f"    p50={pct(est,50):7.3f}  p90={pct(est,90):7.3f}  "
          f"p99={pct(est,99):7.3f}  max={max(est)*1e3:7.3f} ms")
    print(f"  host pad component  p50={pct(pad_t,50):7.3f}  "
          f"p99={pct(pad_t,99):7.3f} ms "
          f"({100*np.median(pad_t)/np.median(est):.1f}% of median)")
    for bkey in sorted(by_bucket):
        v = by_bucket[bkey]
        print(f"    bucket B<={bkey[0]:<4} nnz<={bkey[1]:<6} "
              f"n={len(v):<4} dev={dev[bkey]*1e3:7.3f}  "
              f"p50={pct(v,50):7.3f}  p99={pct(v,99):7.3f} ms")
    print(f"  raw tunneled wall (transport-dominated, n=40): "
          f"p50={pct(wall,50):8.3f}  p99={pct(wall,99):8.3f} ms")


if __name__ == "__main__":
    main()
