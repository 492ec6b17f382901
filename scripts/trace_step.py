#!/usr/bin/env python3
"""Device-trace the fused train step and print per-op time aggregates.

Runs k steps inside one jitted fori_loop under jax.profiler.trace, then
parses the generated trace.json.gz and aggregates device-lane op
durations by name — the ground-truth breakdown behind docs/PERF.md.
"""

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--pooling-factor", type=int, default=20)
    ap.add_argument("--k", type=int, default=50)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--cache", action="store_true", default=True)
    ap.add_argument("--no-cache", dest="cache", action="store_false")
    ap.add_argument("--logdir", default="/tmp/fbtt_trace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fbtt_embedding_tpu import OptimType, TTEmbeddingParams
    from fbtt_embedding_tpu.models.tt_embedding import make_fused_train_step
    from fbtt_embedding_tpu.ops.cache import make_cache_state
    from fbtt_embedding_tpu.utils.init import init_tt_cores

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
    offsets = jnp.asarray(np.arange(0, nnz + 1, L, dtype=np.int32))
    d_out = jnp.asarray((rng.random((1, b, D)) * 1e-3).astype(np.float32))
    lr_eps = (jnp.float32(0.01), jnp.float32(1e-10))

    step = make_fused_train_step(p, q, rfull, 1, b, OptimType.SGD,
                                 use_cache=args.cache)
    cch = (make_cache_state(E, int(0.1 * E), D, "none", num_embeddings=E)
           if args.cache else None)
    prm = TTEmbeddingParams(
        cores, tuple(jnp.zeros((0,), jnp.float32) for _ in cores), cch)

    @jax.jit
    def run_k(prm, k):
        def body(_, pr):
            _, p2 = step(pr, indices, offsets, d_out, lr_eps)
            return p2
        return jax.lax.fori_loop(0, k, body, prm)

    # compile + warm
    prm2 = run_k(prm, 3)
    float(prm2.tt_cores[0][0, 0, 0])

    os.system(f"rm -rf {args.logdir}")
    jax.profiler.start_trace(args.logdir)
    prm3 = run_k(prm2, args.k)
    float(prm3.tt_cores[0][0, 0, 0])
    jax.profiler.stop_trace()

    paths = glob.glob(
        f"{args.logdir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace found under", args.logdir)
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        tr = json.load(f)

    # device lanes: pick pids whose process name mentions TPU / device
    pid_names = {}
    for ev in tr["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    dev_pids = {pid for pid, name in pid_names.items()
                if "TPU" in name or "/device" in name.lower()}

    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for ev in tr["traceEvents"]:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        name = ev.get("name", "?")
        dur = ev.get("dur", 0) / 1e3  # us -> ms over the whole capture
        agg[name] += dur
        cnt[name] += 1
        total += dur
    print(f"device lanes: {[pid_names[p_] for p_ in dev_pids]}")
    print(f"total device time: {total:.3f} ms over k={args.k} steps "
          f"({total/args.k*1e3:.1f} us/step)\n")
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:args.top]
    for name, ms in rows:
        print(f"{ms/args.k*1e3:9.1f} us/step  x{cnt[name]//args.k:<4d} "
              f"{name[:90]}")


if __name__ == "__main__":
    main()
