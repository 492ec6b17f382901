#!/usr/bin/env python3
"""Headline benchmark: TT-EmbeddingBag fused fwd+bwd at the reference config.

Reproduces the reference's published measurement
(``/root/reference/README.md:17-22`` via ``tt_embeddings_benchmark.py``
defaults): B=512, pooling L=20 (nnz=10240), p=[200,220,250] (E=11M),
q=[4,4,4] (D=64), ranks=[32,32], fused sparse SGD, use_cache=True (which in
the reference — and here — means LFU frequency counting runs every step;
the cache is never populated during the benchmark).

Reference baseline: 0.416 us/nnz fwd+bwd on a V100-class GPU
(``README.md:21``). We report the same metric on the current JAX default
device and ``vs_baseline`` = baseline_time / our_time (>1 = faster).

Prints ONE JSON line. Use --full for extra detail on stderr.
"""

import argparse
import functools
import json
import sys
import time

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-size", type=int, default=512)
    parser.add_argument("--pooling-factor", type=int, default=20)
    parser.add_argument("--iters", type=int, default=100)
    parser.add_argument("--warmup", type=int, default=10)
    parser.add_argument("--p-shapes", default="200,220,250")
    parser.add_argument("--q-shapes", default="4,4,4")
    parser.add_argument("--ranks", default="32,32")
    parser.add_argument("--optimizer", default="sgd", choices=["sgd", "adagrad"])
    parser.add_argument("--no-cache", action="store_true",
                        help="disable LFU counting (pure TT path)")
    parser.add_argument("--alpha", type=float, default=1.0,
                        help=">1 uses a Zipf index distribution")
    parser.add_argument("--serving", action="store_true",
                        help="inference-only lookups (no backward, no LFU "
                             "counting); with --cached, hits come from the "
                             "populated cache and the TT kernels skip them")
    parser.add_argument("--folded", action="store_true",
                        help="with --serving: weight-folded inference "
                             "(pass tables + pair-product table "
                             "precomputed once at freeze time)")
    parser.add_argument("--quantized", action="store_true",
                        help="with --serving --folded: int8 per-row "
                             "quantized pair table + cache rows "
                             "(2-4x serving capacity per chip)")
    parser.add_argument("--cached", action="store_true",
                        help="Zipf traffic + populated cache serving hits "
                             "(cache_populate after warmup, probe_cache on); "
                             "reports hit rate and the end-to-end step time "
                             "with the live-count block skipping engaged")
    parser.add_argument("--full", action="store_true")
    args = parser.parse_args()
    if args.folded and not args.serving:
        parser.error("--folded only applies to --serving runs")
    if args.quantized and not args.folded:
        parser.error("--quantized only applies to --serving --folded runs")
    if args.cached and args.alpha <= 1.0:
        args.alpha = 1.05  # hits need skew; uniform 11M rows never repeat

    import jax
    import jax.numpy as jnp

    from fbtt_embedding_tpu import OptimType, TTEmbeddingParams
    from fbtt_embedding_tpu.models.tt_embedding import make_fused_train_step
    from fbtt_embedding_tpu.ops.cache import make_cache_state
    from fbtt_embedding_tpu.utils.init import init_tt_cores

    p = [int(v) for v in args.p_shapes.split(",")]
    q = [int(v) for v in args.q_shapes.split(",")]
    ranks = [int(v) for v in args.ranks.split(",")]
    rfull = [1] + ranks + [1]
    b = args.batch_size
    pooling = args.pooling_factor
    num_embeddings = int(np.prod(p))
    embedding_dim = int(np.prod(q))
    nnz = b * pooling
    optim = OptimType.SGD if args.optimizer == "sgd" else OptimType.EXACT_ADAGRAD
    use_cache = not args.no_cache

    rng = np.random.default_rng(0)
    cores = tuple(
        jnp.asarray(c)
        for c in init_tt_cores(
            rng, "uniform", 1, num_embeddings, embedding_dim, p, q, rfull
        )
    )
    if optim == OptimType.SGD:
        opt_state = tuple(jnp.zeros((0,), jnp.float32) for _ in cores)
    else:
        opt_state = tuple(jnp.zeros_like(c) for c in cores)
    cache = (
        make_cache_state(num_embeddings, int(0.1 * num_embeddings),
                         embedding_dim,
                         "full" if (args.cached and optim != OptimType.SGD)
                         else "none",
                         num_embeddings=num_embeddings)
        if use_cache else None
    )
    params = TTEmbeddingParams(cores, opt_state, cache)

    step = make_fused_train_step(
        p, q, rfull, num_tables=1, batch_size=b, optimizer=optim,
        use_cache=use_cache, probe_cache=args.cached,
    )

    if args.alpha > 1.0:
        idx_np = (rng.zipf(args.alpha, size=nnz) % num_embeddings)
    else:
        idx_np = rng.integers(0, num_embeddings, size=nnz)
    indices = jnp.asarray(idx_np.astype(np.int32))
    offsets = jnp.asarray(
        np.arange(0, nnz + 1, pooling, dtype=np.int32)
    )
    d_output = jnp.asarray(
        (rng.random((1, b, embedding_dim)) * 0.1).astype(np.float32)
    )
    lr_eps = (jnp.float32(0.01), jnp.float32(1e-10))

    # Honest device timing: run k steps inside ONE dispatch (dynamic-length
    # fori_loop) and force a scalar readback; the slope between two k values
    # cancels dispatch/readback/tunnel overhead. (Per-dispatch wall-clock
    # timing is unreliable here: dispatch is async and block_until_ready
    # can return before execution under tunneled runtimes.)
    if args.serving:
        from fbtt_embedding_tpu.models.tt_embedding import (
            make_folded_serving_fn,
            make_serving_fn,
        )

        if args.folded:
            fold, fserve = make_folded_serving_fn(
                p, q, rfull, num_tables=1, batch_size=b,
                probe_cache=args.cached,
                quantize="int8" if args.quantized else None,
            )

            def serve(prm, idx, off):
                return fserve(prm, idx, off)
        else:
            serve = make_serving_fn(
                p, q, rfull, num_tables=1, batch_size=b,
                probe_cache=args.cached,
            )

        @jax.jit
        def run_k(params, k):
            def body(i, acc):
                # rotate the request batch so XLA cannot hoist the
                # (pure) lookup out of the loop
                idx_i = jnp.roll(indices, i)
                out = serve(params, idx_i, offsets)
                return acc + out[0, 0, 0]
            acc = jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
            return params, acc

        def timed(k, prm):
            t0 = time.perf_counter()
            prm, acc = run_k(prm, k)
            _ = float(acc)
            return time.perf_counter() - t0, prm
    else:
        @functools.partial(jax.jit, donate_argnums=(0,))
        def run_k(params, k):
            def body(_, p):
                _, p2 = step(p, indices, offsets, d_output, lr_eps)
                return p2
            return jax.lax.fori_loop(0, k, body, params)

        def timed(k, p):
            t0 = time.perf_counter()
            p = run_k(p, k)
            _ = float(jnp.sum(p.tt_cores[0][0, 0, :8]))
            return time.perf_counter() - t0, p

    hit_rate = None
    if args.cached:
        # count traffic, then populate so the timed loop serves hits with
        # the sentinel-span skipping engaged
        from fbtt_embedding_tpu.ops import cache as cache_ops

        counted = jax.jit(cache_ops.update_cache_state)(
            params.cache, indices)
        params = TTEmbeddingParams(
            params.tt_cores, params.optimizer_state,
            jax.jit(cache_ops.cache_populate, static_argnums=(2, 3, 4))(
                counted, params.tt_cores, tuple(p), tuple(q),
                tuple(rfull)),
        )
        locs = cache_ops.cache_lookup(params.cache, indices)
        hit_rate = float(jnp.mean((locs >= 0).astype(jnp.float32)))

    if args.serving and args.folded:
        # one-time weight fold (the point: zero per-request rebuild)
        params = jax.block_until_ready(fold(params))
        if params.setup is None:
            # fallback-mode fold: the numbers below would measure the
            # PLAIN serving path, not folded serving — say so loudly.
            print(
                "WARNING: flat pipeline unavailable on this backend; "
                "--folded fell back to the regular serving path "
                "(reported numbers are NOT folded-serving numbers)",
                file=sys.stderr,
            )

    t_est, params = timed(args.warmup, params)  # compile + warm
    # Median of three slopes, windows scaled so the k2 dispatch covers
    # >= ~250 ms of device work: at sub-ms steps a small window is
    # swamped by tunnel RPC jitter, and single slopes still read up to
    # +/-40% (the same compiled program measured 0.43 and 0.78 ms/step
    # in one process) — the median isolates the mode.
    t_est, params = timed(8, params)
    est = max(t_est / 8, 1e-5)
    k2 = max(args.iters, min(int(0.25 / est), 700))
    k1 = max(k2 // 5, 2)
    slopes = []
    for _ in range(3):
        t1, params = timed(k1, params)
        t2, params = timed(k2, params)
        slopes.append((t2 - t1) / (k2 - k1))
    elapsed = sorted(slopes)[1]

    us_per_nnz = elapsed / nnz * 1e6
    # Reference FLOP model (tt_embeddings_benchmark.py:153-159): forward
    # chain MACs x 2, x3.0 for fwd + two backward GEMM passes.
    flop = (
        q[0] * ranks[0] * q[1] * ranks[1]
        + q[0] * q[1] * ranks[1] * q[2]
    ) * 2.0 * nnz if len(q) >= 3 else 0.0
    gflops = 3.0 * flop / elapsed / 1e9
    bw = 3.0 * 4.0 * nnz * embedding_dim / elapsed / 1e9
    baseline_us = 0.416  # README.md:21
    result = {
        "metric": "tt_embeddingbag_fwd_bwd_us_per_lookup",
        "value": round(us_per_nnz, 5),
        "unit": "us/nnz",
        "vs_baseline": round(baseline_us / us_per_nnz, 2),
    }
    if args.cached:
        result["metric"] = "tt_embeddingbag_cached_fwd_bwd_us_per_lookup"
        result["hit_rate"] = round(hit_rate, 4)
        result["alpha"] = args.alpha
    if args.full:
        extra = (f"  hit_rate={hit_rate:.3f}" if hit_rate is not None else "")
        print(
            f"device={jax.devices()[0].device_kind} B={b} E={num_embeddings} "
            f"D={embedding_dim} nnz={nnz} optim={args.optimizer} "
            f"cache_counting={use_cache} alpha={args.alpha}\n"
            f"time/iter={elapsed*1e3:.4f} ms  us/nnz={us_per_nnz:.5f}  "
            f"effective_GFLOPS={gflops:.0f}  effective_BW={bw:.1f} GB/s  "
            f"lookups/s={nnz/elapsed/1e6:.1f} M{extra}",
            file=sys.stderr,
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
