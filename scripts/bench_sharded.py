#!/usr/bin/env python3
"""Multi-chip scaling benchmark: DLRM hybrid-parallel train step.

Runs the table-sharded + data-parallel DLRM train step over a mesh and
reports steps/s and embedding lookups/s. On a real TPU slice this measures
ICI all_to_all scaling (BASELINE.md scaling target); on CPU it runs over
virtual devices as a wiring check:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python scripts/bench_sharded.py --dp 2 --mp 4
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _slope(fn, reps=3):
    """Median-of-``reps`` per-step seconds via the two-window slope, with
    windows scaled to >=250 ms of device work (tunnel RPC jitter swamps
    smaller windows — docs/PERF.md "Measurement on a tunneled chip")."""
    fn(3)
    t0 = time.perf_counter()
    fn(8)
    est = max((time.perf_counter() - t0) / 8, 1e-5)
    k2 = min(max(20, int(0.25 / est)), 700)
    k1 = max(k2 // 5, 2)
    vals = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(k1)
        t1 = time.perf_counter()
        fn(k2)
        t2 = time.perf_counter()
        vals.append(((t2 - t1) - (t1 - t0)) / (k2 - k1))
    return sorted(vals)[len(vals) // 2]


def _bench_cached_lookup(args, mesh):
    """A/B the replicated vs row-owned sharded cache (forward lookups)."""
    import jax
    import jax.numpy as jnp

    from fbtt_embedding_tpu.ops import cache as cache_ops
    from fbtt_embedding_tpu.parallel.sharded import (
        make_dp_cached_lookup,
        make_row_owned_cached_lookup,
        shard_cache_weight_by_owner,
    )
    from fbtt_embedding_tpu.utils.init import init_tt_cores

    p, q, r = [100, 100, 100], [4, 4, 4], [1, 32, 32, 1]
    e, d = 1_000_000, 64
    c = 102_400
    b, L = args.batch_size, args.pooling_factor
    n = mesh.devices.size
    rng = np.random.default_rng(0)
    cores = tuple(
        jnp.asarray(cc)
        for cc in init_tt_cores(rng, "uniform", 1, e, d, p, q, r))
    cache = cache_ops.make_cache_state(e, c, d, num_embeddings=e)

    def draw(n):
        # numpy's zipf requires alpha > 1; alpha <= 1 means uniform here
        if args.alpha > 1.0:
            return (rng.zipf(args.alpha, size=n) % e).astype(np.int32)
        return rng.integers(0, e, size=n).astype(np.int32)

    warm = jnp.asarray(draw(b * L))
    cache = cache_ops.update_cache_state(cache, warm)
    cache = jax.jit(cache_ops.cache_populate,
                    static_argnums=(2, 3, 4))(cache, cores, tuple(p),
                                              tuple(q), tuple(r))
    indices = jnp.asarray(draw(b * L).reshape(1, b, L))
    hit = float(jnp.mean((cache_ops.cache_lookup(
        cache, indices.reshape(-1)) >= 0).astype(jnp.float32)))

    if args.cache_mode == "replicated":
        fn = make_dp_cached_lookup(mesh, p, q, r,
                                   batch_axes=tuple(mesh.axis_names))

        def run(k):
            out = None
            for i in range(k):
                out = fn(cores, cache, indices)
            return float(out[0, 0, 0])
    else:
        fn = make_row_owned_cached_lookup(
            mesh, p, q, r, cache_size=c,
            batch_axis=mesh.axis_names[0])
        w_owned = shard_cache_weight_by_owner(
            mesh, cache.weight, batch_axis=mesh.axis_names[0])

        def run(k):
            out = None
            for i in range(k):
                out = fn(cores, cache.slots, w_owned, indices)
            return float(out[0, 0, 0])

    per = _slope(run)
    print(f"cache-mode={args.cache_mode} mesh={n}dev alpha={args.alpha} "
          f"hit_rate={hit:.3f}: {per*1e3:.3f} ms/lookup-batch "
          f"({b*L/per/1e6:.1f}M lookups/s)")

    # TRAIN through the same cache layout (full owned lifecycle: owned
    # populate -> owned serving + owned row updates; replicated twin for
    # the A/B).
    from fbtt_embedding_tpu.models.tt_embedding import (
        OptimType,
        TTEmbeddingParams,
    )

    d_out = jnp.asarray(rng.normal(size=(1, b, d)).astype(np.float32) * .1)
    lr_eps = (jnp.float32(0.01), jnp.float32(1e-10))
    opt0 = tuple(jnp.zeros((0,), jnp.float32) for _ in cores)
    if args.cache_mode == "replicated":
        from fbtt_embedding_tpu.parallel.sharded import (
            make_sharded_fused_train_step,
        )

        tstep = make_sharded_fused_train_step(
            mesh, p, q, r, 1, b, L, optimizer=OptimType.SGD,
            use_cache=True, probe_cache=True,
            batch_axis=mesh.axis_names[0])
        state = {"prm": TTEmbeddingParams(cores, opt0, cache)}

        def run_train(k):
            out = None
            for i in range(k):
                out, state["prm"] = tstep(state["prm"], indices, d_out,
                                          lr_eps)
            return float(out[0, 0, 0])
    else:
        from fbtt_embedding_tpu.parallel.sharded import (
            make_row_owned_fused_train_step,
            make_row_owned_populate,
        )

        pop = make_row_owned_populate(
            mesh, p, q, r, c, batch_axis=mesh.axis_names[0])
        cache_cnt, w_own, opt_own = pop(cache, cores)
        tstep = make_row_owned_fused_train_step(
            mesh, p, q, r, c, b, L, optimizer=OptimType.SGD,
            batch_axis=mesh.axis_names[0])
        state = {"prm": TTEmbeddingParams(cores, opt0, cache_cnt),
                 "w": w_own, "o": opt_own}

        def run_train(k):
            out = None
            for i in range(k):
                out, state["prm"], state["w"], state["o"] = tstep(
                    state["prm"], state["w"], state["o"], indices, d_out,
                    lr_eps)
            return float(out[0, 0, 0])

    per_t = _slope(run_train)
    print(f"cache-mode={args.cache_mode} TRAIN mesh={n}dev "
          f"alpha={args.alpha}: {per_t*1e3:.3f} ms/step "
          f"({b*L/per_t/1e6:.1f}M lookups/s)")


def _bench_dp_serving(args, mesh):
    """Throughput of the batch-sharded folded serving path (zero-comms
    replicated fold + cache; aggregate lookups/s should scale ~linearly
    with the mesh)."""
    import jax
    import jax.numpy as jnp

    from fbtt_embedding_tpu.models.tt_embedding import TTEmbeddingParams
    from fbtt_embedding_tpu.ops import cache as cache_ops
    from fbtt_embedding_tpu.parallel.sharded import make_dp_serving_fn
    from fbtt_embedding_tpu.utils.init import init_tt_cores

    p, q, r = [200, 220, 250], [4, 4, 4], [1, 32, 32, 1]
    e, d = 11_000_000, 64
    c = 102_400
    b, L = args.batch_size, args.pooling_factor
    n = mesh.devices.size
    on_cpu = jax.devices()[0].platform == "cpu"
    if on_cpu:  # wiring check: shrink the table so CPU finishes fast
        p, e, c = [40, 40, 40], 64_000, 1_024
    rng = np.random.default_rng(0)
    cores = tuple(
        jnp.asarray(cc)
        for cc in init_tt_cores(rng, "uniform", 1, e, d, p, q, r))
    cache = cache_ops.make_cache_state(e, c, d, num_embeddings=e)

    def draw(n):
        # numpy's zipf requires alpha > 1; alpha <= 1 means uniform here
        if args.alpha > 1.0:
            return (rng.zipf(args.alpha, size=n) % e).astype(np.int32)
        return rng.integers(0, e, size=n).astype(np.int32)

    warm = jnp.asarray(draw(max(b * L, 4 * c)))
    cache = cache_ops.update_cache_state(cache, warm)
    cache = jax.jit(cache_ops.cache_populate,
                    static_argnums=(2, 3, 4))(cache, cores, tuple(p),
                                              tuple(q), tuple(r))
    params = TTEmbeddingParams(
        cores, tuple(jnp.zeros((0,), jnp.float32) for _ in cores), cache)
    indices = jnp.asarray(draw(b * L).reshape(1, b, L))
    hit = float(jnp.mean((cache_ops.cache_lookup(
        cache, indices.reshape(-1)) >= 0).astype(jnp.float32)))

    fold, serve = make_dp_serving_fn(
        mesh, p, q, r, 1, b, L, probe_cache=True,
        batch_axis=mesh.axis_names[0], interpret=on_cpu,
        quantize="int8" if args.quantized else None)
    fp = fold(params)

    def run(k):
        out = None
        for _ in range(k):
            out = serve(fp, indices)
        return float(out[0, 0, 0])

    per = _slope(run)
    print(f"dp-serving mesh={n}dev alpha={args.alpha} hit_rate={hit:.3f} "
          f"E={e}: {per*1e3:.3f} ms/batch "
          f"({b*L/per/1e6:.1f}M lookups/s aggregate)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dp", type=int, default=1)
    ap.add_argument("--mp", type=int, default=1)
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--num-tables", type=int, default=8)
    ap.add_argument("--pooling-factor", type=int, default=10)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--uncompressed", action="store_true",
                    help="replace the TT tables with dense [E, D] tables "
                         "(gather + sparse scatter-add SGD) for a same-"
                         "model comparison; single-device only")
    ap.add_argument("--cache-mode", default=None,
                    choices=["replicated", "owned"],
                    help="benchmark the CACHED data-parallel lookup "
                         "instead of the DLRM step: 'replicated' serves "
                         "hits locally (zero comms, capacity = 1 chip), "
                         "'owned' shards cache rows slot%%dp with a two-"
                         "hop all_to_all (capacity = dp chips). Zipf "
                         "traffic via --alpha.")
    ap.add_argument("--serving", action="store_true",
                    help="benchmark the batch-sharded FOLDED SERVING path "
                         "(make_dp_serving_fn: replicated fold + cache, "
                         "requests sharded over the mesh) instead of the "
                         "DLRM step. Zipf traffic via --alpha.")
    ap.add_argument("--quantized", action="store_true",
                    help="with --serving: int8-quantized fold (per-row "
                         "scaled pair table + cache rows; the replicated "
                         "copies shrink 2-4x per chip)")
    ap.add_argument("--alpha", type=float, default=1.05)
    ap.add_argument("--multihost", action="store_true",
                    help="initialize jax.distributed (env: FBTT_COORDINATOR"
                         "/FBTT_NUM_PROCESSES/FBTT_PROCESS_ID or TPU-pod "
                         "auto-config) and build a process-aware mesh: mp "
                         "within each host (ICI), dp across hosts (DCN). "
                         "Run the same command on every host.")
    args = ap.parse_args()

    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")  # axon needs the config call

    if args.multihost:
        from fbtt_embedding_tpu.parallel.multihost import (
            initialize_distributed,
        )

        initialize_distributed()
        print(f"process {jax.process_index()}/{jax.process_count()}: "
              f"{jax.local_device_count()} local / "
              f"{jax.device_count()} global devices")
    import jax.numpy as jnp

    from fbtt_embedding_tpu.models.dlrm import (
        DLRMConfig, init_dlrm_params, make_dlrm_train_step, shard_dlrm_params)
    from fbtt_embedding_tpu.parallel.mesh import make_mesh

    n = args.dp * args.mp
    if args.multihost and jax.process_count() > 1:
        from fbtt_embedding_tpu.parallel.multihost import make_hybrid_mesh

        assert n == jax.device_count(), (
            f"--dp*--mp = {n} must equal the global device count "
            f"{jax.device_count()} in --multihost mode")
        mesh = make_hybrid_mesh(dp=args.dp, mp=args.mp)
    else:
        devices = jax.devices()[:n]
        assert len(devices) == n, (
            f"need {n} devices, have {len(jax.devices())}")
        mesh = make_mesh(shape=(args.dp, args.mp), axis_names=("dp", "mp"),
                         devices=devices)
    assert args.num_tables % args.mp == 0
    cfg = DLRMConfig(
        num_tables=args.num_tables,
        num_embeddings=1_000_000,
        embedding_dim=64,
        tt_p_shapes=[100, 100, 100],
        tt_q_shapes=[4, 4, 4],
        tt_ranks=[32, 32],
        dense_dim=13,
        bottom_mlp_dims=[512, 256, 64],
        top_mlp_dims=[512, 256, 1],
        pooling_factor=args.pooling_factor,
    )
    if args.cache_mode:
        _bench_cached_lookup(args, mesh)
        return
    if args.serving:
        _bench_dp_serving(args, mesh)
        return

    multi = args.multihost and jax.process_count() > 1
    if multi:
        # every process holds the full (seed-identical) host values;
        # make_array_from_callback hands each device its global slice —
        # no host ever needs another host's shard
        from jax.sharding import NamedSharding, PartitionSpec as P

        def gput(x, spec):
            x = np.asarray(x)
            sh = NamedSharding(mesh, spec)
            return jax.make_array_from_callback(
                x.shape, sh, lambda idx: x[idx])

        raw = init_dlrm_params(cfg, seed=0)
        params = jax.tree.map(lambda x: gput(x, P()), raw)
        params = params.replace(tt_cores=tuple(
            gput(c, P("mp", None, None)) for c in raw.tt_cores))
    else:
        params = shard_dlrm_params(init_dlrm_params(cfg, seed=0), cfg, mesh)
    step = make_dlrm_train_step(cfg, mesh=mesh, learning_rate=0.01)

    if args.uncompressed:
        assert n == 1, "--uncompressed compares on a single device"
        from fbtt_embedding_tpu.models.dlrm import (
            DLRMParams, _interact, _mlp_apply, bce_loss)

        rng0 = np.random.default_rng(1)
        # one flat [T*E, D] table: a single gather / scatter (a vmap'd
        # per-table scatter measured pathologically slow)
        tables = jnp.asarray(rng0.normal(
            0, 1.0 / np.sqrt(cfg.num_embeddings),
            size=(cfg.num_tables * cfg.num_embeddings, cfg.embedding_dim),
        ).astype(np.float32))

        def loss_from_rows(rows, mlps, dense, labels, t, b, l):
            emb = rows.reshape(t, b, l, -1).sum(axis=2)  # [T, B, D]
            bottom_out = _mlp_apply(mlps.bottom_mlp, dense)
            z = _interact(bottom_out, emb)
            logits = _mlp_apply(mlps.top_mlp, z)[:, 0]
            return bce_loss(logits, labels)

        t_off = (jnp.arange(cfg.num_tables, dtype=jnp.int32)[:, None, None]
                 * cfg.num_embeddings)

        def dense_step(tables, mlps, dense, indices, labels):
            t, b, l = indices.shape
            flat_ix = (indices + t_off).reshape(-1)
            rows = tables[flat_ix]
            loss, (g_rows, g_mlps) = jax.value_and_grad(
                loss_from_rows, argnums=(0, 1))(
                    rows, mlps, dense, labels, t, b, l)
            tables = tables.at[flat_ix].add(-0.01 * g_rows)
            mlps = jax.tree.map(lambda p, g: p - 0.01 * g, mlps, g_mlps)
            return loss, tables, mlps

        # per-call jit with a donated table is the dense baseline's best
        # harness (measured 18.2 ms/step vs 32.8 inside a fori_loop,
        # whose 2 GB carry pays XLA's [*, 64] layout copies per
        # iteration; a vmap'd per-table scatter measured 262 ms)
        dense_jit = functools.partial(jax.jit, donate_argnums=(0,))(
            dense_step)
        _dstate = {"t": tables}

        def run_dense(k, prm):
            t0 = time.perf_counter()
            loss = None
            for _ in range(k):
                loss, _dstate["t"], prm = dense_jit(
                    _dstate["t"], prm, dense, indices, labels)
            _ = float(loss)
            return time.perf_counter() - t0, prm

    rng = np.random.default_rng(0)
    b = args.batch_size
    assert b % (args.dp * args.mp) == 0
    dense = rng.normal(size=(b, cfg.dense_dim)).astype(np.float32)
    indices = rng.integers(
        0, cfg.num_embeddings,
        size=(cfg.num_tables, b, cfg.pooling_factor)).astype(np.int32)
    labels = rng.integers(0, 2, size=(b,)).astype(np.float32)
    if multi:
        dense = gput(dense, P(("dp", "mp"), None))
        indices = gput(indices, P("mp", "dp", None))
        labels = gput(labels, P(("dp", "mp")))
    else:
        dense, indices, labels = (
            jnp.asarray(dense), jnp.asarray(indices), jnp.asarray(labels))

    # warm + time (slope method)
    def run(k, params):
        if args.uncompressed:
            return run_dense(k, params)
        t0 = time.perf_counter()
        loss = None
        for _ in range(k):
            loss, params = step(params, dense, indices, labels)
        _ = float(loss)
        return time.perf_counter() - t0, params

    _, params = run(3, params)
    k1 = max(args.iters // 10, 2)
    t1, params = run(k1, params)
    t2, params = run(args.iters, params)
    per_step = (t2 - t1) / (args.iters - k1)
    nnz = cfg.num_tables * b * cfg.pooling_factor
    print(
        f"mesh dp={args.dp} mp={args.mp} ({n} devices, "
        f"{jax.devices()[0].device_kind}): {per_step*1e3:.3f} ms/step, "
        f"{1.0/per_step:.1f} steps/s, {nnz/per_step/1e6:.2f}M lookups/s"
    )


if __name__ == "__main__":
    main()
