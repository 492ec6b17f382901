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
    args = ap.parse_args()

    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")  # axon needs the config call
    import jax.numpy as jnp

    from fbtt_embedding_tpu.models.dlrm import (
        DLRMConfig, init_dlrm_params, make_dlrm_train_step, shard_dlrm_params)
    from fbtt_embedding_tpu.parallel.mesh import make_mesh

    n = args.dp * args.mp
    devices = jax.devices()[:n]
    assert len(devices) == n, f"need {n} devices, have {len(jax.devices())}"
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
    dense = jnp.asarray(rng.normal(size=(b, cfg.dense_dim)).astype(np.float32))
    indices = jnp.asarray(rng.integers(
        0, cfg.num_embeddings,
        size=(cfg.num_tables, b, cfg.pooling_factor)).astype(np.int32))
    labels = jnp.asarray(rng.integers(0, 2, size=(b,)).astype(np.float32))

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
