#!/usr/bin/env python3
"""Multi-process (multi-host analog) smoke worker.

Launched once per "host" (process); validates the full multi-host wiring
on CPU virtual devices: ``jax.distributed`` init, hybrid process-aware
mesh (mp within the process = ICI analog, dp across processes = DCN
analog), global-array construction from host-local data, the
table-sharded all_to_all lookup, the batch-sharded fused train step,
AND the mp-OWNED fused train step (cores/optimizer state owned per mp
slice) — then checks every result against a locally computed reference. The same
worker runs unchanged on real multi-host TPU (drop JAX_PLATFORMS/XLA_FLAGS
and let the TPU runtime provide the coordination env).

Two-process CPU launch (what tests/test_multihost.py does):

    XLA_FLAGS=--xla_force_host_platform_device_count=4 JAX_PLATFORMS=cpu \
      python scripts/multihost_smoke.py --coordinator 127.0.0.1:9876 \
        --num-processes 2 --process-id 0 &
    XLA_FLAGS=--xla_force_host_platform_device_count=4 JAX_PLATFORMS=cpu \
      python scripts/multihost_smoke.py --coordinator 127.0.0.1:9876 \
        --num-processes 2 --process-id 1
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--mp", type=int, default=2)
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from fbtt_embedding_tpu.models.tt_embedding import (
        OptimType,
        TTEmbeddingParams,
        make_fused_train_step,
    )
    from fbtt_embedding_tpu.parallel.multihost import (
        initialize_distributed,
        make_hybrid_mesh,
    )
    from fbtt_embedding_tpu.parallel.sharded import (
        _fixed_pool_lookup,
        make_sharded_fused_train_step,
        make_table_sharded_lookup,
    )
    from fbtt_embedding_tpu.utils.init import init_tt_cores

    ok = initialize_distributed(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert ok and jax.process_count() == args.num_processes
    local = jax.local_device_count()
    total = jax.device_count()
    mp = args.mp
    dp = total // mp
    mesh = make_hybrid_mesh(dp=dp, mp=mp)

    p, q, r = [8, 8, 8], [4, 2, 2], [1, 8, 8, 1]
    e, d = 512, 16
    t, b, L = mp, 2 * dp, 4
    rng = np.random.default_rng(0)  # same seed on every process
    cores_np = init_tt_cores(rng, "uniform", t, e, d, p, q, r)
    idx_np = rng.integers(0, e, size=(t, b, L)).astype(np.int32)

    def gput(x, spec):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, NamedSharding(mesh, spec), lambda i: x[i])

    # --- table-sharded lookup with all_to_all across the hybrid mesh
    cores = tuple(gput(c, P("mp", None, None)) for c in cores_np)
    indices = gput(idx_np, P("mp", "dp", None))
    lookup = make_table_sharded_lookup(mesh, p, q, r)
    out = jax.jit(lookup)(cores, indices)
    ref = _fixed_pool_lookup(
        tuple(jnp.asarray(c) for c in cores_np), jnp.asarray(idx_np),
        p, q, r)
    # every process sees the full (replicated-out) value via addressable
    # shards of its dp slice; compare the global checksum instead
    s_out = float(jnp.sum(out * out))
    s_ref = float(np.sum(np.asarray(ref) ** 2))
    assert abs(s_out - s_ref) < 1e-2 * max(1.0, abs(s_ref)), (s_out, s_ref)

    # --- batch-sharded fused train step across processes
    t1 = 1
    cores1_np = [c[:1] for c in cores_np]
    idx1_np = rng.integers(0, e, size=(t1, b, L)).astype(np.int32)
    dout_np = (rng.normal(size=(t1, b, d)) * 0.1).astype(np.float32)
    step = make_sharded_fused_train_step(
        mesh, p, q, r, t1, b, L, optimizer=OptimType.SGD)
    params = TTEmbeddingParams(
        tuple(gput(c, P()) for c in cores1_np),
        tuple(gput(np.zeros((0,), np.float32), P()) for _ in cores1_np),
        None,
    )
    lr_eps = (jnp.float32(0.05), jnp.float32(1e-10))
    out_s, new_params = step(
        params, gput(idx1_np, P(None, "dp", None)),
        gput(dout_np, P(None, "dp", None)), lr_eps)

    ref_step = make_fused_train_step(p, q, r, t1, b, OptimType.SGD)
    offs = np.arange(0, t1 * b * L + 1, L, dtype=np.int32)
    _, ref_params = ref_step(
        TTEmbeddingParams(
            tuple(jnp.asarray(c) for c in cores1_np),
            tuple(jnp.zeros((0,), jnp.float32) for _ in cores1_np), None),
        jnp.asarray(idx1_np.reshape(-1)), jnp.asarray(offs),
        jnp.asarray(dout_np), lr_eps)
    for a, b_ in zip(new_params.tt_cores, ref_params.tt_cores):
        # cores are replicated; each process checks its addressable copy
        a_local = np.asarray(a.addressable_shards[0].data)
        np.testing.assert_allclose(a_local, np.asarray(b_),
                                   rtol=1e-5, atol=1e-6)

    # --- mp-OWNED fused train step across the hybrid mesh (each mp
    # slice owns T/mp tables' cores + optimizer state; exchange over
    # the ICI-analog axis, grads psum over the DCN-analog dp axis)
    from fbtt_embedding_tpu.parallel.sharded import (
        make_table_sharded_fused_train_step,
    )

    dout_mp = (rng.normal(size=(t, b, d)) * 0.1).astype(np.float32)
    mp_step = make_table_sharded_fused_train_step(
        mesh, p, q, r, t, b, L, optimizer=OptimType.EXACT_ADAGRAD,
        table_axis="mp", batch_axis="dp")
    mp_params = TTEmbeddingParams(
        tuple(gput(c, P("mp", None, None)) for c in cores_np),
        tuple(gput(np.zeros_like(c), P("mp", None, None))
              for c in cores_np),
        None)
    out_mp, mp_new = mp_step(
        mp_params, gput(idx_np, P("mp", "dp", None)),
        gput(dout_mp, P(None, ("dp", "mp"), None)), lr_eps)

    ref_mp = make_fused_train_step(p, q, r, t, b, OptimType.EXACT_ADAGRAD)
    offs_t = np.arange(0, t * b * L + 1, L, dtype=np.int32)
    _, ref_mp_params = ref_mp(
        TTEmbeddingParams(
            tuple(jnp.asarray(c) for c in cores_np),
            tuple(jnp.zeros_like(jnp.asarray(c)) for c in cores_np),
            None),
        jnp.asarray(idx_np.reshape(-1)), jnp.asarray(offs_t),
        jnp.asarray(dout_mp), lr_eps)
    for a, b_ in zip(mp_new.tt_cores, ref_mp_params.tt_cores):
        # each process holds its mp slices; check every addressable shard
        for sh in a.addressable_shards:
            tbl_sl = sh.index[0]
            np.testing.assert_allclose(
                np.asarray(sh.data), np.asarray(b_)[tbl_sl],
                rtol=1e-5, atol=1e-6)

    print(f"MULTIHOST_OK process={jax.process_index()} "
          f"local={local} global={total} mesh=({dp}x{mp})", flush=True)


if __name__ == "__main__":
    main()
