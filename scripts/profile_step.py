#!/usr/bin/env python3
"""Component-level timing of the train step, robust under tunneled runtimes.

Method: run the component k times inside one jitted fori_loop whose carry
creates a data dependency between iterations (so XLA cannot hoist or dedupe
the work), force a scalar readback, and report the slope between two k
values — cancels dispatch/compile/tunnel overhead.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def slope_time(make_loop, k1=10, k2=60):
    """make_loop(k) -> array; forced to float to ensure full execution."""
    float(make_loop(3))  # compile + warm
    t0 = time.perf_counter()
    float(make_loop(k1))
    t1 = time.perf_counter()
    float(make_loop(k2))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (k2 - k1)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-size", type=int, default=512)
    parser.add_argument("--pooling-factor", type=int, default=20)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from fbtt_embedding_tpu import OptimType, TTEmbeddingParams
    from fbtt_embedding_tpu.models.tt_embedding import make_fused_train_step
    from fbtt_embedding_tpu.ops import cache as cache_ops
    from fbtt_embedding_tpu.ops.cache import make_cache_state
    from fbtt_embedding_tpu.ops.contraction import tt_rows
    from fbtt_embedding_tpu.ops.lookup import pool_rows, tt_grads_from_row_cotangents
    from fbtt_embedding_tpu.ops.fused_optim import sgd_step
    from fbtt_embedding_tpu.utils.init import init_tt_cores

    p, q, ranks = [200, 220, 250], [4, 4, 4], [32, 32]
    rfull = [1] + ranks + [1]
    b, L = args.batch_size, args.pooling_factor
    E, D = int(np.prod(p)), int(np.prod(q))
    nnz = b * L
    shapes = (tuple(p), tuple(q), tuple(rfull))

    rng = np.random.default_rng(0)
    cores = tuple(
        jnp.asarray(c)
        for c in init_tt_cores(rng, "uniform", 1, E, D, p, q, rfull)
    )
    indices = jnp.asarray(rng.integers(0, E, size=(nnz,)).astype(np.int32))
    rowidx = jnp.asarray(np.repeat(np.arange(b), L).astype(np.int32))
    offsets = jnp.asarray(np.arange(0, nnz + 1, L, dtype=np.int32))
    d_out = jnp.asarray((rng.random((1, b, D)) * 1e-3).astype(np.float32))
    cache = make_cache_state(E, int(0.1 * E), D, "none")

    print(f"device={jax.devices()[0].device_kind} nnz={nnz} E={E} D={D}")

    def report(name, fn):
        t = slope_time(fn)
        print(f"{name:36s} {t*1e3:8.3f} ms")

    # --- forward only (perturb indices each iter from carry so it can't fold)
    @jax.jit
    def loop_fwd(k):
        def body(_, c):
            idx = (indices + c.astype(jnp.int32)) % E
            rows = tt_rows(cores, *shapes, idx, None)
            out = pool_rows(rows, rowidx, None, 1, b)
            return jnp.sum(out[0, 0, :4]).astype(jnp.int32) & 1
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    report("forward (contract+pool)", loop_fwd)

    # --- LFU counting only
    @jax.jit
    def loop_lfu(k):
        def body(_, carry):
            ch, pert = carry
            idx = (indices + pert) % E
            ch = cache_ops.update_cache_state(ch, idx)
            return ch, (ch.freq[0] & 1)
        ch, _ = jax.lax.fori_loop(0, k, body, (cache, jnp.int32(0)))
        return ch.freq[0]

    report("LFU update_cache_state", loop_lfu)

    # --- LFU: sort+dedup only
    @jax.jit
    def loop_sortdedup(k):
        def body(_, pert):
            idx = jnp.sort((indices + pert) % E)
            is_first = jnp.concatenate([jnp.ones((1,), bool), idx[1:] != idx[:-1]])
            run_id = jnp.cumsum(is_first.astype(jnp.int32)) - 1
            cnts = jax.ops.segment_sum(jnp.ones((nnz,), jnp.int32), run_id,
                                       num_segments=nnz)
            return cnts[0] & 1
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    report("LFU sort+dedup only", loop_sortdedup)

    # --- LFU: cache_lookup (3-probe gather)
    @jax.jit
    def loop_probe(k):
        def body(_, pert):
            idx = (indices + pert) % E
            loc = cache_ops.cache_lookup(cache, idx)
            return loc[0] & 1
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    report("LFU cache_lookup (probe gathers)", loop_probe)

    # --- scatter into big table
    @jax.jit
    def loop_scatter(k):
        def body(_, carry):
            tbl, pert = carry
            idx = (indices + pert) % E
            tbl = tbl.at[idx].add(1, mode="drop")
            return tbl, tbl[0] & 1
        tbl, _ = jax.lax.fori_loop(0, k, body, (cache.freq, jnp.int32(0)))
        return tbl[0]

    report("single scatter-add into E-table", loop_scatter)

    # --- backward grads
    @jax.jit
    def loop_bwd(k):
        def body(_, pert):
            idx = (indices + pert) % E
            d_rows = d_out[0][rowidx]
            g = tt_grads_from_row_cotangents(cores, *shapes, idx, None, d_rows)
            return jnp.sum(g[0][0, 0, :4]).astype(jnp.int32) & 1
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    report("backward (core grads)", loop_bwd)

    # --- full fused step, no cache
    step_nc = make_fused_train_step(p, q, rfull, 1, b, OptimType.SGD,
                                    use_cache=False)
    params_nc = TTEmbeddingParams(
        cores, tuple(jnp.zeros((0,), jnp.float32) for _ in cores), None)
    lr_eps = (jnp.float32(0.01), jnp.float32(1e-10))

    @jax.jit
    def loop_full_nc(k):
        def body(_, pr):
            _, p2 = step_nc(pr, indices, offsets, d_out, lr_eps)
            return p2
        pr = jax.lax.fori_loop(0, k, body, params_nc)
        return pr.tt_cores[0][0, 0, 0]

    report("full fused step (no cache)", loop_full_nc)

    # --- full fused step, LFU counting
    step_c = make_fused_train_step(p, q, rfull, 1, b, OptimType.SGD,
                                   use_cache=True)
    params_c = TTEmbeddingParams(
        cores, tuple(jnp.zeros((0,), jnp.float32) for _ in cores), cache)

    @jax.jit
    def loop_full_c(k):
        def body(_, pr):
            _, p2 = step_c(pr, indices, offsets, d_out, lr_eps)
            return p2
        pr = jax.lax.fori_loop(0, k, body, params_c)
        return pr.tt_cores[0][0, 0, 0]

    report("full fused step (LFU counting)", loop_full_c)


if __name__ == "__main__":
    main()
