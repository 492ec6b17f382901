#!/usr/bin/env python3
"""Cross-check timing methods: fori_loop slope vs dispatch-chain slope."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from fbtt_embedding_tpu import OptimType, TTEmbeddingParams
    from fbtt_embedding_tpu.models.tt_embedding import make_fused_train_step
    from fbtt_embedding_tpu.utils.init import init_tt_cores

    p, q, ranks = [200, 220, 250], [4, 4, 4], [32, 32]
    rfull = [1] + ranks + [1]
    b, L = 512, 20
    E, D = int(np.prod(p)), int(np.prod(q))
    nnz = b * L

    rng = np.random.default_rng(0)
    cores = tuple(
        jnp.asarray(c) for c in init_tt_cores(rng, "uniform", 1, E, D, p, q, rfull)
    )
    params = TTEmbeddingParams(
        cores, tuple(jnp.zeros((0,), jnp.float32) for _ in cores), None
    )
    step = make_fused_train_step(p, q, rfull, 1, b, OptimType.SGD, use_cache=False)
    indices = jnp.asarray(rng.integers(0, E, size=nnz).astype(np.int32))
    offsets = jnp.asarray(np.arange(0, nnz + 1, L, dtype=np.int32))
    d_output = jnp.asarray((rng.random((1, b, D)) * 0.1).astype(np.float32))
    lr_eps = (jnp.float32(0.01), jnp.float32(1e-10))

    # Method A: chain of individual dispatches, slope between N1 and N2,
    # forced scalar readback at the end of each measurement.
    def run_chain(n, params):
        t0 = time.perf_counter()
        for _ in range(n):
            out, params = step(params, indices, offsets, d_output, lr_eps)
        _ = float(jnp.sum(params.tt_cores[0][0, 0, :8]))
        return time.perf_counter() - t0, params

    _, params = run_chain(10, params)  # warm
    t1, params = run_chain(10, params)
    t2, params = run_chain(110, params)
    print(f"A dispatch-chain slope: {(t2 - t1) / 100 * 1e3:.4f} ms/step")

    # Method B: fori_loop slope (bench.py method).
    @jax.jit
    def run_k(params, k):
        def body(_, pr):
            _, p2 = step(pr, indices, offsets, d_output, lr_eps)
            return p2
        return jax.lax.fori_loop(0, k, body, params)

    def timed(k, pr):
        t0 = time.perf_counter()
        pr = run_k(pr, k)
        _ = float(jnp.sum(pr.tt_cores[0][0, 0, :8]))
        return time.perf_counter() - t0, pr

    _, params = timed(5, params)
    t1, params = timed(10, params)
    t2, params = timed(110, params)
    print(f"B fori_loop slope:      {(t2 - t1) / 100 * 1e3:.4f} ms/step")

    # Method C: block_until_ready on a chain (the possibly-lying method).
    for _ in range(5):
        out, params = step(params, indices, offsets, d_output, lr_eps)
    jax.block_until_ready(params.tt_cores)
    t0 = time.perf_counter()
    for _ in range(100):
        out, params = step(params, indices, offsets, d_output, lr_eps)
    jax.block_until_ready(params.tt_cores)
    print(f"C block_until_ready:    {(time.perf_counter() - t0) / 100 * 1e3:.4f} ms/step")


if __name__ == "__main__":
    main()
