#!/usr/bin/env python3
"""FBTT_FUSED_APPLY x FBTT_PAIR interaction at large nnz, one process.

The fused train-apply (one 3-output last-core kernel instead of a
transform + an accum pass) was gated to nnz <= 32768 because its wider
loop carries lost above that. Pair fusion removed the forward permute
and the pass-1 kernel from the fused-apply path too, so the trade-off
must be re-measured at every batch size.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from perf_battery import slope  # noqa: E402


def main():
    import functools as _ft

    import jax
    import jax.numpy as jnp

    from fbtt_embedding_tpu import OptimType, TTEmbeddingParams
    from fbtt_embedding_tpu.models.tt_embedding import make_fused_train_step
    from fbtt_embedding_tpu.utils.init import init_tt_cores

    p, q, ranks = [200, 220, 250], [4, 4, 4], [32, 32]
    rfull = [1] + ranks + [1]
    E, D = int(np.prod(p)), int(np.prod(q))
    L = 20
    rng = np.random.default_rng(0)
    cores = tuple(
        jnp.asarray(c)
        for c in init_tt_cores(rng, "uniform", 1, E, D, p, q, rfull))
    print(f"device={jax.devices()[0].device_kind}", flush=True)

    def measure(b, apply_mode):
        nnz = b * L
        os.environ["FBTT_FUSED_APPLY"] = apply_mode
        indices = jnp.asarray(rng.integers(0, E, size=nnz).astype(np.int32))
        offsets = jnp.asarray(np.arange(0, nnz + 1, L, dtype=np.int32))
        d_out = jnp.asarray(
            (rng.random((1, b, D)) * 1e-3).astype(np.float32))
        lr_eps = (jnp.float32(0.01), jnp.float32(1e-10))
        step = make_fused_train_step(p, q, rfull, 1, b, OptimType.SGD)
        prm = TTEmbeddingParams(
            tuple(jnp.copy(x) for x in cores),
            tuple(jnp.zeros((0,), jnp.float32) for _ in cores), None)

        @_ft.partial(jax.jit, donate_argnums=(1,))
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

        t = slope(fn)
        print(f"B={b:6d} FUSED_APPLY={apply_mode}: {t*1e3:8.3f} ms",
              flush=True)
        return t

    for b in (2048, 8192, 32768):
        measure(b, "0")
        measure(b, "1")
    os.environ.pop("FBTT_FUSED_APPLY", None)


if __name__ == "__main__":
    main()
