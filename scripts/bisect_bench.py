#!/usr/bin/env python3
"""Find why bench.py reports ~4ms/step but profile_step reports ~1.87ms."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from fbtt_embedding_tpu import OptimType, TTEmbeddingParams
from fbtt_embedding_tpu.models.tt_embedding import make_fused_train_step
from fbtt_embedding_tpu.ops.cache import make_cache_state
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
opt_state = tuple(jnp.zeros((0,), jnp.float32) for _ in cores)
cache = make_cache_state(E, int(0.1 * E), D, "none")
params = TTEmbeddingParams(cores, opt_state, cache)

step = make_fused_train_step(p, q, rfull, 1, b, OptimType.SGD, use_cache=True,
                             probe_cache=False)
indices = jnp.asarray(rng.integers(0, E, size=nnz).astype(np.int32))
offsets = jnp.asarray(np.arange(0, nnz + 1, L, dtype=np.int32))
d_output = jnp.asarray((rng.random((1, b, D)) * 0.1).astype(np.float32))
lr_eps = (jnp.float32(0.01), jnp.float32(1e-10))


# ---- bench.py's exact method
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


_, params = timed(10, params)
k1, k2 = 10, 100
t1, params = timed(k1, params)
t2, params = timed(k2, params)
print(f"bench method (dynamic k):   {(t2 - t1) / (k2 - k1) * 1e3:.4f} ms/step")

# ---- static-k loop (profile_step's method: k is static under jit? No —
# profile_step also passed k dynamically. Difference: readback target.)
t1b, params = timed(k1, params)
t2b, params = timed(k2, params)
print(f"bench method again:         {(t2b - t1b) / (k2 - k1) * 1e3:.4f} ms/step")


# readback of freq[0] instead of cores (profile_step read cores[0][0,0,0])
def timed2(k, pr):
    t0 = time.perf_counter()
    pr = run_k(pr, k)
    _ = float(pr.tt_cores[0][0, 0, 0])
    return time.perf_counter() - t0, pr


t1c, params = timed2(k1, params)
t2c, params = timed2(k2, params)
print(f"readback single elem:       {(t2c - t1c) / (k2 - k1) * 1e3:.4f} ms/step")

# d_output tiny values like profile_step (1e-3 scale)
d_output2 = jnp.asarray((rng.random((1, b, D)) * 1e-3).astype(np.float32))


@jax.jit
def run_k2(params, k):
    def body(_, pr):
        _, p2 = step(pr, indices, offsets, d_output2, lr_eps)
        return p2
    return jax.lax.fori_loop(0, k, body, params)


def timed3(k, pr):
    t0 = time.perf_counter()
    pr = run_k2(pr, k)
    _ = float(pr.tt_cores[0][0, 0, 0])
    return time.perf_counter() - t0, pr


_, params = timed3(5, params)
t1d, params = timed3(k1, params)
t2d, params = timed3(k2, params)
print(f"tiny d_output:              {(t2d - t1d) / (k2 - k1) * 1e3:.4f} ms/step")
