#!/usr/bin/env python3
"""Head-to-head: captured-constant params loop vs argument-passed params loop."""

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
params0 = TTEmbeddingParams(cores, opt_state, cache)

step = make_fused_train_step(p, q, rfull, 1, b, OptimType.SGD, use_cache=True,
                             probe_cache=False)
indices = jnp.asarray(rng.integers(0, E, size=nnz).astype(np.int32))
offsets = jnp.asarray(np.arange(0, nnz + 1, L, dtype=np.int32))
d_output = jnp.asarray((rng.random((1, b, D)) * 0.1).astype(np.float32))
lr_eps = (jnp.float32(0.01), jnp.float32(1e-10))


def slope(fn, k1=10, k2=100):
    fn(3); fn(3)  # compile + warm (incl. readback compile)
    t0 = time.perf_counter()
    fn(k1)
    t1 = time.perf_counter()
    fn(k2)
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (k2 - k1) * 1e3


# A: params passed as argument (bench style)
@jax.jit
def run_arg(params, k):
    def body(_, pr):
        _, p2 = step(pr, indices, offsets, d_output, lr_eps)
        return p2
    return jax.lax.fori_loop(0, k, body, params)


params_a = params0


def fn_a(k):
    global params_a
    pr = run_arg(params_a, k)
    _ = float(jnp.sum(pr.tt_cores[0][0, 0, :8]))
    params_a = pr


print(f"A params-as-arg:      {slope(fn_a):.4f} ms/step")


# B: params captured as constants (profile_step style)
@jax.jit
def run_const(k):
    def body(_, pr):
        _, p2 = step(pr, indices, offsets, d_output, lr_eps)
        return p2
    pr = jax.lax.fori_loop(0, k, body, params0)
    return jnp.sum(pr.tt_cores[0][0, 0, :8])


def fn_b(k):
    _ = float(run_const(k))


print(f"B params-as-const:    {slope(fn_b):.4f} ms/step")


# C: params as arg, fresh each call (no chaining)
def fn_c(k):
    pr = run_arg(params0, k)
    _ = float(jnp.sum(pr.tt_cores[0][0, 0, :8]))


print(f"C arg, fresh params:  {slope(fn_c):.4f} ms/step")
