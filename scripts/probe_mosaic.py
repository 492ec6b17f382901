#!/usr/bin/env python3
"""Probe which ops Mosaic supports on this TPU, one tiny kernel per probe."""

import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, kernel, out_shape, *args):
    try:
        fn = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(*out_shape),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        print(f"OK    {name}")
        return np.asarray(out)
    except Exception as e:
        msg = str(e).split("\n")[0][:120]
        print(f"FAIL  {name}: {msg}")
        return None


x_4_128 = jnp.arange(4 * 128, dtype=jnp.float32).reshape(4, 128)
x_128_4 = jnp.arange(128 * 4, dtype=jnp.float32).reshape(128, 4)
x_128_32 = jnp.ones((128, 32), jnp.float32)
a_b = jnp.ones((4, 4, 32), jnp.float32)
b_b = jnp.ones((4, 32, 32), jnp.float32)


# 1. lane-merging reshape [4,128] -> [16,32]
def k1(x_ref, o_ref):
    o_ref[:] = x_ref[:].reshape(16, 32)

probe("reshape [4,128]->[16,32]", k1, ((16, 32), jnp.float32), x_4_128)


# 2. sublane split [128,4] -> [32,4,4]
def k2(x_ref, o_ref):
    o_ref[:] = x_ref[:].reshape(32, 4, 4)

probe("reshape [128,4]->[32,4,4]", k2, ((32, 4, 4), jnp.float32), x_128_4)


# 3. batched dot_general [4,4,32]x[4,32,32]
def k3(a_ref, b_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)

probe("batched dot [4,4,32]@[4,32,32]", k3, ((4, 4, 32), jnp.float32), a_b, b_b)


# 4. static lane slice at offset 32
def k4(x_ref, o_ref):
    o_ref[:] = x_ref[:, 32:64]

probe("lane slice [:,32:64]", k4, ((4, 32), jnp.float32), x_4_128)


# 5. small dot [4,32]@[32,128]
def k5(x_ref, y_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        x_ref[:].reshape(4, 32), y_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

x_4_32 = jnp.ones((4, 32), jnp.float32)
y_32_128 = jnp.ones((32, 128), jnp.float32)
probe("dot [4,32]@[32,128]", k5, ((4, 128), jnp.float32), x_4_32, y_32_128)


# 6. dynamic row read from 3D ref: ref[i] -> [a, b]
big3 = jnp.arange(100 * 4 * 32, dtype=jnp.float32).reshape(100, 4, 32)


def k6(x_ref, o_ref):
    i = jnp.int32(7)
    o_ref[:] = x_ref[i]

r = probe("dynamic 3D row read ref[i]", k6, ((4, 32), jnp.float32), big3)
if r is not None:
    assert np.allclose(r, np.asarray(big3)[7]), "wrong values"


# 7. dynamic accumulate out[pl.ds(r,1),:] += v
def k7(x_ref, o_ref):
    o_ref[:] = jnp.zeros_like(o_ref)
    v = x_ref[0:1, :]
    rw = jnp.int32(3)
    o_ref[pl.ds(rw, 1), :] += v

probe("dyn accumulate out[ds(r,1)] +=", k7, ((8, 128), jnp.float32), x_4_128)


# 8. reshape [1,128] -> [4,32] (single gathered row regroup)
def k8(x_ref, o_ref):
    o_ref[:] = x_ref[0].reshape(4, 32)

probe("reshape row [128]->[4,32]", k8, ((4, 32), jnp.float32), x_4_128)


# 9. transpose [4,128]->[128,4]
def k9(x_ref, o_ref):
    o_ref[:] = x_ref[:].T

probe("transpose [4,128]", k9, ((128, 4), jnp.float32), x_4_128)


# 10. dot with lhs [16,32] rhs [32,4]
def k10(x_ref, y_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], y_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

x16_32 = jnp.ones((16, 32), jnp.float32)
y32_4 = jnp.ones((32, 4), jnp.float32)
probe("dot [16,32]@[32,4]", k10, ((16, 4), jnp.float32), x16_32, y32_4)


# 11. fori_loop with dynamic ref reads inside
def k11(x_ref, o_ref):
    def body(i, acc):
        return acc + x_ref[i, :]
    o_ref[0, :] = jax.lax.fori_loop(0, 4, body, jnp.zeros((128,), jnp.float32))

probe("fori_loop dyn row reads", k11, ((1, 128), jnp.float32), x_4_128)


# 12. int32 scalar read from VMEM 1D ref
idx1d = jnp.arange(64, dtype=jnp.int32)


def k12(x_ref, o_ref):
    i = x_ref[5]
    o_ref[0, 0] = i

probe("1D int VMEM scalar read", k12, ((1, 1), jnp.int32), idx1d)
