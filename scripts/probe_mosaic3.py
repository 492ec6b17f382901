#!/usr/bin/env python3
"""Probe round 3: backward-kernel ops."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BN = 128
rng = np.random.default_rng(0)


def probe(name, kernel, out_shape, *args, check=None):
    try:
        fn = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(*out_shape),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        out = np.asarray(jax.jit(fn)(*args))
        if check is not None:
            ok = np.allclose(out, check, rtol=2e-2, atol=2e-2)
            print(f"{'OK   ' if ok else 'WRONG'} {name}")
        else:
            print(f"OK    {name}")
        return out
    except Exception as e:
        print(f"FAIL  {name}: {str(e).splitlines()[0][:110]}")
        return None


a = jnp.asarray(rng.normal(size=(BN, 4, 32)).astype(np.float32))
big = jnp.asarray(rng.normal(size=(BN, 32, 128)).astype(np.float32))
ohT = jnp.asarray((rng.random((220, BN)) < 0.01).astype(np.float32))


# A. batched transpose swapaxes(1,2)
def kA(x_ref, o_ref):
    o_ref[:] = jnp.swapaxes(x_ref[:], 1, 2)

probe("swapaxes [BN,4,32]->[BN,32,4]", kA, ((BN, 32, 4), jnp.float32), a,
      check=np.swapaxes(np.asarray(a), 1, 2))


def kA2(x_ref, o_ref):
    o_ref[:] = jnp.swapaxes(x_ref[:], 1, 2)

probe("swapaxes [BN,32,128]->[BN,128,32]", kA2, ((BN, 128, 32), jnp.float32),
      big, check=np.swapaxes(np.asarray(big), 1, 2))


# B. 2D x 3D dot: [P, BN] @ [BN, 32, 128] -> [P, 32, 128]
def kB(x_ref, y_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], y_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

ckB = np.einsum('pn,nrk->prk', np.asarray(ohT), np.asarray(big))
probe("2Dx3D dot [220,BN]@[BN,32,128]", kB, ((220, 32, 128), jnp.float32),
      ohT, big, check=ckB)


# C. sublane concat of [BN,1,16] x4 -> [BN,4,16]
p16 = [jnp.asarray(rng.normal(size=(BN, 16)).astype(np.float32))
       for _ in range(4)]


def kC(x0, x1, x2, x3, o_ref):
    o_ref[:] = jnp.concatenate(
        [x[:][:, None, :] for x in (x0, x1, x2, x3)], axis=1)

ckC = np.stack([np.asarray(x) for x in p16], axis=1)
probe("expand+concat axis1", kC, ((BN, 4, 16), jnp.float32), *p16, check=ckC)


# D. accumulate big output across grid: out[:] += val with 3D out
def kD(x_ref, o_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[:] += x_ref[:]

try:
    fn = pl.pallas_call(
        kD,
        out_shape=jax.ShapeDtypeStruct((220, 32, 128), jnp.float32),
        grid=(4,),
        in_specs=[pl.BlockSpec((220, 32, 128), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((220, 32, 128), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    big220 = jnp.asarray(rng.normal(size=(220, 32, 128)).astype(np.float32))
    out = np.asarray(jax.jit(fn)(big220))
    ok = np.allclose(out, 4 * np.asarray(big220), rtol=1e-5)
    print(f"{'OK   ' if ok else 'WRONG'} grid accumulate 3D out")
except Exception as e:
    print(f"FAIL  grid accumulate 3D out: {str(e).splitlines()[0][:110]}")


# E. dot with int->float one-hot built from iota on [220, BN]
idx = jnp.asarray(rng.integers(0, 220, (1, BN)).astype(np.int32))


def kE(i_ref, v_ref, o_ref):
    iota_p = jax.lax.broadcasted_iota(jnp.int32, (220, BN), 0)
    oh = (iota_p == i_ref[0][None, :]).astype(jnp.float32)
    o_ref[:] = jax.lax.dot_general(
        oh, v_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

ohnp = (np.arange(220)[:, None] == np.asarray(idx)[0][None, :])
ckE = np.einsum('pn,nrk->prk', ohnp.astype(np.float32), np.asarray(big))
probe("iota one-hot + 2Dx3D dot", kE, ((220, 32, 128), jnp.float32), idx, big,
      check=ckE)
