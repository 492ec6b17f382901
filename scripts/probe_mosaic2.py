#!/usr/bin/env python3
"""Probe round 2: ops needed for the fused TT kernel design."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BN, B = 128, 512


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
            ok = np.allclose(out, check, rtol=1e-5, atol=1e-5)
            print(f"{'OK   ' if ok else 'WRONG'} {name}")
        else:
            print(f"OK    {name}")
        return out
    except Exception as e:
        msg = str(e).split("\n")[0][:110]
        print(f"FAIL  {name}: {msg}")
        return None


rng = np.random.default_rng(0)
z0b = jnp.asarray(rng.normal(size=(BN, 4, 4, 32)).astype(np.float32))
g1g = jnp.asarray(rng.normal(size=(BN, 4, 32, 32)).astype(np.float32))
row = jnp.asarray(rng.normal(size=(BN, 16, 4)).astype(np.float32))
U = np.zeros((16, 4, 64), np.float32)
for m in range(16):
    for a in range(4):
        U[m, a, m * 4 + a] = 1.0
U = jnp.asarray(U)
rowflat = jnp.asarray(rng.normal(size=(BN, 64)).astype(np.float32))
oh = jnp.asarray((rng.random((BN, B)) < 0.01).astype(np.float32))
z1 = jnp.asarray(rng.normal(size=(BN, 4, 4, 32)).astype(np.float32))


# A. 2-batch-dim 4D dot: [BN,4,4,32] x [BN,4,32,32] contract r1, batch (n,q1)
def kA(a_ref, b_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:], (((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32)

ckA = np.einsum('nbar,nbqr->nbaq', np.asarray(z0b), np.asarray(g1g))
probe("2-batch 4D dot", kA, ((BN, 4, 4, 32), jnp.float32), z0b, g1g, check=ckA)


# B. sublane merge [BN,4,4,32] -> [BN,16,32]
def kB(x_ref, o_ref):
    o_ref[:] = x_ref[:].reshape(BN, 16, 32)

probe("sublane merge [BN,4,4,32]->[BN,16,32]", kB, ((BN, 16, 32), jnp.float32),
      z1, check=np.asarray(z1).reshape(BN, 16, 32))


# C. multi-dim contraction flatten: [BN,16,4] x [16,4,64] -> [BN,64]
def kC(r_ref, u_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        r_ref[:], u_ref[:], (((1, 2), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32)

ckC = np.einsum('nma,mad->nd', np.asarray(row), np.asarray(U))
probe("flatten via 0/1 tensor dot", kC, ((BN, 64), jnp.float32), row, U,
      check=ckC)


# D. pooling dot: [BN,64] x [BN,B] contract n -> [64,B]
def kD(r_ref, o_ref2, o_ref):
    o_ref[:] = jax.lax.dot_general(
        r_ref[:], o_ref2[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

ckD = np.asarray(rowflat).T @ np.asarray(oh)
probe("pool dot [BN,64]x[BN,B]->[64,B]", kD, ((64, B), jnp.float32),
      rowflat, oh, check=ckD)


# E. dynamic 4D row read: ref[i] -> [4,32,32]
big4 = jnp.asarray(rng.normal(size=(50, 4, 32, 32)).astype(np.float32))


def kE(x_ref, o_ref):
    o_ref[:] = x_ref[jnp.int32(7)]

probe("dyn 4D row read", kE, ((4, 32, 32), jnp.float32), big4,
      check=np.asarray(big4)[7])


# F. dynamic RMW: o[ds(r,1),:] = o[ds(r,1),:] + v
x_4_128 = jnp.asarray(rng.normal(size=(4, 128)).astype(np.float32))


def kF(x_ref, o_ref):
    o_ref[:] = jnp.zeros_like(o_ref)
    rw = jnp.int32(3)
    cur = o_ref[pl.ds(rw, 1), :]
    o_ref[pl.ds(rw, 1), :] = cur + x_ref[0:1, :]

ckF = np.zeros((8, 128), np.float32)
ckF[3] = np.asarray(x_4_128)[0]
probe("dyn RMW out[ds(r,1)]", kF, ((8, 128), jnp.float32), x_4_128, check=ckF)


# G. dynamic 3D RMW on scratch-like output: o[i] = o[i] + v (3D)
v_4_32 = jnp.asarray(rng.normal(size=(4, 32)).astype(np.float32))


def kG(v_ref, o_ref):
    o_ref[:] = jnp.zeros_like(o_ref)
    i = jnp.int32(5)
    o_ref[i] = o_ref[i] + v_ref[:]
    o_ref[i] = o_ref[i] + v_ref[:]

ckG = np.zeros((20, 4, 32), np.float32)
ckG[5] = 2 * np.asarray(v_4_32)
probe("dyn 3D RMW o[i] += v twice", kG, ((20, 4, 32), jnp.float32), v_4_32,
      check=ckG)


# H. one-hot build from SMEM scalars: iota compare
idx = jnp.asarray(rng.integers(0, B, BN).astype(np.int32))


def kH(idx_ref, o_ref):
    ids = jax.lax.broadcasted_iota(jnp.int32, (BN, B), 1)
    # read whole idx vector from VMEM as [BN,1]... idx as 2D input
    o_ref[:] = (idx_ref[:].reshape(BN, 1) == ids).astype(jnp.float32)

idx2d = idx.reshape(BN, 1)
ckH = (np.asarray(idx2d) == np.arange(B)[None, :]).astype(np.float32)
probe("one-hot via iota compare", kH, ((BN, B), jnp.float32), idx2d, check=ckH)


# I. multi-dim contraction for d_z0: [BN,4,4,32] x [BN,4,32,32]
#    contract (a1, r2) x (q1, r2): d_z0[n,a0,r1] = sum_{a1,r2} dz1[n,a1,a0,r2]*g1g[n,a1,r2,r1]
g1g_b = jnp.asarray(rng.normal(size=(BN, 4, 32, 32)).astype(np.float32))


def kI(a_ref, b_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1, 3), (1, 2)), ((0,), (0,))),
        preferred_element_type=jnp.float32)

ckI = np.einsum('nbar,nbrk->nak', np.asarray(z1), np.asarray(g1g_b))
probe("2-dim contract batched", kI, ((BN, 4, 32), jnp.float32), z1, g1g_b,
      check=ckI)


# J. batched dot transposed-lhs: dg2[n,r2,a2]=sum_m z1m[n,m,r2]*drow[n,m,a2]
z1m = jnp.asarray(rng.normal(size=(BN, 16, 32)).astype(np.float32))
drow = jnp.asarray(rng.normal(size=(BN, 16, 4)).astype(np.float32))


def kJ(a_ref, b_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)

ckJ = np.einsum('nmr,nma->nra', np.asarray(z1m), np.asarray(drow))
probe("batched dot lhsT", kJ, ((BN, 32, 4), jnp.float32), z1m, drow, check=ckJ)
