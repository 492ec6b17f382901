"""Microbench: LFU counting scatter variants on the real TPU.

Variants (E=11M rows, nnz=10240 int32 indices, uniform):
  a) s32[E] scatter-add of ones           (status quo, ~195us in-trace)
  b) u16[E] delta scatter-add (22 MB)     (over VMEM; may or may not help)
  c) 2-slab u16[E/2] masked scatters      (11 MB each, inside VMEM)
  d) s16 variants of (b)/(c)
  e) fold cost: freq += delta; delta = 0  (dense elementwise)
Slope method: K1/K2 steps inside one jitted fori_loop, scalar readback.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

E = 11_000_000
NNZ = 10_240
K1, K2 = 40, 120

rng = np.random.default_rng(0)
idx_np = rng.integers(0, E, size=NNZ).astype(np.int32)
idx0 = jnp.asarray(idx_np)


def slope(fn, state):
    # fn(state, k) -> scalar; jitted with static k
    f1 = jax.jit(fn, static_argnums=1)
    s = f1(state, K1)
    s.block_until_ready()
    ts = []
    for k in (K1, K2, K1, K2, K1, K2):
        t0 = time.perf_counter()
        f1(state, k).block_until_ready()
        ts.append(time.perf_counter() - t0)
    sl = [(ts[i + 1] - ts[i]) / (K2 - K1) for i in (0, 2, 4)]
    return float(np.median(sl))


def perturb(idx, i):
    # new index vector each iter so XLA can't hoist; cheap (VPU add+mod)
    return (idx + i) % E


def v_s32(state, k):
    freq = state

    def body(i, c):
        f, acc = c
        ix = perturb(idx0, i)
        f = f.at[ix].add(1, mode="promise_in_bounds")
        return f, acc + f[0]

    f, acc = jax.lax.fori_loop(0, k, body, (freq, jnp.int32(0)))
    return acc + f[1]


def make_delta(dtype):
    def v(state, k):
        delta = state

        def body(i, c):
            d, acc = c
            ix = perturb(idx0, i)
            d = d.at[ix].add(jnp.asarray(1, d.dtype), mode="promise_in_bounds")
            return d, acc + d[0].astype(jnp.int32)

        d, acc = jax.lax.fori_loop(0, k, body, (delta, jnp.int32(0)))
        return acc + d[1].astype(jnp.int32)

    return v


def make_slab(dtype, nslab):
    half = (E + nslab - 1) // nslab

    def v(state, k):
        slabs = state

        def body(i, c):
            sl, acc = c
            ix = perturb(idx0, i)
            out = []
            for s in range(nslab):
                lo = s * half
                in_s = (ix >= lo) & (ix < lo + half)
                ixs = jnp.where(in_s, ix - lo, 0)
                inc = in_s.astype(dtype)
                out.append(sl[s].at[ixs].add(inc, mode="promise_in_bounds"))
            sl = tuple(out)
            return sl, acc + sl[0][0].astype(jnp.int32)

        sl, acc = jax.lax.fori_loop(0, k, body, (slabs, jnp.int32(0)))
        return acc + sl[-1][1].astype(jnp.int32)

    return v


def v_fold(state, k):
    freq, delta = state

    def body(i, c):
        f, d, acc = c
        f = f + d.astype(jnp.int32) + i  # +i: not hoistable
        d = jnp.zeros_like(d)
        return f, d, acc + f[0]

    f, d, acc = jax.lax.fori_loop(
        0, k, body, (freq, delta, jnp.int32(0)))
    return acc + f[1] + d[1].astype(jnp.int32)


def main():
    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    freq = jnp.zeros((E,), jnp.int32)
    res = {}
    res["a_s32_scatter"] = slope(v_s32, freq) / 1e-6
    for name, dt in (("u16", jnp.uint16), ("s16", jnp.int16),
                     ("s8", jnp.int8)):
        delta = jnp.zeros((E,), dt)
        res[f"b_delta_{name}"] = slope(make_delta(dt), delta) / 1e-6
    for nslab in (2, 4):
        half = (E + nslab - 1) // nslab
        slabs = tuple(jnp.zeros((half,), jnp.uint16) for _ in range(nslab))
        res[f"c_slab{nslab}_u16"] = slope(make_slab(jnp.uint16, nslab),
                                          slabs) / 1e-6
    delta = jnp.zeros((E,), jnp.uint16)
    res["e_fold_u16_to_s32"] = slope(v_fold, (freq, delta)) / 1e-6
    for k, v in res.items():
        print(f"{k:24s} {v:9.1f} us/step", flush=True)


if __name__ == "__main__":
    main()
