"""Round-4 LFU-counting experiments on the real TPU (within-run A/Bs).

Round-3/4 established: the per-step freq scatter (s32[11M], nnz=10240)
sits at a ~19 ns/operand-row floor; small-dtype persistent delta tables
and chunked slab scatters all lose (scripts/scatter_lab.py). Two angles
those experiments did NOT cover:

  EXP1 "window": Zipf traffic concentrates on LOW row ids (the
      benchmark's `zipf % E`), the same property the cached-training
      hot scatter exploits (ops/hot_scatter.py) — but for the SCALAR
      freq table. In-window ids fold through a tiny s32[W+1] delta
      (scatter into a KB..MB-scale target) + one dense slab add;
      out-of-window stragglers apply in while-loop chunks (dynamic trip
      count, zero under strong skew).

  EXP2 "deferred-exact": hot rows repeat ACROSS steps, so buffering k
      steps of indices and folding ONCE with cross-step dedup reduces
      scatter operand rows from k*nnz to #uniques — exact counts,
      folded at most k steps late (observationally identical if pending
      counts are flushed before cache_populate). Flush = sort k*nnz,
      segment-count runs, compact uniques to the front, apply in
      while-loop chunks of CH rows (ceil(uniq/CH) trips).

Run on an otherwise-idle chip; compare only within one process.
"""
import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

E = 11_000_000
NNZ = 10_240
K1, K2 = 40, 120


def slope(fn, state, k1=K1, k2=K2):
    f1 = jax.jit(fn, static_argnums=1)
    f1(state, k1).block_until_ready()
    ts = []
    for k in (k1, k2, k1, k2, k1, k2):
        t0 = time.perf_counter()
        f1(state, k).block_until_ready()
        ts.append(time.perf_counter() - t0)
    sl = [(ts[i + 1] - ts[i]) / (k2 - k1) for i in (0, 2, 4)]
    return float(np.median(sl))


def make_traffic(alpha: float, n: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    if alpha > 1.0:
        return (rng.zipf(alpha, size=n) % E).astype(np.int32)
    return rng.integers(0, E, size=n).astype(np.int32)


def perturb(idx, i):
    # rotate hot ids within a small id neighborhood so the dupe/skew
    # structure of the traffic is preserved across loop iterations
    # (adding a huge constant would destroy the low-id concentration)
    return jnp.where(idx < 1 << 20, (idx + i) % (1 << 20), idx)


# ---------------------------------------------------------------- EXP0
def v_plain_sorted(idx0):
    def v(state, k):
        def body(i, c):
            f, acc = c
            ix = jax.lax.sort(perturb(idx0, i))
            f = f.at[ix].add(1, mode="promise_in_bounds",
                             indices_are_sorted=True)
            return f, acc + f[0]

        f, acc = jax.lax.fori_loop(
            0, k, body, (state, jnp.int32(0)))
        return acc + f[1]

    return v


# ---------------------------------------------------------------- EXP1
def v_window(idx0, w: int, chunk: int = 2048):
    def v(state, k):
        def body(i, c):
            f, acc = c
            ix = perturb(idx0, i)
            in_w = ix < w
            # tiny-delta scatter + dense slab add for the window
            delta = jnp.zeros((w + 1,), jnp.int32).at[
                jnp.where(in_w, ix, w)
            ].add(1, mode="promise_in_bounds")
            f = f.at[0:w].add(delta[:w])
            # stragglers: compact positions, apply in while-chunks
            pos = jnp.arange(NNZ, dtype=jnp.int32)
            skey = jax.lax.sort(jnp.where(in_w, jnp.int32(NNZ), pos))
            n_s = jnp.sum((~in_w).astype(jnp.int32))
            n_chunks = (n_s + chunk - 1) // chunk

            def more(cc):
                return cc[0] < n_chunks

            def apply_chunk(cc):
                j, ff = cc
                take = jax.lax.dynamic_slice(skey, (j * chunk,), (chunk,))
                live = take < NNZ
                ixc = jnp.where(live, ix[jnp.minimum(take, NNZ - 1)], E)
                ff = ff.at[jnp.minimum(ixc, E - 1)].add(
                    live.astype(jnp.int32), mode="promise_in_bounds")
                return j + 1, ff

            _, f = jax.lax.while_loop(more, apply_chunk, (jnp.int32(0), f))
            return f, acc + f[0]

        f, acc = jax.lax.fori_loop(0, k, body, (state, jnp.int32(0)))
        return acc + f[1]

    return v


# ---------------------------------------------------------------- EXP2
def v_deferred(big_idx, kk: int, chunk: int = 8192):
    """Amortized cost of one flush of kk steps' traffic, divided by kk:
    the loop body does ONE flush of kk*NNZ ids (each iteration re-sorts
    and re-applies, i.e. models every kk-th step; per-step append cost
    is a 40 KB dynamic_update_slice, measured separately as ~free).
    ``big_idx`` holds kk INDEPENDENT steps' draws — cross-step dedup is
    the honest kind, not a tiled copy of one step."""
    n = kk * NNZ

    def v(state, k):
        big0 = big_idx[:n]

        def body(i, c):
            f, acc = c
            ids = jax.lax.sort(perturb(big0, i))
            # run boundaries -> per-run counts via cumsum differencing
            first = jnp.concatenate([
                jnp.ones((1,), bool), ids[1:] != ids[:-1]])
            pos = jnp.arange(n, dtype=jnp.int32)
            # compact unique run-starts to the front (stable sort)
            skey = jax.lax.sort(jnp.where(first, pos, jnp.int32(n)))
            n_u = jnp.sum(first.astype(jnp.int32))
            # counts: next run start - this run start
            starts = jnp.minimum(skey, n - 1)
            nxt = jnp.concatenate([skey[1:], jnp.full((1,), n, jnp.int32)])
            cnts = jnp.where(skey < n, jnp.minimum(nxt, n) - skey, 0)
            n_chunks = (n_u + chunk - 1) // chunk

            def more(cc):
                return cc[0] < n_chunks

            def apply_chunk(cc):
                j, ff = cc
                tpos = jax.lax.dynamic_slice(starts, (j * chunk,), (chunk,))
                tcnt = jax.lax.dynamic_slice(cnts, (j * chunk,), (chunk,))
                live = tcnt > 0
                ixc = jnp.where(live, ids[tpos], E)
                ff = ff.at[jnp.minimum(ixc, E - 1)].add(
                    jnp.where(live, tcnt, 0), mode="promise_in_bounds")
                return j + 1, ff

            _, f = jax.lax.while_loop(more, apply_chunk, (jnp.int32(0), f))
            return f, acc + f[0]

        f, acc = jax.lax.fori_loop(0, k, body, (state, jnp.int32(0)))
        return acc + f[1]

    return v


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--alpha", type=float, default=1.05)
    args = ap.parse_args()

    print(f"device={jax.devices()[0].device_kind} alpha={args.alpha}",
          flush=True)
    idx_np = make_traffic(args.alpha, NNZ)
    idx0 = jnp.asarray(idx_np)
    uniq1 = len(np.unique(idx_np))
    big = make_traffic(args.alpha, 8 * NNZ, seed=1)
    print(f"uniques: 1 step {uniq1}/{NNZ}, 8 steps "
          f"{len(np.unique(big))}/{8 * NNZ}", flush=True)

    freq = jnp.zeros((E,), jnp.int32)
    t = slope(v_plain_sorted(idx0), freq)
    print(f"plain sorted scatter             {t*1e3:8.3f} ms/step", flush=True)

    for w in (1 << 16, 1 << 21, 1 << 22):
        t = slope(v_window(idx0, w), freq)
        print(f"window W={w:>8} + stragglers    {t*1e3:8.3f} ms/step",
              flush=True)

    big_idx = jnp.asarray(big)
    for kk in (4, 8):
        t = slope(v_deferred(big_idx, kk), freq, k1=10, k2=30)
        print(f"deferred-exact k={kk} (per flush) {t*1e3:8.3f} ms "
              f"-> {t/kk*1e3:8.3f} ms/step amortized", flush=True)


if __name__ == "__main__":
    main()
