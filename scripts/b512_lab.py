#!/usr/bin/env python3
"""B=512 headline-cell tuning lab: within-one-process A/B over the
kernel scheduling knobs (FBTT_SEG, FBTT_TRIP_SB, FBTT_SPAN_BLOCK) at
the reference configuration with LFU counting on.

At B=512 the step is launch-dominated: the two span-blocked kernel
passes cost ~5.4 us/program x 40 programs (trace 2026-08; DMA alone
would be ~1 us), so fewer/wider programs may win even though the same
change loses at B>=8k. SPAN_BLOCK is normally import-time; here it is
monkeypatched between step constructions (every consumer reads the
module attribute at trace time; the lru-cached kernel factories key on
the sb value).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from perf_battery import slope  # noqa: E402  (same measurement rules)


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-cache", dest="cache", action="store_false",
                    default=True, help="measure the counting-OFF step")
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp

    from fbtt_embedding_tpu import OptimType, TTEmbeddingParams
    from fbtt_embedding_tpu.models.tt_embedding import make_fused_train_step
    from fbtt_embedding_tpu.ops.cache import make_cache_state
    from fbtt_embedding_tpu.ops.pallas import tt_flat
    from fbtt_embedding_tpu.utils.init import init_tt_cores

    p, q, ranks = [200, 220, 250], [4, 4, 4], [32, 32]
    rfull = [1] + ranks + [1]
    E, D = int(np.prod(p)), int(np.prod(q))
    b, L = 512, 20
    nnz = b * L
    rng = np.random.default_rng(0)
    cores = tuple(
        jnp.asarray(c)
        for c in init_tt_cores(rng, "uniform", 1, E, D, p, q, rfull))
    indices = jnp.asarray(rng.integers(0, E, size=nnz).astype(np.int32))
    offsets = jnp.asarray(np.arange(0, nnz + 1, L, dtype=np.int32))
    d_out = jnp.asarray((rng.random((1, b, D)) * 1e-3).astype(np.float32))
    lr_eps = (jnp.float32(0.01), jnp.float32(1e-10))

    print(f"device={jax.devices()[0].device_kind}", flush=True)

    import functools as _ft

    def measure(tag, seg, sb, span_block):
        os.environ["FBTT_SEG"] = str(seg)
        if sb is None:
            os.environ.pop("FBTT_TRIP_SB", None)
        else:
            os.environ["FBTT_TRIP_SB"] = str(sb)
        old_span = tt_flat.SPAN_BLOCK
        tt_flat.SPAN_BLOCK = span_block
        try:
            step = make_fused_train_step(
                p, q, rfull, 1, b, OptimType.SGD, use_cache=args.cache)
            c = (make_cache_state(E, int(0.1 * E), D, "none",
                                  num_embeddings=E) if args.cache
                 else None)
            prm = TTEmbeddingParams(
                tuple(jnp.copy(x) for x in cores),
                tuple(jnp.zeros((0,), jnp.float32) for _ in cores), c)

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
            print(f"{tag:40s} {t*1e3:8.3f} ms", flush=True)
            return t
        finally:
            tt_flat.SPAN_BLOCK = old_span

    from fbtt_embedding_tpu.ops.pallas import tt_flat as _tf
    cur_span = _tf.SPAN_BLOCK
    base = measure("current default (adaptive seg/sb)", None, None,
                   cur_span)
    measure("seg=256 sb=auto span=8 (round<=4 default)", 256, None, 8)
    # round-5: the per-span masked concat costs sb*seg*bw VPU work per
    # trip irrespective of span length, so the span term scales with
    # p_rows*seg — SMALLER segments should cut it at small batch
    measure("seg=128 sb=auto span=8", 128, None, 8)
    measure("seg=128 sb=4 span=4", 128, 4, 4)
    measure("seg=64 sb=auto span=8", 64, None, 8)
    measure("seg=64 sb=2 span=2", 64, 2, 2)
    measure("seg=192 sb=auto span=8", 192, None, 8)
    measure("seg=512 sb=8 span=8", 512, 8, 8)
    # re-measure the SAME config as `base` to bracket epoch drift
    base2 = measure("current default (again)", None, None, cur_span)
    print(f"epoch drift check: {base*1e3:.3f} vs {base2*1e3:.3f} ms",
          flush=True)
    os.environ.pop("FBTT_SEG", None)
    os.environ.pop("FBTT_TRIP_SB", None)


if __name__ == "__main__":
    main()
