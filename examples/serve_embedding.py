"""Serving walkthrough: train a TT embedding, freeze it, serve requests.

The inference half of the user journey through the public API:

  1. Train a cached `TTEmbeddingBag` for a few hundred steps (fused
     sparse SGD, LFU counting) and promote hot rows with
     `cache_populate()`.
  2. Freeze for serving (`freeze_for_serving`): a one-time weight fold
     precomputes the pass tables and the G0xG1 pair-product table, so
     every serve call skips the first kernel pass and the forward
     permute. `--quantize` stores the folded tables as per-row int8
     (2-4x serving capacity per chip, ~0.4% row error).
  3. Serve variable-size requests through the bucketed front-end
     (`make_bucketed_serving_fn`): arbitrary (batch, nnz) shapes round up
     to a fixed bucket grid, so a production server compiles a bounded
     number of programs.
  4. Cross-check every served batch against the training-path forward.

Run:

    python examples/serve_embedding.py            # E=1M on TPU or CPU
    python examples/serve_embedding.py --tiny     # seconds on CPU
    python examples/serve_embedding.py --quantize # int8 folded tables

The upstream reference (facebookresearch/FBTT-Embedding) has no serving
entry; this is the TPU framework's net-new inference story (SURVEY §2.6).
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--quantize", action="store_true",
                    help="fold int8 pair/cache tables")
    ap.add_argument("--train-steps", type=int, default=50)
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from fbtt_embedding_tpu import OptimType, TTEmbeddingBag
    from fbtt_embedding_tpu.models.tt_embedding import (
        make_bucketed_serving_fn,
    )

    if args.tiny:
        e, d, p, q, ranks = 216, 16, [6, 6, 6], [4, 2, 2], [8, 8]
        cache_size, hashtbl = 32, 216
        # approx-normal init (the production default) scales rows by a
        # 1/sqrt(E)-ish factor that leaves TINY tables with large rows
        # (std ~4 at E=216) — lr 0.002 diverges there. The walkthrough's
        # point is serving, not tuning: tame init + lr for the toy size.
        dist, lr = "uniform", 5e-4
    else:
        e, d, p, q, ranks = 1_000_000, 64, [100, 100, 100], [4, 4, 4], \
            [32, 32]
        cache_size, hashtbl = 10_000, 1_000_000
        dist, lr = "approx-normal", 0.002

    emb = TTEmbeddingBag(
        num_embeddings=e, embedding_dim=d, tt_p_shapes=p, tt_q_shapes=q,
        tt_ranks=ranks, optimizer=OptimType.SGD, learning_rate=lr,
        sparse=True, use_cache=True, cache_size=cache_size,
        hashtbl_size=hashtbl, weight_dist=dist)

    # --- 1. train briefly so the fold has real weights + a warm cache ----
    rng = np.random.default_rng(0)
    b, L = 64, 8
    target = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    for step in range(args.train_steps):
        idx = (rng.zipf(1.5, size=b * L) % e).astype(np.int64)
        offs = np.arange(0, b * L + 1, L, dtype=np.int64)
        out = emb(idx, offs)
        emb.backward(2.0 * (out - target[None]) / b)
    emb.cache_populate()

    # --- 2. freeze + 3. bucketed front-end -------------------------------
    quant = "int8" if args.quantize else None
    folded_fixed, serve_fixed = emb.freeze_for_serving(
        batch_size=64, quantize=quant)
    # Exercise step 2 of the journey: one fixed-shape batch through the
    # frozen fold, cross-checked against the live module forward.
    fb, fl = 64, 4
    fidx = (rng.zipf(1.5, size=fb * fl) % e).astype(np.int64)
    foffs = np.arange(0, fb * fl + 1, fl, dtype=np.int64)
    fixed_out = np.asarray(serve_fixed(folded_fixed, jnp.asarray(
        fidx.astype(np.int32)), jnp.asarray(foffs.astype(np.int32))))[0]
    fixed_ref = np.asarray(emb(fidx, foffs, warmup=False))
    fscale = max(1e-6, float(np.abs(fixed_ref).max()))
    fixed_err = float(np.abs(fixed_out - fixed_ref).max()) / fscale
    assert fixed_err < (0.06 if args.quantize else 5e-3), fixed_err
    fold, serve = make_bucketed_serving_fn(
        emb.tt_p_shapes, emb.tt_q_shapes, emb.tt_ranks, num_tables=1,
        batch_buckets=[16, 64], nnz_buckets=[128, 512],
        quantize=quant)
    folded = fold(emb.params)

    # --- 4. serve odd request sizes, cross-check vs the module forward ---
    tol = 0.06 if args.quantize else 5e-3
    max_err, served = 0.0, 0
    for breq, lreq in [(5, 7), (16, 8), (41, 3), (64, 2)]:
        nnz = breq * lreq
        idx = (rng.zipf(1.5, size=nnz) % e).astype(np.int64)
        offs = np.arange(0, nnz + 1, lreq, dtype=np.int64)
        got = np.asarray(serve(folded, idx, offs))[0]
        expect = np.asarray(emb(idx, offs, warmup=False))
        assert np.isfinite(expect).all(), "training diverged (NaN weights)"
        scale = max(1e-6, float(np.abs(expect).max()))
        # NaN-sensitive accumulation: Python's max() silently drops NaN
        # (max(0.0, nan) == 0.0), which once masked a divergence here
        err = float(np.abs(got - expect).max()) / scale
        assert np.isfinite(err), "serving output not finite"
        max_err = max(max_err, err)
        served += breq
    assert max_err < tol, (max_err, tol)
    hit = emb.cache_hit_rate()
    print(f"served {served} bags across 4 request shapes; "
          f"max rel err vs training forward {max_err:.2e}; "
          f"cache hit rate {hit:.2f}"
          + (" (int8 folded tables)" if args.quantize else ""))
    return {"max_rel_err": max_err, "served": served, "hit_rate": hit}


if __name__ == "__main__":
    main()
