"""TT-EmbeddingBag benchmark CLI (reference ``tt_embeddings_benchmark.py``).

Same surface as the reference's click CLI (``tt_embeddings_benchmark.py:
124-133``): ``--batch-size --iters --pooling-factor --p-shapes --q-shapes
--ranks --sparse --optimizer --run-baseline`` plus the request-generator
knobs (``--alpha`` Zipf, ``--reuse``, ``--weighted``) and the same
GFLOPS/BW accounting (``tt_embeddings_benchmark.py:153-159,188-192``:
forward-chain MACs x2, x3.0 for fwd + two backward GEMM passes).

TPU-specific additions:
  * ``--impl {auto,pallas_sorted,pallas,xla}`` selects the compute path
    (``pallas_sorted`` = the flat sorted-run pipeline, the TPU fast path).
  * honest device timing — k steps inside one dispatch, slope between two
    k values (dispatch under a tunneled runtime is async and
    ``block_until_ready`` alone under-measures).
  * the uncompressed ``EmbeddingBag`` baseline (``--run-baseline``) is a
    jnp gather + segment-sum with a fused SGD update — the TPU-idiomatic
    equivalent of ``torch.nn.EmbeddingBag(sparse=True)``.

Run: ``python -m fbtt_embedding_tpu.benchmark [options]``
"""

from __future__ import annotations

import argparse
import logging
import time
from typing import List

import numpy as np

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger("fbtt_benchmark")


def validate_list(param_str: str) -> List[int]:
    values = []
    for v in param_str.strip().split(","):
        if int(v) <= 0:
            raise ValueError(f"Invalid parameter '{param_str}'")
        values.append(int(v))
    return values


def generate_requests(
    rng: np.random.Generator,
    iters: int,
    b: int,
    t: int,
    length: int,
    num_embeddings: int,
    reuse: float = 0.0,
    alpha: float = 1.0,
    weighted: bool = False,
    fp16: bool = False,
    long_index: bool = True,
):
    """Request generator (reference ``generate_requests``,
    ``tt_embeddings_benchmark.py:37-91``): uniform or Zipf indices with an
    optional inter-batch reuse rate; CSR layout with
    ``include_last_offset=True`` semantics."""
    nnz = t * b * length
    if alpha <= 1.0:
        all_indices = rng.integers(0, num_embeddings, size=(iters, t, b * length))
    else:
        all_indices = rng.zipf(alpha, size=(iters, t, b * length)) % num_embeddings
    for it in range(iters - 1):
        for tt in range(t):
            reused = rng.permutation(b * length)[: int(b * length * reuse)]
            all_indices[it + 1, tt, reused] = all_indices[it, tt, reused]
    # reference --long-index default: int64 indices/offsets
    # (tt_embeddings_benchmark.py:130,96-98); the lookup converts to the
    # device index dtype internally, so this only exercises the host edge.
    idx_dtype = np.int64 if long_index else np.int32
    offsets = np.arange(0, nnz + 1, length, dtype=idx_dtype)
    w_dtype = np.float16 if fp16 else np.float32
    out = []
    for it in range(iters):
        w = rng.standard_normal(nnz).astype(w_dtype) if weighted else None
        out.append((all_indices[it].reshape(-1).astype(idx_dtype), offsets, w))
    return out


def _slope_time(run_k, k1: int, k2: int) -> float:
    """Seconds/step via the slope between two in-dispatch step counts."""
    run_k(3)
    t0 = time.perf_counter()
    run_k(k1)
    t1 = time.perf_counter()
    run_k(k2)
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (k2 - k1)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--batch-size", type=int, default=512)
    parser.add_argument("--iters", type=int, default=100)
    parser.add_argument("--pooling-factor", type=int, default=20)
    parser.add_argument("--p-shapes", type=validate_list, default="200,220,250")
    parser.add_argument("--q-shapes", type=validate_list, default="4,4,4")
    parser.add_argument("--ranks", type=validate_list, default="32,32")
    parser.add_argument("--sparse", action="store_true", default=True)
    parser.add_argument("--no-sparse", dest="sparse", action="store_false")
    parser.add_argument("--optimizer", default="sgd",
                        choices=["sgd", "adagrad"])
    parser.add_argument("--use-cache", action="store_true", default=True)
    parser.add_argument("--no-cache", dest="use_cache", action="store_false")
    parser.add_argument(
        "--count-interval", type=int, default=1,
        help="sampled LFU counting: count every k-th step with k-scaled "
             "increments (1 = reference parity, count every step)")
    parser.add_argument("--alpha", type=float, default=1.0)
    parser.add_argument("--reuse", type=float, default=0.0)
    parser.add_argument("--weighted", action="store_true")
    parser.add_argument("--fp16", action="store_true",
                        help="generate per-sample weights in fp16 "
                             "(reference generator parity)")
    parser.add_argument("--long-index", dest="long_index",
                        action="store_true", default=True,
                        help="int64 indices/offsets (reference default)")
    parser.add_argument("--no-long-index", dest="long_index",
                        action="store_false")
    parser.add_argument("--impl", default="auto",
                        choices=["auto", "pallas_sorted", "pallas", "xla"])
    parser.add_argument("--run-baseline", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    if isinstance(args.p_shapes, str):
        args.p_shapes = validate_list(args.p_shapes)
    if isinstance(args.q_shapes, str):
        args.q_shapes = validate_list(args.q_shapes)
    if isinstance(args.ranks, str):
        args.ranks = validate_list(args.ranks)

    import jax
    import jax.numpy as jnp

    from fbtt_embedding_tpu import OptimType, TTEmbeddingParams
    from fbtt_embedding_tpu.models.tt_embedding import make_fused_train_step
    from fbtt_embedding_tpu.ops.cache import make_cache_state
    from fbtt_embedding_tpu.utils.init import init_tt_cores

    p, q, ranks = args.p_shapes, args.q_shapes, args.ranks
    rfull = [1] + ranks + [1]
    b, length = args.batch_size, args.pooling_factor
    num_embeddings = int(np.prod(p))
    embedding_dim = int(np.prod(q))
    nnz = b * length
    optim = OptimType.SGD if args.optimizer == "sgd" else OptimType.EXACT_ADAGRAD

    rng = np.random.default_rng(args.seed)
    requests = generate_requests(
        rng, 1, b, 1, length, num_embeddings,
        reuse=args.reuse, alpha=args.alpha, weighted=args.weighted,
        fp16=args.fp16, long_index=args.long_index,
    )
    indices_np, offsets_np, w_np = requests[0]
    indices = jnp.asarray(indices_np)
    offsets = jnp.asarray(offsets_np)
    sample_weights = None if w_np is None else jnp.asarray(w_np)

    # FLOP model, reference tt_embeddings_benchmark.py:153-159
    if len(q) >= 3:
        flop = (
            q[0] * rfull[1] * q[1] * rfull[2]
            + q[0] * q[1] * rfull[2] * q[2]
        ) * 2.0 * nnz
    else:
        flop = q[0] * rfull[1] * q[1] * 2.0 * nnz
    bw = 4.0 * nnz * embedding_dim

    cores = tuple(
        jnp.asarray(c)
        for c in init_tt_cores(
            rng, "uniform", 1, num_embeddings, embedding_dim, p, q, rfull)
    )
    if optim == OptimType.SGD:
        opt_state = tuple(jnp.zeros((0,), jnp.float32) for _ in cores)
    else:
        opt_state = tuple(jnp.zeros_like(c) for c in cores)
    cache = (
        make_cache_state(num_embeddings, int(0.1 * num_embeddings),
                         embedding_dim, "none",
                         num_embeddings=num_embeddings)
        if args.use_cache else None
    )
    params = TTEmbeddingParams(cores, opt_state, cache)
    ci = max(1, args.count_interval)
    step = make_fused_train_step(
        p, q, rfull, num_tables=1, batch_size=b, optimizer=optim,
        use_cache=args.use_cache, probe_cache=False, impl=args.impl,
        count_interval=ci,
    )
    d_output = jnp.asarray((rng.random((1, b, embedding_dim)) * 0.1)
                           .astype(np.float32))
    lr_eps = (jnp.float32(0.01), jnp.float32(1e-10))

    logger.info("device: %s, impl: %s, sparse: %s, optimizer: %s",
                jax.devices()[0].device_kind, args.impl, args.sparse, optim)
    logger.info("p_shapes: %s, q_shapes: %s, ranks: %s", p, q, ranks)
    logger.info("B: %s, E: %s, D: %s, nnz: %s, alpha: %s",
                b, num_embeddings, embedding_dim, nnz, args.alpha)

    @jax.jit
    def run_k(prm, k):
        # each trip = one counting step + (ci - 1) non-counting steps
        # (count is a STATIC arg — two compiled specializations, unrolled
        # here since ci is Python-static)
        def body(_, pr):
            for j in range(ci):
                _, pr = step(pr, indices, offsets, d_output, lr_eps,
                             weights=sample_weights, count=(j == 0))
            return pr
        return jax.lax.fori_loop(0, k, body, prm)

    state = {"params": params}

    def timed(k):
        state["params"] = run_k(state["params"], k)
        _ = float(jnp.sum(state["params"].tt_cores[0][0, 0, :8]))

    k1 = max(args.iters // (10 * ci), 2)
    time_per_iter = _slope_time(timed, k1, max(args.iters // ci, k1 + 2)) / ci
    logger.info(
        "TTEmbeddingBag FWD-BWD time/nnz: %.3f usecs, GFLOPS: %.3f, BW: %.3f",
        time_per_iter / nnz * 1e6,
        3.0 * flop / time_per_iter / 1e9,
        3.0 * bw / time_per_iter / 1e9,
    )

    if args.run_baseline:
        # Uncompressed EmbeddingBag with fused sparse SGD (gather +
        # segment-sum + scatter-add update), the TPU-idiomatic analog of
        # torch.nn.EmbeddingBag(sparse=True) (tt_embeddings_benchmark.py:
        # 195-211).
        from fbtt_embedding_tpu.ops.indexing import rowidx_from_offsets

        weight = jnp.asarray(
            rng.standard_normal((num_embeddings, embedding_dim))
            .astype(np.float32))

        @jax.jit
        def run_base_k(w, k):
            rowidx, _ = rowidx_from_offsets(offsets, nnz, 1, b)

            def body(_, carry):
                wc, acc = carry
                rows = wc[indices]
                if sample_weights is not None:
                    rows = rows * sample_weights[:, None]
                out = jax.ops.segment_sum(rows, rowidx, num_segments=b)
                d_rows = d_output[0][rowidx]
                if sample_weights is not None:
                    d_rows = d_rows * sample_weights[:, None]
                wc = wc.at[indices].add(-0.01 * d_rows)
                # Fold the pooled forward into the carry so XLA cannot
                # dead-code-eliminate the gather + segment-sum (the fused
                # SGD update alone does not depend on `out`).
                return wc, acc + out[0, 0]
            return jax.lax.fori_loop(0, k, body, (w, jnp.float32(0.0)))

        wstate = {"w": weight, "acc": jnp.float32(0.0)}

        def timed_base(k):
            wstate["w"], wstate["acc"] = run_base_k(wstate["w"], k)
            _ = float(jnp.sum(wstate["w"][0, :8]) + wstate["acc"])

        t_base = _slope_time(timed_base, k1, args.iters)
        logger.info(
            "EmbeddingBag FWD-BWD time/nnz: %.3f usecs, BW: %.3f",
            t_base / nnz * 1e6, 3.0 * bw / t_base / 1e9,
        )
        logger.info(
            "TT vs uncompressed: %.2fx %s (compression %.0fx)",
            max(t_base / time_per_iter, time_per_iter / t_base),
            "faster" if time_per_iter < t_base else "slower",
            num_embeddings * embedding_dim * 4
            / sum(c.size * 4 for c in cores),
        )


if __name__ == "__main__":
    main()
