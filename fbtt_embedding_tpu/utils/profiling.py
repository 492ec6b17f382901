"""Profiling and performance-accounting utilities.

The reference's only instrumentation is ``torch.cuda.Event`` wall-clock in
the benchmark (``tt_embeddings_benchmark.py:100-108``). Here (SURVEY §5):

  * :func:`trace` — Perfetto/XProf device traces via ``jax.profiler``.
  * :func:`annotate` — named trace regions.
  * :func:`tt_flops` — the reference's FLOP model
    (``tt_embeddings_benchmark.py:153-159``) generalized to any tt_ndim.
  * :func:`slope_time` — honest steps/sec under async dispatch (including
    tunneled runtimes where ``block_until_ready`` alone under-measures):
    run k steps inside one dispatch for two values of k, force a scalar
    readback, report the slope.
  * :func:`speed_of_light` — roofline estimate for a lookup config on the
    current device (MXU flops + HBM bytes), for "are we done yet" checks.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional, Sequence

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in Perfetto / TensorBoard."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a :func:`trace` capture."""
    import jax

    return jax.profiler.TraceAnnotation(name)


def tt_flops(
    tt_q_shapes: Sequence[int],
    tt_ranks: Sequence[int],
    nnz: int,
    fwd_bwd_factor: float = 3.0,
) -> float:
    """Chain-contraction FLOPs for ``nnz`` lookups.

    Generalizes the reference model (``tt_embeddings_benchmark.py:153-159``):
    per lookup the chain runs (T-1) GEMMs with dims
    ``m_t = prod(q_0..q_t), k_t = r_{t+1}, n_t = q_{t+1} * r_{t+2}``;
    2 MACs each; x ``fwd_bwd_factor`` (3.0 = fwd + two bwd GEMM passes).
    """
    q = list(tt_q_shapes)
    r = list(tt_ranks)
    if len(r) == len(q) - 1:
        r = [1] + r + [1]
    macs = 0
    m = q[0]
    for t in range(1, len(q)):
        macs += m * r[t] * q[t] * r[t + 1]
        m *= q[t]
    return fwd_bwd_factor * 2.0 * macs * nnz


def slope_time(
    run_k: Callable[[int], None],
    iters: int = 100,
    k1: Optional[int] = None,
) -> float:
    """Seconds/step via the slope between two in-dispatch step counts.

    ``run_k(k)`` must execute k steps in one dispatch and force a readback.
    """
    if k1 is None:
        k1 = max(iters // 10, 2)
    run_k(3)
    t0 = time.perf_counter()
    run_k(k1)
    t1 = time.perf_counter()
    run_k(iters)
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (iters - k1)


# Peak specs per device kind (bf16 matmul TFLOP/s, HBM GB/s); conservative
# public numbers. Fallback entry used for unknown kinds.
_DEVICE_SPECS = {
    "TPU v4": (275.0, 1228.0),
    "TPU v5 lite": (197.0, 819.0),
    "TPU v5e": (197.0, 819.0),
    "TPU v5p": (459.0, 2765.0),
    "TPU v6 lite": (918.0, 1640.0),
    "cpu": (1.0, 50.0),
}


def speed_of_light(
    tt_p_shapes: Sequence[int],
    tt_q_shapes: Sequence[int],
    tt_ranks: Sequence[int],
    nnz: int,
    batch_size: int,
    device_kind: Optional[str] = None,
) -> dict:
    """Roofline estimate for one fused train step at this config.

    Compute: chain fwd+bwd MXU FLOPs. Memory: cores in+out, indices,
    pooled output + cotangent (the VMEM-resident kernel design makes the
    per-lookup gathers free of HBM traffic). Returns seconds and the
    binding resource.
    """
    import jax

    if device_kind is None:
        device_kind = jax.devices()[0].device_kind
    tflops, gbs = _DEVICE_SPECS.get(device_kind, (100.0, 800.0))
    q = list(tt_q_shapes)
    r = list(tt_ranks)
    if len(r) == len(q) - 1:
        r = [1] + r + [1]
    flops = tt_flops(q, r, nnz)
    d = int(np.prod(q))
    core_elems = sum(
        p * r[i] * q[i] * r[i + 1] for i, p in enumerate(tt_p_shapes)
    )
    bytes_moved = (
        2 * 4 * core_elems          # cores in + updated out
        + 4 * nnz * 4               # indices + rowidx-ish
        + 2 * 4 * batch_size * d    # pooled out + cotangent
    )
    t_compute = flops / (tflops * 1e12)
    t_memory = bytes_moved / (gbs * 1e9)
    return {
        "device": device_kind,
        "flops": flops,
        "bytes": bytes_moved,
        "t_compute_s": t_compute,
        "t_memory_s": t_memory,
        "t_sol_s": max(t_compute, t_memory),
        "bound": "compute" if t_compute > t_memory else "memory",
    }
