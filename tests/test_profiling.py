"""Unit tests for utils/profiling.py — FLOP model, slope timing, roofline.

The FLOP model must agree with the reference's
(``/root/reference/tt_embeddings_benchmark.py:153-159``) at tt_ndim == 3,
since BENCH comparisons against the reference's reported numbers lean on
it; the generalization to other tt_ndim is checked against a hand count.
"""

import numpy as np
import pytest

from fbtt_embedding_tpu.utils import profiling


def _reference_flop_model(q, r, nnz):
    # The reference (tt_ndim == 3 only): per lookup,
    #   GEMM1: (q0) x (r1) @ (r1) x (q1*r2), GEMM2: (q0*q1) x (r2) @ (r2) x q2
    # 2 MACs each, x3 for fwd + bwd's two GEMM passes.
    q0, q1, q2 = q
    r1, r2 = r
    per_lookup = 2 * (q0 * r1 * q1 * r2 + q0 * q1 * r2 * q2)
    return 3.0 * per_lookup * nnz


def test_tt_flops_matches_reference_model_ndim3():
    q, r, nnz = [4, 4, 4], [32, 32], 10240
    assert profiling.tt_flops(q, r, nnz) == pytest.approx(
        _reference_flop_model(q, r, nnz))


def test_tt_flops_ndim2_hand_count():
    # One GEMM per lookup: (q0 x r1) @ (r1 x q1); x2 MACs x3 factor.
    q, r = [8, 8], [16]
    expect = 3.0 * 2 * (8 * 16 * 8) * 100
    assert profiling.tt_flops(q, r, 100) == pytest.approx(expect)


def test_tt_flops_ndim4_hand_count():
    q, r = [2, 3, 4, 5], [7, 11, 13]
    # chain: m grows as prod(q_0..q_t)
    macs = (2 * 7 * 3 * 11) + (2 * 3 * 11 * 4 * 13) + (2 * 3 * 4 * 13 * 5)
    assert profiling.tt_flops(q, r, 10) == pytest.approx(3.0 * 2 * macs * 10)


def test_tt_flops_accepts_full_rank_vector():
    q, r = [4, 4, 4], [32, 32]
    assert profiling.tt_flops(q, [1] + r + [1], 7) == profiling.tt_flops(
        q, r, 7)


def test_slope_time_subtracts_fixed_overhead():
    # Synthetic runner: fixed 1ms "dispatch overhead" + 0.1ms/step.
    import time

    per_step = 1e-4

    def run_k(k):
        time.sleep(1e-3 + per_step * k)

    est = profiling.slope_time(run_k, iters=40, k1=4)
    assert est == pytest.approx(per_step, rel=0.35)


def test_speed_of_light_fields_and_bound():
    sol = profiling.speed_of_light(
        [200, 220, 250], [4, 4, 4], [32, 32], nnz=10240, batch_size=512,
        device_kind="TPU v5 lite")
    assert sol["device"] == "TPU v5 lite"
    assert sol["bound"] in ("compute", "memory")
    assert sol["t_sol_s"] == max(sol["t_compute_s"], sol["t_memory_s"])
    assert sol["flops"] == profiling.tt_flops([4, 4, 4], [32, 32], 10240)
    # The headline config is memory-bound on v5e (PERF.md roofline).
    assert sol["bound"] == "memory"


def test_speed_of_light_unknown_device_falls_back():
    sol = profiling.speed_of_light(
        [8, 8, 8], [2, 2, 2], [8, 8], nnz=64, batch_size=8,
        device_kind="Frobnicator 9000")
    assert sol["t_sol_s"] > 0


def test_trace_and_annotate_smoke(tmp_path):
    import jax
    import jax.numpy as jnp

    with profiling.trace(str(tmp_path)):
        with profiling.annotate("unit-smoke"):
            jnp.square(jnp.arange(8.0)).block_until_ready()
    # Something was captured to the log dir.
    assert any(tmp_path.rglob("*")), "trace produced no files"
